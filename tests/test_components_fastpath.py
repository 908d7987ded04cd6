"""Serial-finish parity: components & label propagation fast paths.

The r6 optimization adds a driver-side numpy finish (under the same
``small_graph_edges`` bound louvain already uses) to
``connected_components`` and ``label_propagation``. These tests pin
that the fast path and the distributed rounds produce IDENTICAL result
frames and iteration counts, and that the gate falls through to the
distributed path when the bound is exceeded.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from louvain_communities_openmp_spark.operators.components import (
    connected_components,
)
from louvain_communities_openmp_spark.operators.labelprop import (
    label_propagation,
)
from louvain_communities_openmp_spark.operators.transforms import symmetricize
from louvain_communities_openmp_spark.sources.edges import edges_from_list


def _fixture_edges(spark):
    # two components, a hub, a path (stresses multi-round convergence),
    # plus a self-loop and an isolated-by-self-loop vertex
    ew = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0),
        (0, 2, 3.0), (0, 3, 1.0), (0, 4, 1.0),
        (10, 11, 1.0), (11, 12, 1.0), (12, 10, 2.0),
        (7, 7, 5.0),
    ]
    return symmetricize(edges_from_list(spark, ew))


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_components_fastpath_matches_distributed(spark):
    e = _fixture_edges(spark).persist()
    fast = connected_components(e)  # bound >> fixture → numpy path
    dist = connected_components(e, small_graph_edges=0)  # force rounds
    assert _rows(fast.components, ["id", "comp"]) == _rows(
        dist.components, ["id", "comp"]
    )
    assert fast.iterations == dist.iterations
    e.unpersist()


def test_labelprop_fastpath_matches_distributed(spark):
    e = _fixture_edges(spark).persist()
    for iters in (1, 2, 4, 10):
        fast = label_propagation(e, max_iter=iters)
        dist = label_propagation(e, max_iter=iters, small_graph_edges=0)
        assert _rows(fast.labels, ["id", "label"]) == _rows(
            dist.labels, ["id", "label"]
        ), f"max_iter={iters}"
        assert fast.iterations == dist.iterations, f"max_iter={iters}"
    e.unpersist()


def test_fastpath_gate_falls_through(spark):
    e = _fixture_edges(spark)
    n = e.count()
    # bound below the edge count → must take the distributed path and
    # still produce the same answers
    fast = connected_components(e)
    gated = connected_components(e, small_graph_edges=max(1, n - 1))
    assert _rows(fast.components, ["id", "comp"]) == _rows(
        gated.components, ["id", "comp"]
    )


def test_triangles_fastpath_matches_distributed(spark):
    from louvain_communities_openmp_spark.operators.triangles import (
        triangle_count_total,
    )
    from louvain_communities_openmp_spark.sources.edges import (
        synthetic_powerlaw_edges,
    )

    e = _fixture_edges(spark).persist()
    assert triangle_count_total(e) == triangle_count_total(
        e, small_graph_edges=0
    )
    e.unpersist()
    p = synthetic_powerlaw_edges(spark, 400, 3000).persist()
    assert triangle_count_total(p) == triangle_count_total(
        p, small_graph_edges=0
    )
    p.unpersist()


def test_components_fastpath_powerlaw_parity(spark):
    # a denser deterministic fixture: hash-generated power-law graph
    from louvain_communities_openmp_spark.sources.edges import (
        synthetic_powerlaw_edges,
    )

    e = synthetic_powerlaw_edges(spark, 500, 4000).persist()
    fast = connected_components(e)
    dist = connected_components(e, small_graph_edges=0)
    assert _rows(fast.components, ["id", "comp"]) == _rows(
        dist.components, ["id", "comp"]
    )
    assert fast.iterations == dist.iterations
    lp_f = label_propagation(e, max_iter=4)
    lp_d = label_propagation(e, max_iter=4, small_graph_edges=0)
    assert _rows(lp_f.labels, ["id", "label"]) == _rows(
        lp_d.labels, ["id", "label"]
    )
    assert lp_f.iterations == lp_d.iterations
    e.unpersist()
