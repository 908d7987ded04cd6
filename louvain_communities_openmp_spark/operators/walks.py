"""Deterministic random walks — GNN-style neighborhood sampling.

The training-data counterpart of node2vec/GraphSAGE neighbor sampling:
fixed-length walks from a pivot-source sample over the directed edge
table. The "random" choice at each step is a HASH of
(walk_id, step, current vertex) — md5-derived, so walks are a pure
deterministic function of the graph (reproducible across runs,
engines, and partitionings; the property every sampled training set
needs for auditability) while still distributionally uniform over the
out-neighbors.

Plan shape: the adjacency table (src → sorted out-neighbor array) is
built once with one shuffle — the same artifact the triangle counter
uses — and each of the L steps is ONE walk-count-sized join against
it: per-step exchange is O(#walks), never O(E). A walk ends early at a
dangling vertex (inner join drops it). At 100 TB the adjacency side is
the big static table: bucketed storage (write_edges_bucketed) makes
every step's join co-located, and hub rows are bounded by the array
width cap of the underlying groupBy (arrays of out-neighbors, the same
width bound discussion as triangles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import vertices


def _choice_idx(walk_id, step: int, v, deg):
    """Deterministic neighbor index in [0, deg): first 32 bits of
    md5('<walk_id>:<step>:<v>') mod deg — portable to any engine with
    md5 (the DuckDB twin uses the identical formulation)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    walk_id.cast("string"),
                    F.lit(str(step)),
                    v.cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, deg)


def _adjacency(edges: DataFrame, max_neighbors: int | None) -> DataFrame:
    """src → sorted out-neighbor array, optionally hub-capped to the
    ``max_neighbors`` smallest-id neighbors. The cap applies BEFORE
    collect_list: a slice after collection would still materialize the
    full hub array in the aggregation buffer. The row_number window
    shares the groupBy's src-shuffle (one exchange total) and streams
    each partition sorted, so no row ever holds more than
    max_neighbors elements."""
    pruned = edges.select("src", "dst").distinct()
    if max_neighbors is not None:
        from pyspark.sql import Window as W

        rn = F.row_number().over(W.partitionBy("src").orderBy("dst"))
        pruned = (
            pruned.withColumn("_rn", rn)
            .where(F.col("_rn") <= max_neighbors)
            .drop("_rn")
        )
    return pruned.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )


def deterministic_walks(
    edges: DataFrame,
    n_sources: int = 16,
    walk_len: int = 8,
    max_neighbors: int | None = None,
) -> DataFrame:
    """Fixed-length deterministic walks from the ``n_sources``
    smallest-id vertices. Returns (walk_id, step, v): step 0 is the
    source itself; a walk that reaches a vertex with no out-edges
    simply has no later rows.

    ``max_neighbors`` (the hub cap, same role as linkpred's
    max_pivot_degree): bound every adjacency-array row to the K
    SMALLEST-id out-neighbors. Without it a 10M-degree hub
    materializes a 10M-element array in one row — the per-row width
    bomb at web scale. With it the walk distribution is APPROXIMATE on
    capped vertices (steps choose among the K retained neighbors
    only); the cut is deterministic (sorted prefix), so results stay
    reproducible and engine-portable. Uncapped semantics are exact."""
    # persisted: the returned plan references adj once per step — the
    # cache makes the caller's action build it once, not walk_len times
    adj = _adjacency(edges, max_neighbors).persist()
    cur = (
        vertices(edges)
        .orderBy("id")
        .limit(n_sources)
        .select(
            F.col("id").alias("walk_id"),
            F.lit(0).alias("step"),
            F.col("id").alias("v"),
        )
    )
    frames = [cur]
    for k in range(walk_len):
        cur = (
            cur.join(adj, cur.v == adj.src)
            .select(
                "walk_id",
                F.lit(k + 1).alias("step"),
                F.element_at(
                    "nbrs",
                    (
                        _choice_idx(
                            F.col("walk_id"), k, F.col("v"), F.size("nbrs")
                        )
                        + 1
                    ).cast("int"),
                ).alias("v"),
            )
        )
        frames.append(cur)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
