"""k-truss decomposition by iterative support peeling.

The k-truss of an undirected simple graph is the maximal subgraph in
which every edge participates in at least k-2 triangles (its
*support*) — the standard cohesive-subgraph strengthening of k-core,
and a triangle-machinery consumer: support comes from the same
degree-ordered oriented adjacency-array intersection as triangles.py
(each triangle row (u, a, b) credits its three edges).

Peeling is synchronous: each round recomputes support on the surviving
subgraph and drops EVERY edge below k-2 simultaneously — deterministic
and engine-portable (the DuckDB twin unrolls the identical rounds), at
worst O(diameter-of-peeling) rounds; real graphs settle in a handful.

Scale notes:
- per round: one oriented adjacency rebuild (one src-keyed shuffle of
  the surviving edges) + the codegen array_intersect triangle stream
  (output rows = triangle count, width bounded O(√E) by orientation)
  + one map-side-combined support aggregate keyed on the edge pair;
- the edge table shrinks monotonically, so round cost is bounded by
  the first round's; eager localCheckpoint truncates cross-round
  lineage (the same discipline as the other iterative operators).

Reference parity: the reference has no k-truss; companion addition on
the same edge model (like k-core, operators/kcore.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _canonical, _oriented, _triangles


@dataclass
class KTrussResult:
    edges: DataFrame  # (src long, dst long, support long), src < dst
    iterations: int


def edge_support(edges: DataFrame) -> DataFrame:
    """Per-canonical-edge triangle support: (src, dst, support) with
    src < dst, support = number of triangles containing the edge.
    Edges in no triangle appear with support 0."""
    c = _canonical(edges).persist()
    o = _oriented(c).persist()
    tris = _triangles(o)
    # each triangle (u, a, b) covers edges {u,a}, {u,b}, {a,b};
    # canonicalize by id (orientation is by rank, not id)
    covered = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "a").alias("src"),
                    F.greatest("u", "a").alias("dst"),
                ),
                F.struct(
                    F.least("u", "b").alias("src"),
                    F.greatest("u", "b").alias("dst"),
                ),
                F.struct(
                    F.least("a", "b").alias("src"),
                    F.greatest("a", "b").alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    sup = covered.groupBy("src", "dst").agg(F.count("*").alias("support"))
    out = (
        c.join(sup, ["src", "dst"], "left")
        .select(
            "src", "dst", F.coalesce("support", F.lit(0)).alias("support")
        )
        # eager: lets both persisted inputs release before the caller's
        # next peeling round (no cache creep across rounds)
        .localCheckpoint(eager=True)
    )
    o.unpersist()
    c.unpersist()
    return out


def ktruss_peel(edges: DataFrame, k: int = 4, rounds: int = 4) -> DataFrame:
    """Exactly ``rounds`` synchronous peeling rounds, then one support
    recomputation on the survivors: (src, dst, support) for every
    surviving canonical edge, UNFILTERED (rows with support < k-2 are
    the next round's casualties — visible, not dropped).

    Fixed-round peeling is the cross-engine-checkable contract: it is
    a deterministic function of the input on ANY graph, with no
    convergence assumption, so the DuckDB twin unrolls the identical
    rounds with no sentinel (the same bounded-semantics pattern as the
    depth-capped betweenness). Dense graphs — where to-convergence
    peeling takes hundreds of rounds (the sf0.01 co-order graph drops
    ~3.5%/round at k=8) — still verify in bounded work. Use
    ``ktruss()`` for the converged decomposition."""
    cur = _canonical(edges).localCheckpoint(eager=True)
    for _ in range(rounds):
        cur = (
            edge_support(cur)
            .where(F.col("support") >= k - 2)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return edge_support(cur)


def ktruss(edges: DataFrame, k: int = 4, max_iter: int = 100) -> KTrussResult:
    """Maximal subgraph where every edge has support ≥ k-2. Returns
    the surviving canonical edges with their final supports."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    cur = _canonical(edges).localCheckpoint(eager=True)
    n_cur = cur.count()
    rounds = 0
    while rounds < max_iter and n_cur > 0:
        sup = edge_support(cur)
        keep = sup.where(F.col("support") >= k - 2).localCheckpoint(
            eager=True
        )
        n_keep = keep.count()
        rounds += 1
        dropped = n_cur - n_keep
        cur = keep.select("src", "dst")
        n_cur = n_keep
        if dropped == 0:
            return KTrussResult(keep, rounds)
    if n_cur == 0:
        spark = edges.sparkSession
        return KTrussResult(
            spark.createDataFrame([], "src long, dst long, support long"),
            rounds,
        )
    raise RuntimeError(
        f"k-truss did not converge within {max_iter} peeling rounds"
    )
