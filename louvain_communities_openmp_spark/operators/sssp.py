"""Weighted single-source shortest paths (multi-source, fixed-round).

Bellman-Ford with the frontier optimization, run for a FIXED number of
relaxation rounds from a deterministic pivot sample: after R rounds the
state holds, per (source, vertex), the exact minimum-weight path using
at most R edges. Bounded-round semantics is the cross-engine contract
(the betweenness/ktruss_peel pattern): a deterministic function of the
input on ANY graph — no convergence assumption, negative-cycle-proof —
whose DuckDB twin unrolls the identical full relaxation rounds.

Frontier equivalence: relaxing only rows improved in the previous
round yields the same state as full relaxation after the same number
of rounds — a vertex on a k-edge path improves no later than round k
(induction on prefix length), and every improvement at round t is
witnessed by a real <=t-edge path. So the engine pays
O(improved-rows) per round while the twin pays O(V·k) — same answer.

Plan shape / 100 TB notes:
- edge table repartitioned ONCE on src (the relaxation key) and
  persisted; each round is one join keyed on the partitioned side +
  one map-side-combined min-aggregate + one left-join improvement
  filter — shuffle volume O(improved * n_sources), never O(E);
- state is merged by unionByName + min-aggregate and eagerly
  localCheckpoint-ed per round (lineage never compounds);
- early exit when no row improves (the fixed-round answer is then
  already the converged one).

Reference analog: none in the reference (Louvain-only); link-graph
companion in the multi_source_bfs sampling convention
(centrality.py:43) — BFS hop distance is the w=1 special case.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import vertices


@dataclass
class SsspResult:
    dists: DataFrame  # (s long, id long, dist double) — reached only
    n_sources: int
    rounds_run: int  # rounds actually executed (early exit counts less)


def sssp_fixed(
    edges: DataFrame,
    n_sources: int = 4,
    rounds: int = 6,
) -> SsspResult:
    """Minimum path weight using <= ``rounds`` edges, from each of the
    ``n_sources`` smallest-id pivots. Directed; parallel edges keep
    their individual weights (the min-aggregate collapses them).
    Unreached (source, vertex) pairs are absent. dist rounded to 6."""
    e = edges.select("src", "dst", "w").repartition("src").persist()
    state = (
        vertices(edges)
        .orderBy("id")
        .limit(n_sources)
        .select(
            F.col("id").alias("s"),
            F.col("id"),
            F.lit(0.0).alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = state
    run = 0
    for _ in range(rounds):
        cand = (
            e.join(
                frontier.select(F.col("id").alias("src"), "s", "dist"),
                "src",
            )
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
        )
        improved = (
            cand.join(
                state.select("s", "id", F.col("dist").alias("old")),
                ["s", "id"],
                "left",
            )
            .where(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("s", "id", "dist")
            .localCheckpoint(eager=True)
        )
        run += 1
        if improved.count() == 0:
            break
        state = (
            state.unionByName(improved)
            .groupBy("s", "id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return SsspResult(
        state.select("s", "id", F.round("dist", 6).alias("dist")),
        n_sources,
        run,
    )


_WIDE_CAP = 4611686018427387904  # 2^62 — "unbounded" source self-width


def widest_fixed(
    edges: DataFrame,
    n_sources: int = 4,
    rounds: int = 4,
) -> SsspResult:
    """Widest (bottleneck / max-min) path width using <= ``rounds``
    edges from each of the ``n_sources`` smallest-id pivots: the
    max over paths of the minimum edge weight along the path — the
    trust-propagation / capacity dual of sssp_fixed's min-plus. Same
    bounded-round contract, same frontier equivalence (max-min is
    monotone: a width achieved by a k-edge path is found no later than
    round k, and every improvement is witnessed by a real path).
    Widths are BIGINT-exact (integer co-order weights); the source's
    self-width seeds at 2^62 ("unbounded"), so first-hop width is the
    edge weight itself; identity rows are excluded from the output.

    Plan shape: identical to sssp_fixed — edge table repartitioned
    once on src, per round ONE frontier join + map-side-combined
    max-aggregate + improvement filter; shuffle O(improved rows),
    never O(E)."""
    e = edges.select(
        "src", "dst", F.col("w").cast("long").alias("w")
    ).repartition("src").persist()
    state = (
        vertices(edges)
        .orderBy("id")
        .limit(n_sources)
        .select(
            F.col("id").alias("s"),
            F.col("id"),
            F.lit(_WIDE_CAP).cast("long").alias("wide"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = state
    run = 0
    for _ in range(rounds):
        cand = (
            e.join(
                frontier.select(F.col("id").alias("src"), "s", "wide"),
                "src",
            )
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.max(F.least(F.col("w"), F.col("wide"))).alias("wide"))
        )
        improved = (
            cand.join(
                state.select("s", "id", F.col("wide").alias("old")),
                ["s", "id"],
                "left",
            )
            .where(F.col("old").isNull() | (F.col("wide") > F.col("old")))
            .select("s", "id", "wide")
            .localCheckpoint(eager=True)
        )
        run += 1
        if improved.count() == 0:
            break
        state = (
            state.unionByName(improved)
            .groupBy("s", "id")
            .agg(F.max("wide").alias("wide"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return SsspResult(
        state.where(F.col("id") != F.col("s")).select("s", "id", "wide"),
        n_sources,
        run,
    )
