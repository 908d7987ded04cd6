"""Sampled, depth-capped betweenness centrality (truncated Brandes).

Exact betweenness is all-pairs (O(V·E) even unweighted) — never the
production plan on a web graph. The standard estimator (Brandes &
Pich, "Centrality estimation in large networks", 2007; Brandes, "On
variants of shortest-path betweenness", 2008) runs Brandes'
dependency accumulation from a SAMPLE of pivot sources with a
bounded-distance cut: only shortest paths of length <= max_depth
count. This operator computes that estimator with a DETERMINISTIC
pivot set (the n_sources smallest vertex ids — the same convention as
harmonic_centrality) and a fixed depth cap, so the result is an
exact, oracle-checkable function of the input rather than a seeded
estimate.

Algorithm (level-synchronous, both phases expressed as keyed joins):

forward (per source s, unweighted BFS with path counting):
    sigma(s, s) = 1 at dist 0
    level t+1:  sigma(s, w) = sum over frontier edges v->w of
                sigma(s, v), for w not yet visited
backward (dependency accumulation, deepest level first):
    delta(s, v) = sum over edges v->w with dist(s,w) = dist(s,v)+1 of
                  sigma(s,v)/sigma(s,w) * (1 + delta(s,w))
    betweenness(v) = sum over sources s != v of delta(s, v)

Plan shape / 100 TB notes:
- the edge table is deduped to (src, dst), repartitioned ONCE on src
  (the forward expansion key) and persisted; every forward round is
  one join + one map-side-combined sum keyed on the partitioned side,
  shuffling only O(frontier * n_sources) rows (bfs.py economics);
- the backward sweep reuses the per-level frames captured on the way
  down (max_depth of them, each eagerly localCheckpoint-ed so lineage
  never compounds); each level is two keyed joins + one aggregate
  over rows-at-that-level only — no O(E) state ever materializes;
- total rounds = 2 * max_depth, a constant; per-source state is the
  only thing that moves, so n_sources is the linear cost knob exactly
  as in the published estimator.

Reference analog: the reference has no centrality kernel; this is a
link-graph companion in the spirit of the mandated PageRank
(BASELINE.json north_rule), sharing the edge-table contract and the
multi_source_bfs sampling convention (centrality.py:43).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import vertices


@dataclass
class BetweennessResult:
    scores: DataFrame  # (id long, betweenness double) — ALL vertices
    n_sources: int
    depth: int  # deepest level actually reached (<= max_depth)


def betweenness_sampled(
    edges: DataFrame,
    n_sources: int = 8,
    max_depth: int = 8,
) -> BetweennessResult:
    """Truncated-Brandes betweenness from the ``n_sources`` smallest-id
    pivots, counting shortest paths of hop length <= ``max_depth``.

    Directed semantics (paths follow edge direction); run on the
    symmetricized table for the undirected score. Parallel edges are
    collapsed — path counting is over the simple directed graph.
    Scores are rounded to 6 decimals.
    """
    e = edges.select("src", "dst").distinct().repartition("src").persist()
    verts = vertices(edges)
    f0 = (
        verts.orderBy("id")
        .limit(n_sources)
        .select(
            F.col("id").alias("s"),
            F.col("id").alias("v"),
            F.lit(1.0).alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [f0]
    visited = f0.select("s", "v").localCheckpoint(eager=True)
    for _ in range(max_depth):
        fr = levels[-1]
        nxt = (
            e.join(
                fr.select(F.col("v").alias("src"), "s", "sigma"), "src"
            )
            .groupBy("s", F.col("dst").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        levels.append(nxt)
        visited = (
            visited.unionByName(nxt.select("s", "v"))
            .localCheckpoint(eager=True)
        )

    # backward: deepest level's delta is 0 by construction
    deltas = [
        levels[-1].select("s", "v", "sigma", F.lit(0.0).alias("delta"))
    ]
    for t in range(len(levels) - 2, -1, -1):
        f = levels[t]
        succ = (
            f.select("s", "v", "sigma")
            .join(e.select(F.col("src").alias("v"), "dst"), "v")
            .join(
                deltas[-1].select(
                    "s",
                    F.col("v").alias("dst"),
                    F.col("sigma").alias("sig_w"),
                    F.col("delta").alias("del_w"),
                ),
                ["s", "dst"],
            )
            .groupBy("s", "v")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sig_w") * (1.0 + F.col("del_w"))
                ).alias("d")
            )
        )
        deltas.append(
            f.join(succ, ["s", "v"], "left")
            .select(
                "s",
                "v",
                "sigma",
                F.coalesce("d", F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )

    dall = reduce(DataFrame.unionByName, deltas)
    per = (
        dall.where(F.col("v") != F.col("s"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("b"))
    )
    scores = verts.join(per, "id", "left").select(
        "id",
        F.round(F.coalesce("b", F.lit(0.0)), 6).alias("betweenness"),
    )
    e.unpersist()
    return BetweennessResult(scores, n_sources, len(levels) - 1)
