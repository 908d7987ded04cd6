"""Breadth-first search: frontier-swap hop distances.

The DataFrame analog of bfsVisitedForEachU (bfs.hxx:22-55): the visited
set is a (id, dist) frame, the frontier is last round's newly visited
vertices, and each round expands frontier → unvisited neighbors with
one semi/anti join pair. Late rounds touch only the frontier's
adjacency — the same affected-set economics as Louvain's vaff
(louvain.hxx:534-539) and the CC/label-prop frontiers.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BfsResult:
    distances: DataFrame  # (id long, dist long) — reached vertices only
    iterations: int


def bfs(edges: DataFrame, sources: DataFrame | list, max_iter: int = 200) -> BfsResult:
    """Hop distances from ``sources`` (a list of ids or a DataFrame with
    an ``id`` column) over the directed edge table."""
    spark = edges.sparkSession
    if not isinstance(sources, DataFrame):
        sources = spark.createDataFrame([(int(s),) for s in sources], "id long")
    e = edges.select("src", "dst").persist()
    visited = (
        sources.select("id").distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    it = 0
    rounds_since_cp = 0
    while it < max_iter:
        nxt = (
            e.join(
                frontier.select(F.col("id").alias("src"), "dist"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg((F.min("dist") + 1).alias("dist"))
            .join(visited.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        it += 1
        if n == 0:
            break
        # visited grows as a plain union of already-checkpointed
        # frontier frames — re-checkpointing the WHOLE visited set every
        # round would write O(V) per round (O(V·rounds) total on
        # high-diameter graphs). The union chain is re-materialized only
        # every k rounds to bound plan depth; reads cost the same either
        # way (the anti-join scans V rows per round regardless).
        visited = visited.unionByName(nxt)
        rounds_since_cp += 1
        if rounds_since_cp >= 8:
            visited = visited.localCheckpoint(eager=True)
            rounds_since_cp = 0
        frontier = nxt
    e.unpersist()
    return BfsResult(visited, it)
