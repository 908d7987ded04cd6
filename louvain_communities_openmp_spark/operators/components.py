"""Connected components: hash-min label propagation to fixpoint.

comp(u) = min vertex id reachable from u — exact-match target vs
oracle.simple.connected_components_seq. The frontier skeleton is the
BFS analog of the reference's bfsVisitedForEachU (bfs.hxx:22-55): only
vertices whose component label changed propagate next round, so late
rounds touch a vanishing fraction of the graph (the same affected-set
pruning idea as Louvain's vaff, louvain.hxx:534-539).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import vertices


@dataclass
class ComponentsResult:
    components: DataFrame  # (id long, comp long)
    iterations: int


def connected_components(
    edges: DataFrame, max_iter: int = 200
) -> ComponentsResult:
    # partition the static edge table on its per-round JOIN KEY before
    # caching: the per-round frontier join then exchanges only the
    # vertex-sized frontier, never the edges (same pattern as the
    # Louvain routing table)
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .repartition("src")
        .persist()
    )
    # eager localCheckpoint per round: truncates lineage and avoids the
    # unpersist-cascade recompute (see labelprop.py)
    comp = (
        vertices(edges)
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    # frontier: vertices whose label may still shrink (all, initially)
    frontier = comp
    it = 0
    while it < max_iter:
        # candidate labels flowing over edges out of the frontier
        cand = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("new_comp"))
        )
        merged = (
            comp.join(cand, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("new_comp", F.col("comp"))).alias("comp"),
                (F.coalesce("new_comp", F.lit(2**62)) < F.col("comp")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.where("changed").count()
        comp = merged.select("id", "comp")
        frontier = merged.where("changed").select("id", "comp")
        it += 1
        if changed == 0:
            break
    e.unpersist()
    return ComponentsResult(comp, it)
