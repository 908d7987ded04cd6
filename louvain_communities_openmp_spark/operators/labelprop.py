"""Synchronous weighted label propagation (north-rule companion).

Semantics = oracle.simple.label_propagation_seq (exact-match target):
each round, every vertex takes the label with max total incident edge
weight among neighbors (self-loops ignored), tie-break min label,
isolated vertices keep their own. Structurally this is Louvain's
community scan (louvain.hxx:405-438) with ΔQ replaced by weight-count
argmax — one join + one two-level aggregation per round, all Catalyst:

    edges ⋈ labels(dst) → groupBy(src, label).sum(w)
          → max_by(struct) per src with deterministic tie-break.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import vertices


@dataclass
class LabelPropResult:
    labels: DataFrame  # (id long, label long)
    iterations: int


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    broadcast_vertices: int = 5_000_000,
    debug_plans: list | None = None,
) -> LabelPropResult:
    # Two regimes, same answer (gate mirrors Louvain's broadcast_vertices):
    #
    # - V ≤ broadcast_vertices: partition the static edge table on the
    #   AGGREGATION key (src) and BROADCAST the vertex-sized labels
    #   frame into the dst join. The round is then exchange-FREE: the
    #   broadcast join preserves e's src partitioning, which satisfies
    #   both groupBy(src, nl) and groupBy(src) downstream — without the
    #   broadcast, the post-join groupBy(src, nl) re-shuffles the
    #   edge-sized scored table every round (map-side combine can't
    #   collapse it while neighbor labels are still diverse).
    # - V > broadcast_vertices (the 100 TB regime): labels can't ship
    #   to every executor; partition e on the JOIN key (dst) so the
    #   per-round exchange is the vertex-sized labels frame plus the
    #   map-side-combined scored aggregate.
    verts = vertices(edges)
    use_bc = verts.count() <= broadcast_vertices
    e = (
        edges.select("src", "dst", "w")
        .where(F.col("src") != F.col("dst"))
        .repartition("src" if use_bc else "dst")
        .persist()
    )
    # eager localCheckpoint per round: truncates lineage AND avoids the
    # unpersist-cascade (unpersisting a parent invalidates caches built
    # on it, which silently re-runs the whole chain on later rounds)
    labels = (
        verts
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    it = 0
    while it < max_iter:
        nbr = labels.select(
            F.col("id").alias("dst"), F.col("label").alias("nl")
        )
        scored = (
            e.join(F.broadcast(nbr) if use_bc else nbr, "dst")
            .groupBy("src", "nl")
            .agg(F.sum("w").alias("wt"))
        )
        # argmax with (max wt, min label) tie-break: max_by on a struct
        # ordered by (wt, -nl) — deterministic (reference-style first-max
        # made order-free, SURVEY §7.3 / louvain.hxx:454-464 analog)
        best = scored.groupBy(F.col("src").alias("id")).agg(
            F.max_by("nl", F.struct(F.col("wt"), (-F.col("nl")).alias("neg"))).alias("new_label")
        )
        if debug_plans is not None:
            # test hook: execute the round body standalone and record
            # its physical plan so the exchange-free property of the
            # broadcast regime stays pinned by pytest
            best.count()
            debug_plans.append(
                best._jdf.queryExecution().executedPlan().toString()
            )
        merged = (
            labels.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.where("changed").count()
        labels = merged.select("id", "label")
        it += 1
        if changed == 0:
            break
    e.unpersist()
    return LabelPropResult(labels, it)
