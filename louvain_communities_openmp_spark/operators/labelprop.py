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
    edges: DataFrame, max_iter: int = 10
) -> LabelPropResult:
    # partition the static edge table on its per-round JOIN KEY before
    # caching: the per-round labels join then exchanges only the
    # vertex-sized labels frame, never the edges (same pattern as the
    # Louvain routing table)
    e = (
        edges.select("src", "dst", "w")
        .where(F.col("src") != F.col("dst"))
        .repartition("dst")
        .persist()
    )
    # eager localCheckpoint per round: truncates lineage AND avoids the
    # unpersist-cascade (unpersisting a parent invalidates caches built
    # on it, which silently re-runs the whole chain on later rounds)
    labels = (
        vertices(edges)
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    it = 0
    while it < max_iter:
        scored = (
            e.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src", "nl")
            .agg(F.sum("w").alias("wt"))
        )
        # argmax with (max wt, min label) tie-break: max_by on a struct
        # ordered by (wt, -nl) — deterministic (reference-style first-max
        # made order-free, SURVEY §7.3 / louvain.hxx:454-464 analog)
        best = scored.groupBy(F.col("src").alias("id")).agg(
            F.max_by("nl", F.struct(F.col("wt"), (-F.col("nl")).alias("neg"))).alias("new_label")
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
