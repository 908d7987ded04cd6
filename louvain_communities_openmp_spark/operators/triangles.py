"""Triangle counting via edge-edge join on ordered ids.

Exact-match target vs oracle.simple.triangle_count_seq. Counted on the
simple undirected graph (self-loops dropped, duplicates collapsed):
canonicalize to src<dst, join e1(a,b)⋈e2(b,c) with a<b<c, close the
wedge against the canonical edge set. Each triangle {a<b<c} found once;
per-vertex credit via explode of the three corners.

Scale notes: the wedge join keys on the *middle* vertex b — a hub b
creates deg² wedges; AQE skew-join splitting handles the join-side
skew, and the canonical orientation (a<b<c) cuts the wedge count
roughly in half vs naive.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transforms import vertices


@dataclass
class TriangleResult:
    per_vertex: DataFrame  # (id long, triangles long)
    total: int


def _canonical(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )


def triangle_count_total(edges: DataFrame) -> int:
    c = _canonical(edges)
    e1 = c.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = c.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = c.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).count()


def triangle_count(edges: DataFrame) -> TriangleResult:
    c = _canonical(edges).persist()
    e1 = c.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = c.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = c.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    per = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    all_verts = vertices(edges).join(per, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    total = tris.count()
    c.unpersist()
    return TriangleResult(all_verts, total)
