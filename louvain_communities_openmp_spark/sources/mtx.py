"""MatrixMarket (.mtx) graph ingest — the reference's own benchmark
corpus format (reference: inc/mtx.hxx:119-249 readMtxW / main.sh:28-40).

Semantics pinned to the reference:

- header ``%%MatrixMarket matrix coordinate <field> <symmetry>``;
  ``%`` comment lines; first non-comment line = ``rows cols nnz``
  (mtx.hxx:125-141)
- body lines ``u v [w]``, 1-indexed → converted to 0-indexed longs
- default weight 1.0 when the field is ``pattern`` / weight column
  absent / ``weighted=False`` (mtx.hxx:174-178: ``w? f: 1``)
- ``symmetric`` header ⇒ every edge is mirrored; duplicate (src, dst)
  keys collapse to one row (the reference's addEdge goes through a
  LazyBitset where the last write wins — weights in .mtx duplicates are
  equal, so collapse order is immaterial) (mtx.hxx:186-189)

Plan shape: the tiny header is read driver-side; the body scan, parse,
mirror and dedupe are all JVM-side DataFrame ops (S2/S3 parallel body
scan). The size line is removed by exact text match — validated by
comparing the parsed row count against the header's nnz, with a
deterministic zipWithIndex fallback if a pathological edge line
collides with the size line's text.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MtxGraph:
    edges: DataFrame  # (src long, dst long, w double), 0-indexed
    n_vertices: int   # header row count (includes isolated vertices)
    n_entries: int    # header nnz (pre-mirror)
    symmetric: bool
    field: str        # real | integer | pattern | ...


def _read_header(path: str) -> tuple[int, str, str, int, int, int, str]:
    """Driver-side header scan → (n_header_lines, field, symmetry,
    rows, cols, nnz, size_line_text)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        first = f.readline()
        if not first.startswith("%%MatrixMarket"):
            raise ValueError(f"not a MatrixMarket file: {path!r}")
        toks = first.split()
        if len(toks) < 5 or toks[1].lower() != "matrix" or toks[2].lower() != "coordinate":
            raise ValueError(f"unsupported MatrixMarket header: {first!r}")
        field, sym = toks[3].lower(), toks[4].lower()
        n_lines = 1
        for line in f:
            n_lines += 1
            if line.startswith("%"):
                continue
            rows, cols, nnz = (int(x) for x in line.split()[:3])
            return n_lines, field, sym, rows, cols, nnz, line.rstrip("\n")
    raise ValueError(f"no size line found in {path!r}")


def read_mtx(
    spark: SparkSession,
    path: str,
    weighted: bool | None = None,
    keep_self_loops: bool = True,
) -> MtxGraph:
    """Read a .mtx file into the engine's canonical edge table.

    ``weighted=None`` follows the header field (real/integer weighted,
    pattern unweighted); True/False forces it (the reference CLI's
    ``weighted`` flag, main.cxx:100-105).
    """
    n_header, field, sym, rows, cols, nnz, size_line = _read_header(path)
    symmetric = sym == "symmetric"
    use_w = field in ("real", "integer") if weighted is None else weighted

    body = (
        spark.read.text(path)
        .where(~F.col("value").startswith("%"))
        .where(F.trim("value") != "")
        .where(F.col("value") != size_line)
    )
    parts = F.split(F.trim("value"), r"\s+")
    w_col = (
        F.coalesce(parts.getItem(2).cast("double"), F.lit(1.0))
        if use_w
        else F.lit(1.0)
    )
    e = body.select(
        (parts.getItem(0).cast("long") - 1).alias("src"),
        (parts.getItem(1).cast("long") - 1).alias("dst"),
        w_col.alias("w"),
    )
    n_parsed = e.count()
    if n_parsed != nnz:
        # an edge line textually equal to the size line was filtered too
        # (or extra size-like lines exist): fall back to the exact
        # line-indexed scan, which drops precisely the header lines
        lines = spark.sparkContext.textFile(path).zipWithIndex()
        bodyr = (
            lines.filter(lambda t: t[1] >= n_header)
            .map(lambda t: (t[0],))
        )
        body = spark.createDataFrame(bodyr, "value string").where(
            F.trim("value") != ""
        )
        e = body.select(
            (parts.getItem(0).cast("long") - 1).alias("src"),
            (parts.getItem(1).cast("long") - 1).alias("dst"),
            w_col.alias("w"),
        )
    if symmetric:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    # Collapse duplicate (src, dst) entries for ALL symmetries — the
    # reference's addEdge (LazyBitset) keeps one weight per key for
    # every format. File order is meaningless after a parallel scan, so
    # the policy here is deterministic and order-independent: max(w)
    # (for the reference's 0/1-weighted corpus all duplicates carry
    # equal weight, where any policy coincides with last-write-wins).
    e = e.groupBy("src", "dst").agg(F.max("w").alias("w"))
    if not keep_self_loops:
        e = e.where(F.col("src") != F.col("dst"))
    return MtxGraph(
        edges=e, n_vertices=rows, n_entries=nnz, symmetric=symmetric,
        field=field,
    )


def write_mtx(
    edges: DataFrame,
    path: str,
    n_vertices: int | None = None,
    symmetric: bool = True,
    weighted: bool = True,
) -> None:
    """MatrixMarket sink — the reference-format round-trip partner of
    read_mtx (reference corpus convention, main.sh:28-40): 1-indexed
    ``u v [w]`` coordinate lines under a
    ``%%MatrixMarket matrix coordinate <real|pattern> <symmetric|general>``
    header.

    ``symmetric=True`` writes each undirected edge once as its
    lower-triangle representative (src >= dst — exactly what read_mtx
    re-mirrors), halving the file as the reference corpus does. The
    representative is produced by CANONICALIZING every row to
    (max, min) and deduplicating with the engine's uniform max-w
    policy (BASELINE.md "updateU flush"), so both common undirected
    encodings round-trip: a fully mirrored table collapses to its
    lower triangle, and a canonical src < dst half-edge table is
    flipped rather than silently dropped (which would write an empty
    body with nnz=0). Body lines are produced and ordered
    distributed (sort by (src, dst) for a canonical byte stream), then
    streamed to the driver ONCE via toLocalIterator — the driver holds
    a partition at a time, not the file; at 100 TB scale the same body
    select writes straight to parquet/text sinks instead, the local
    single-file format being a small-graph interchange convenience by
    construction.
    """
    e = edges.select("src", "dst", "w")
    if symmetric:
        e = (
            e.select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
                "w",
            )
            .groupBy("src", "dst")
            .agg(F.max("w").alias("w"))
        )
    if n_vertices is None:
        n_vertices = (
            edges.select(F.greatest(F.max("src"), F.max("dst")).alias("m"))
            .first()["m"]
            + 1
        )
    body = (
        e.withColumn(
            "line",
            F.concat_ws(
                " ",
                (F.col("src") + 1).cast("string"),
                (F.col("dst") + 1).cast("string"),
                *(
                    [
                        F.when(
                            F.col("w")
                            == F.col("w").cast("long").cast("double"),
                            F.col("w").cast("long").cast("string"),
                        ).otherwise(F.col("w").cast("string"))
                    ]
                    if weighted
                    else []
                ),
            ),
        )
        .orderBy("src", "dst")
        .select("line")
    )
    nnz = e.count()
    field = "real" if weighted else "pattern"
    sym = "symmetric" if symmetric else "general"
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} {sym}\n")
        f.write(f"{n_vertices} {n_vertices} {nnz}\n")
        for row in body.toLocalIterator():
            f.write(row["line"])
            f.write("\n")
