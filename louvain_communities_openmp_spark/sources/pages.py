"""Deterministic synthetic pages table (FIXTURES.md §1).

Schema (BASELINE.json input_hint): ``url string, warc_ts timestamp,
html binary, text string, lang string``. Built entirely with Catalyst
expressions over a planted edge DataFrame — scalable generation, no
driver-side loops, no randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def url_of(col, n_hosts: int = 16):
    """url(i) = https://host{i % n_hosts}.example/p{i}"""
    return F.concat(
        F.lit("https://host"),
        (col % n_hosts).cast("string"),
        F.lit(".example/p"),
        col.cast("string"),
    )


def make_pages(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    n_hosts: int = 16,
) -> DataFrame:
    """Pages table for vertices 0..n-1 whose anchors encode ``edges``.

    ``edges`` is a *directed* (src, dst, w) frame; each page embeds one
    ``<a href>`` per out-edge in ascending dst order (duplicate edges →
    duplicate anchors). The ``text`` column is the payload that
    extraction must reproduce byte-identically.
    """
    verts = spark.range(n).withColumnRenamed("id", "src")
    out = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("dsts"))
    )
    # anchor text is deterministic and varied — "w{(src*31+dst)%7} p{dst}"
    # — so inbound-anchor-text aggregation (operators/anchors.py) has a
    # real term distribution to rank, not a constant
    anchors = F.array_join(
        F.transform(
            F.col("dsts"),
            lambda d: F.concat(
                F.lit('<a href="'),
                url_of(d, n_hosts),
                F.lit('">w'),
                ((F.col("src") * 31 + d) % 7).cast("string"),
                F.lit(" p"),
                d.cast("string"),
                F.lit("</a>"),
            ),
        ),
        "",
    )
    text = F.concat(
        F.lit("Page "),
        F.col("src").cast("string"),
        F.lit(" corpus sample token "),
        ((F.col("src") * 2654435761) % 997).cast("string"),
        F.lit("."),
    )
    return (
        verts.join(out, "src", "left")
        .withColumn("dsts", F.coalesce("dsts", F.array()))
        .select(
            url_of(F.col("src"), n_hosts).alias("url"),
            (
                F.to_timestamp(F.lit("2025-01-01 00:00:00"))
                + F.make_interval(secs=F.col("src").cast("double"))
            ).alias("warc_ts"),
            F.encode(
                F.concat(
                    F.lit("<html><head><title>p"),
                    F.col("src").cast("string"),
                    F.lit("</title></head><body>"),
                    anchors,
                    F.lit("<p>"),
                    text,
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ).alias("html"),
            text.alias("text"),
            F.when(F.col("src") % 10 == 0, F.lit("de")).otherwise(F.lit("en")).alias("lang"),
        )
    )


def make_captures(ids: DataFrame, id_col: str, n_captures: int = 3) -> DataFrame:
    """Multi-capture crawl index for a set of page ids: ``n_captures``
    rows per url with deterministic pseudo-random ``warc_ts`` offsets
    (a Common-Crawl index has one row per (url, fetch)). Pure Catalyst
    — explodes a literal capture array, no randomness, no driver loop.

    Offsets ``(id*37 + c*7919) % 99991`` are collision-free within a
    url (7919·Δc ≢ 0 mod 99991 for Δc ∈ {1,2}), so "latest" is
    unambiguous.
    """
    i = F.col(id_col).cast("long")
    return (
        ids.select(i.alias("_i"), url_of(i).alias("url"))
        .select(
            "url",
            "_i",
            F.explode(F.array(*[F.lit(c) for c in range(n_captures)])).alias("capture"),
        )
        .select(
            "url",
            "capture",
            (
                F.to_timestamp(F.lit("2025-01-01 00:00:00"))
                + F.make_interval(
                    secs=((F.col("_i") * 37 + F.col("capture") * 7919) % 99991).cast(
                        "double"
                    )
                )
            ).alias("warc_ts"),
        )
    )


def latest_snapshot(captures: DataFrame, key: str = "url", ts: str = "warc_ts") -> DataFrame:
    """One row per ``key``: the capture with the max ``ts`` (dedupe a
    crawl index down to the freshest snapshot of every url).

    Plan shape (100 TB): a single map-side-combined `max(struct)`
    aggregation — the struct comparator orders by ``ts`` first, so the
    partial agg collapses each key's captures inside every input
    partition before the one shuffle on ``key``. This beats the
    row_number-over-window formulation, which shuffles ALL capture
    rows and sorts each key group.  Deterministic under ts ties: the
    remaining columns break them lexicographically.
    """
    others = [c for c in captures.columns if c != key]
    packed = captures.groupBy(key).agg(
        F.max(F.struct(ts, *[c for c in others if c != ts])).alias("_s")
    )
    return packed.select(key, *[F.col(f"_s.{c}").alias(c) for c in others])
