"""Streaming document ingestion: the clean_corpus pipeline as a
Structured Streaming job — quality gates + language filter + exact
dedup maintained ACROSS micro-batches.

Shape (mirrors EdgeStateStore in edge_stream.py): documents arrive as
parquet files in a watched directory; each micro-batch runs the shared
map-side gate (operators.pipeline.gated_features — identical Catalyst
expressions to the batch/oracled path), picks the min-doc_id canonical
per content hash WITHIN the batch, anti-joins against the hashes
already accepted in previous batches, and appends the survivors to the
output directory. The accepted-output parquet IS the dedup state — no
second store to keep consistent, restart-safe because the stream
checkpoint and the appended files advance together (foreachBatch is
idempotent per batch id at-least-once: a replayed batch anti-joins
against its own earlier output and appends nothing).

Dedup semantics across batches are FIRST-ACCEPTED-WINS (arrival
order), the standard streaming-ingest rule; the batch operator's
global min-doc_id rule is recovered when files arrive in doc_id order
— test_streaming asserts that parity against clean_corpus.

Scale notes: per batch the only shuffle is the groupBy(text_hash)
canonical pick (uniform 128-bit key, map-side combined); the
anti-join's right side is hash+id only (two columns of the accepted
set — column pruning keeps the state read vertex-, not corpus-sized).
At corpus scale the accepted-hash set would be bucketed by text_hash
so the anti-join co-locates without a shuffle of the state side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline import gated_features

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

KEPT_SCHEMA = (
    "doc_id long, text_hash string, lang_pred string, n_tokens long, "
    "n_chars long, alpha_ratio double"
)


def _accepted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Hashes accepted so far (the dedup state = the sink itself)."""
    try:
        return spark.read.schema(KEPT_SCHEMA).parquet(out_dir).select(
            "text_hash"
        )
    except Exception:
        return spark.createDataFrame([], "text_hash string")


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    out_dir: str,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_alpha_ratio: float = 0.0,
    langs=None,
) -> int:
    """One micro-batch of the ingest: gate → in-batch canonical →
    cross-batch anti-join → append. Returns rows appended."""
    gated = gated_features(
        batch, min_tokens, max_tokens, min_alpha_ratio, langs
    )
    # canonical per hash within the batch: deterministic min doc_id
    # (min_by on the full row avoids a second self-join)
    canon = gated.groupBy("text_hash").agg(
        F.min_by(
            F.struct(
                "doc_id", "lang_pred", "n_tokens", "n_chars", "alpha_ratio"
            ),
            F.col("doc_id"),
        ).alias("r")
    ).select(
        F.col("r.doc_id").alias("doc_id"),
        "text_hash",
        F.col("r.lang_pred").alias("lang_pred"),
        F.col("r.n_tokens").alias("n_tokens"),
        F.col("r.n_chars").alias("n_chars"),
        F.col("r.alpha_ratio").alias("alpha_ratio"),
    )
    fresh = canon.join(_accepted(spark, out_dir), "text_hash", "left_anti")
    n = fresh.count()
    if n:
        fresh.select(
            "doc_id", "text_hash", "lang_pred", "n_tokens", "n_chars",
            "alpha_ratio",
        ).write.mode("append").parquet(out_dir)
    return n


def start_doc_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    **gates,
):
    """Watch `docs_dir` for document parquet files and maintain the
    deduplicated, gated corpus under `out_dir`. Returns the
    StreamingQuery; with available_now=True the backlog is drained in
    deterministic file order and the query stops (test/benchmark
    mode)."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)
    writer = stream.writeStream.foreachBatch(
        lambda batch, bid: ingest_batch(spark, batch, out_dir, **gates)
        and None
    ).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(out_dir, "_checkpoints"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
