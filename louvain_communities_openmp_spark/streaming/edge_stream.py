"""Micro-batch edge-delta ingestion via Structured Streaming.

The reference's closest streaming analog is its dynamic-batch
machinery: generate/tidy/apply edge deletions+insertions between runs
(batch.hxx:100-248) and warm-start Louvain from the previous membership
(louvain.hxx:305-389, DYNAMIC flag louvain.hxx:1009). Here that becomes
a Structured Streaming flow:

    readStream(delta files: op ∈ {ins, del}, src, dst, w)
      → foreachBatch: apply_batch() onto the maintained edge snapshot
      → versioned parquet snapshots + metrics (per-batch lineage)

Each micro-batch commits a new immutable snapshot directory (never
in-place mutation), so downstream algorithms can pin a version — the
same commit discipline as plans/run.RunDir.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.transforms import apply_batch

DELTA_SCHEMA = "op string, src long, dst long, w double"


class EdgeStateStore:
    """Versioned edge-table snapshots under a state directory."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _vdir(self, v: int) -> str:
        return os.path.join(self.dir, f"v{v:06d}")

    def latest_version(self) -> int | None:
        vs = [
            int(d[1:])
            for d in os.listdir(self.dir)
            if d.startswith("v") and os.path.exists(os.path.join(self.dir, d, "_COMMIT.json"))
        ]
        return max(vs) if vs else None

    def load(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v is None:
            return self.spark.createDataFrame([], "src long, dst long, w double")
        return self.spark.read.parquet(os.path.join(self._vdir(v), "edges"))

    def commit_meta(self, version: int) -> dict:
        """The _COMMIT.json record of a committed version."""
        with open(os.path.join(self._vdir(version), "_COMMIT.json")) as f:
            return json.load(f)

    def commit(
        self,
        edges: DataFrame,
        batch_id: int,
        stats: dict,
        affected: DataFrame | None = None,
    ) -> int:
        v = (self.latest_version() or 0) + 1 if self.latest_version() is not None else 0
        d = self._vdir(v)
        edges.write.mode("overwrite").parquet(os.path.join(d, "edges"))
        if affected is not None:
            # endpoints of this batch's changed edges — the DYNAMIC
            # frontier seed (louvain.hxx:305-389): incremental
            # maintainers mark only these at warm start
            affected.select("id").write.mode("overwrite").parquet(
                os.path.join(d, "affected")
            )
        with open(os.path.join(d, "_COMMIT.json"), "w") as f:
            json.dump({"version": v, "batch_id": batch_id, "ts": time.time(), **stats}, f)
        return v

    def load_affected(self, version: int) -> DataFrame | None:
        """Changed-edge endpoints committed with ``version`` (one
        column ``id``), or None for pre-affected-tracking snapshots."""
        p = os.path.join(self._vdir(version), "affected")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)


def apply_delta_batch(store: EdgeStateStore, batch: DataFrame, batch_id: int) -> int:
    """One micro-batch: split deltas, tidy (dels must exist / ins must
    not — batch.hxx:154-209 semantics via the joins inside
    apply_batch), commit a new snapshot."""
    edges = store.load()
    dels = batch.where(F.col("op") == "del").select("src", "dst")
    ins = batch.where(F.col("op") == "ins").select("src", "dst", "w")
    # symmetric maintenance: apply both directions of every delta
    dels = dels.unionByName(
        dels.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ins = (
        ins.unionByName(
            ins.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        # insertions must not already exist (batch.hxx:192-209)
        .join(edges.select("src", "dst"), ["src", "dst"], "left_anti")
    )
    new_edges = apply_batch(edges, dels, ins)
    n = new_edges.count()
    # endpoints of changed edges — the DYNAMIC frontier seed for
    # incremental maintainers (batch-sized, not graph-sized)
    affected = (
        dels.select(F.col("src").alias("id"))
        .unionByName(dels.select(F.col("dst").alias("id")))
        .unionByName(ins.select(F.col("src").alias("id")))
        .unionByName(ins.select(F.col("dst").alias("id")))
        .distinct()
    )
    # n_dels in the commit record lets incremental maintainers
    # (DynamicComponents) pick the warm path for insert-only batches —
    # component labels are monotone under insertion but not deletion
    return store.commit(
        new_edges, batch_id, {"edges": n, "n_dels": dels.count()},
        affected=affected,
    )


def start_edge_delta_stream(
    spark: SparkSession,
    delta_dir: str,
    state_dir: str,
    available_now: bool = True,
):
    """Stream delta files (parquet, DELTA_SCHEMA) into the state store.
    Returns the StreamingQuery; with available_now=True it drains the
    backlog and stops (deterministic for tests/benchmarks)."""
    store = EdgeStateStore(spark, state_dir)
    stream = (
        spark.readStream.schema(DELTA_SCHEMA).parquet(delta_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda batch, bid: apply_delta_batch(store, batch, bid) and None
        )
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoints"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_edge_rates(deltas: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds") -> DataFrame:
    """Streaming windowed aggregation demo over timestamped deltas
    (ts timestamp, op, src, dst, w): edges/sec per op with late-data
    watermarking. Works on both batch and streaming frames."""
    return (
        deltas.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "op")
        .agg(F.count("*").alias("n"), F.sum("w").alias("wsum"))
        .select("win.start", "win.end", "op", "n", "wsum")
    )
