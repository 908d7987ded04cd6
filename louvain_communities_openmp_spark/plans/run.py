"""Checkpoint / metrics / lineage for iterative algorithms.

North-rule requirement: every super-step (Louvain pass) checkpoints the
coarsened graph and membership plus per-partition lineage and metrics so
any pass is resumable mid-iteration. Layout (parquet + JSONL — an
Iceberg-compatible directory layout; the table format itself is not
available in this sandbox, the commit protocol below mirrors its
atomic-manifest idea):

    run_dir/
      pass_0000/edges/        coarsened edge table entering pass p+1
      pass_0000/membership/   flattened original-vertex membership
      pass_0000/_SUCCESS.json manifest: row counts, per-partition files
      metrics.jsonl           one record per completed super-step

A pass directory counts as committed only once ``_SUCCESS.json`` exists
(written last), so a killed run never resumes from a torn snapshot.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class RunDir:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _pass_dir(self, p: int) -> str:
        return os.path.join(self.path, f"pass_{p:04d}")

    def save_pass(self, p: int, edges: DataFrame, membership: DataFrame, extra: dict):
        d = self._pass_dir(p)
        edges.write.mode("overwrite").parquet(os.path.join(d, "edges"))
        membership.write.mode("overwrite").parquet(os.path.join(d, "membership"))
        manifest = {
            "pass": p,
            "ts": time.time(),
            "lineage": {
                "edges": _file_lineage(os.path.join(d, "edges")),
                "membership": _file_lineage(os.path.join(d, "membership")),
            },
            **extra,
        }
        with open(os.path.join(d, "_SUCCESS.json"), "w") as f:
            json.dump(manifest, f)
        self.log_metrics({"event": "pass_committed", **manifest})

    def last_completed_pass(self) -> int | None:
        best = None
        if not os.path.isdir(self.path):
            return None
        for name in os.listdir(self.path):
            if name.startswith("pass_") and os.path.exists(
                os.path.join(self.path, name, "_SUCCESS.json")
            ):
                p = int(name.split("_")[1])
                best = p if best is None else max(best, p)
        return best

    def load_pass(self, spark: SparkSession, p: int):
        d = self._pass_dir(p)
        with open(os.path.join(d, "_SUCCESS.json")) as f:
            manifest = json.load(f)
        edges = spark.read.parquet(os.path.join(d, "edges"))
        membership = spark.read.parquet(os.path.join(d, "membership"))
        return edges, membership, manifest

    def log_metrics(self, record: dict):
        with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")


def _file_lineage(path: str) -> list[dict]:
    """Per-partition lineage: the physical files backing a checkpoint."""
    out = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            fp = os.path.join(path, name)
            out.append({"file": name, "bytes": os.path.getsize(fp)})
    return out
