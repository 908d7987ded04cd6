#!/usr/bin/env python
"""Benchmark driver.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus throughput extras}.

--scaling: additionally runs the Louvain pass-0 job at local[8] and
local[32] on the same input and reports throughput at both plus
efficiency = (T_8 / T_32) / 4 — the sandbox substitute for the north
rule's N vs 4N executor-cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_tag(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite(spark, sf_dir: str) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from louvain_communities_openmp_spark.operators.components import (
        connected_components,
    )
    from louvain_communities_openmp_spark.operators.dedup import (
        dedup_exact,
        minhash_signatures,
    )
    from louvain_communities_openmp_spark.operators.labelprop import label_propagation
    from louvain_communities_openmp_spark.operators.louvain import (
        LouvainOptions,
        louvain,
    )
    from louvain_communities_openmp_spark.operators.pagerank import pagerank_fixed
    from louvain_communities_openmp_spark.operators.properties import modularity
    from louvain_communities_openmp_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from louvain_communities_openmp_spark.operators.triangles import (
        triangle_count_total,
    )
    from louvain_communities_openmp_spark.sources.edges import coorder_edges

    times: dict = {}
    extras: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 3)
        return out

    edges = timed(
        "edge_build",
        lambda: coorder_edges(spark, sf_dir).persist(),
    )
    n_edges = edges.count()
    extras["n_edges_directed"] = n_edges

    res = timed(
        "louvain",
        lambda: louvain(edges, LouvainOptions(mode="auto")),
    )
    extras["louvain_modularity"] = round(res.modularity, 6)
    extras["louvain_passes"] = res.passes
    extras["louvain_edges_per_sec"] = round(n_edges / times["louvain"], 1)

    mem = res.membership
    timed("modularity_eval", lambda: modularity(edges, mem))
    timed("pagerank5", lambda: pagerank_fixed(edges, iters=5).count())
    timed("components", lambda: connected_components(edges).components.count())
    timed("labelprop4", lambda: label_propagation(edges, max_iter=4).labels.count())
    extras["n_triangles"] = timed("triangles", lambda: triangle_count_total(edges))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    extras["n_docs"] = docs.count()
    timed("dedup_exact", lambda: dedup_exact(docs).count())
    timed("minhash_sig8", lambda: minhash_signatures(docs, k=5, num_hashes=8).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    queries = emb.orderBy("vec_id").limit(10)
    timed("cosine_topk", lambda: cosine_topk_bruteforce(emb, queries, k=10).count())

    edges.unpersist()
    docs.unpersist()
    emb.unpersist()
    return times, extras


def _louvain_pass0_throughput(cpus: int, sf_dir: str) -> dict:
    """One dist-mode Louvain pass-0 on local[cpus] → edges/sec.

    Fresh SparkSession per parallelism level; same input, same plan.
    """
    from louvain_communities_openmp_spark.operators.louvain import (
        LouvainOptions,
        louvain,
    )
    from louvain_communities_openmp_spark.session import get_spark
    from louvain_communities_openmp_spark.sources.edges import coorder_edges

    spark = get_spark(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    try:
        edges = coorder_edges(spark, sf_dir).persist()
        n = edges.count()
        t0 = time.time()
        res = louvain(
            edges,
            # block_vertices small enough that the kernel stage has at
            # least `cpus` blocks on this graph — the scaling run must
            # actually expose more parallelism at higher core counts
            LouvainOptions(
                mode="dist", num_blocks=cpus, block_vertices=256, max_passes=1
            ),
        )
        res.membership.count()
        dt = time.time() - t0
        return {
            "cpus": cpus,
            "edges": n,
            "seconds": round(dt, 2),
            "edges_per_sec": round(n * res.iterations / dt, 1),
            "iterations": res.iterations,
            "modularity": round(res.modularity, 6),
        }
    finally:
        spark.stop()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv

    from louvain_communities_openmp_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    times, extras = run_suite(spark, sf_dir)
    spark.stop()

    out = {
        "metric": "headline suite wall time (louvain+companions+pipeline) on co-order graph & documents",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf_tag(sf_dir),
        **extras,
    }
    if scaling:
        lo = _louvain_pass0_throughput(8, sf_dir)
        hi = _louvain_pass0_throughput(32, sf_dir)
        out["scaling"] = {
            "local8": lo,
            "local32": hi,
            "efficiency": round(lo["seconds"] / hi["seconds"] / 4.0, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
