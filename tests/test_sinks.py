"""Bucketed edge-table sink: the co-located-join storage layout."""

import os

import pytest
from pyspark.sql import functions as F

from louvain_communities_openmp_spark.sources.edges import (
    edges_from_list,
    read_bucketed,
    write_edges_bucketed,
)


@pytest.fixture()
def bucket_db(spark, tmp_path):
    """Session-catalog database rooted under tmp_path so bucketed
    tables never land in the repo's default warehouse."""
    db = "bktest"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}'")
    yield db
    for t in spark.catalog.listTables(db):
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t.name}")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_bucketed_roundtrip(spark, bucket_db):
    e = edges_from_list(
        spark, [(i % 17, (i * 7) % 17, 1.0) for i in range(200)]
    )
    write_edges_bucketed(e, f"{bucket_db}.edges_rt", buckets=4)
    back = read_bucketed(spark, f"{bucket_db}.edges_rt")
    assert back.count() == e.count()
    assert sorted(back.columns) == sorted(e.columns)
    a = {(r["src"], r["dst"], r["w"]) for r in e.collect()}
    b = {(r["src"], r["dst"], r["w"]) for r in back.collect()}
    assert a == b


def test_bucketed_join_is_shuffle_free(spark, bucket_db):
    """Two tables bucketed on the same key with the same bucket count
    join bucket-to-bucket: the executed plan contains NO Exchange —
    the at-rest co-location that replaces the per-join shuffle of a
    100 TB edge⋈membership lookup."""
    e = edges_from_list(
        spark, [(i % 29, (i * 5) % 29, 1.0) for i in range(400)]
    )
    mem = e.select(F.col("src").alias("id")).distinct().select(
        F.col("id").alias("src"), (F.col("id") % 3).alias("com")
    )
    write_edges_bucketed(e, f"{bucket_db}.edges_bj", buckets=4)
    write_edges_bucketed(mem, f"{bucket_db}.mem_bj", buckets=4)
    # disable broadcast so the join must pick a key-partitioned
    # strategy — the realistic shape when both sides are huge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, f"{bucket_db}.edges_bj").join(
            read_bucketed(spark, f"{bucket_db}.mem_bj"), "src"
        )
        n = j.count()
        assert n == 400
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # the same join from plain (bucket-less) parquet DOES shuffle —
        # proves the assertion above is discriminating, not vacuous
        p1 = os.path.join(
            os.path.dirname(spark.table(f"{bucket_db}.edges_bj").inputFiles()[0])
        )
        flat = spark.read.parquet(p1).join(
            read_bucketed(spark, f"{bucket_db}.mem_bj"), "src"
        )
        flat.count()
        flat_plan = flat._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in flat_plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
