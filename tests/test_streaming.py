"""Structured-Streaming edge-delta ingestion (dynamic-graph analog)."""

import json
import os

from pyspark.sql import functions as F

from louvain_communities_openmp_spark.oracle import toy5
from louvain_communities_openmp_spark.sources.edges import edges_from_list
from louvain_communities_openmp_spark.streaming.edge_stream import (
    DELTA_SCHEMA,
    EdgeStateStore,
    apply_delta_batch,
    start_edge_delta_stream,
    windowed_edge_rates,
)


def test_state_store_roundtrip(spark, tmp_path):
    store = EdgeStateStore(spark, str(tmp_path / "state"))
    assert store.latest_version() is None
    e = edges_from_list(spark, toy5())
    v = store.commit(e, batch_id=0, stats={"edges": e.count()})
    assert store.latest_version() == v
    back = store.load()
    assert back.count() == 12


def test_apply_delta_batch_symmetric(spark, tmp_path):
    store = EdgeStateStore(spark, str(tmp_path / "state"))
    store.commit(edges_from_list(spark, toy5()), 0, {})
    deltas = spark.createDataFrame(
        [("del", 3, 4, 1.0), ("ins", 0, 4, 2.0)], DELTA_SCHEMA
    )
    apply_delta_batch(store, deltas, 1)
    got = {(r["src"], r["dst"]): r["w"] for r in store.load().collect()}
    assert (3, 4) not in got and (4, 3) not in got
    assert got[(0, 4)] == 2.0 and got[(4, 0)] == 2.0
    # re-inserting an existing edge is a no-op (must-not-exist tidy rule)
    deltas2 = spark.createDataFrame([("ins", 0, 1, 9.0)], DELTA_SCHEMA)
    apply_delta_batch(store, deltas2, 2)
    got2 = {(r["src"], r["dst"]): r["w"] for r in store.load().collect()}
    assert got2[(0, 1)] == 1.0


def test_streaming_drain(spark, tmp_path):
    delta_dir = str(tmp_path / "deltas")
    os.makedirs(delta_dir)
    spark.createDataFrame(
        [("ins", 0, 1, 1.0), ("ins", 1, 2, 1.0)], DELTA_SCHEMA
    ).coalesce(1).write.mode("append").parquet(delta_dir)
    spark.createDataFrame([("del", 0, 1, 1.0)], DELTA_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    state_dir = str(tmp_path / "state")
    q = start_edge_delta_stream(spark, delta_dir, state_dir)
    q.awaitTermination(120)
    store = EdgeStateStore(spark, state_dir)
    got = {(r["src"], r["dst"]) for r in store.load().collect()}
    # both files may land in one micro-batch or two; either way the
    # final state contains 1-2 (+reverse) and not 0-1
    assert (1, 2) in got and (2, 1) in got
    assert store.latest_version() is not None


def test_windowed_rates_batch_parity(spark):
    rows = [
        ("2025-01-01 00:00:01", "ins", 0, 1, 1.0),
        ("2025-01-01 00:00:05", "ins", 1, 2, 1.0),
        ("2025-01-01 00:00:15", "del", 0, 1, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "ts string, op string, src long, dst long, w double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["op"], str(r["start"])): r["n"]
        for r in windowed_edge_rates(df, "10 seconds").collect()
    }
    assert got[("ins", "2025-01-01 00:00:00")] == 2
    assert got[("del", "2025-01-01 00:00:10")] == 1


def test_dynamic_louvain_warm_start_over_versions(spark, tmp_path):
    """DYNAMIC maintainer: v0 cold, v1 warm-started from v0's
    membership; warm run takes no more iterations and lands at a sane
    modularity (reference DYNAMIC semantics, louvain.hxx:305-389)."""
    from louvain_communities_openmp_spark.oracle import ring_of_cliques
    from louvain_communities_openmp_spark.streaming.dynamic_louvain import (
        DynamicLouvain,
    )

    store = EdgeStateStore(spark, str(tmp_path / "state"))
    e0 = edges_from_list(spark, ring_of_cliques(8, 6))
    store.commit(e0, 0, {})
    dl = DynamicLouvain(store)
    v0, res0 = dl.update_to_latest()
    assert v0 == 0 and res0.modularity > 0.5
    # already current → no-op
    assert dl.update_to_latest() is None

    deltas = spark.createDataFrame(
        [("ins", 0, 24, 1.0), ("del", 0, 1, 1.0)],
        "op string, src long, dst long, w double",
    )
    apply_delta_batch(store, deltas, 1)
    v1, res1 = dl.update_to_latest()
    assert v1 == 1
    assert res1.iterations <= res0.iterations
    assert res1.modularity > 0.5
    # membership snapshot persisted and loadable per version
    m1 = dl.load_membership(1)
    assert m1.count() == m1.select("id").distinct().count()
    # frontier-seeded DYNAMIC marking (louvain.hxx:305-389): the warm
    # run was seeded from the batch's affected endpoints and scanned
    # strictly fewer vertices than the cold run
    meta0 = json.load(open(os.path.join(dl._vdir(0), "_COMMIT.json")))
    meta1 = json.load(open(os.path.join(dl._vdir(1), "_COMMIT.json")))
    assert meta0["frontier_seeded"] is False
    assert meta1["frontier_seeded"] is True
    assert 0 < meta1["processed"] < meta0["processed"]


def test_doc_ingest_stream_dedup_and_parity(spark, tmp_path):
    from louvain_communities_openmp_spark.operators.pipeline import clean_corpus
    from louvain_communities_openmp_spark.streaming.doc_stream import (
        DOC_SCHEMA,
        start_doc_ingest_stream,
    )

    docs_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_kept")
    os.makedirs(docs_dir)

    rows = [
        # file 1: two good docs, one dup-of-itself later, one too short
        [(1, "the quick brown fox jumps over the lazy dog again today", "en"),
         (2, "completely different content about spark and the catalyst", "en"),
         (3, "x", "en")],
        # file 2: doc 4 duplicates doc 1's text (cross-batch dedup),
        # doc 5 is fresh
        [(4, "the quick brown fox jumps over the lazy dog again today", "en"),
         (5, "der schnelle braune fuchs ist nicht von der katze und das", "de")],
    ]
    for i, batch in enumerate(rows):
        df = spark.createDataFrame(
            [(d, t, lg, "s", len(t)) for d, t, lg in batch], DOC_SCHEMA
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{docs_dir}/f{i}")
    # the file source watches a flat dir: move part files up in order
    import glob
    import shutil
    import time

    for i in range(len(rows)):
        part = glob.glob(f"{docs_dir}/f{i}/part-*.parquet")[0]
        shutil.move(part, f"{docs_dir}/{i:04d}.parquet")
        os.utime(f"{docs_dir}/{i:04d}.parquet", (time.time() + i, time.time() + i))
        shutil.rmtree(f"{docs_dir}/f{i}")

    q = start_doc_ingest_stream(
        spark, docs_dir, out_dir, min_tokens=3, max_tokens=100, langs=("en", "de")
    )
    q.awaitTermination(120)

    kept = spark.read.parquet(out_dir)
    got = {r["doc_id"]: r for r in kept.collect()}
    assert set(got) == {1, 2, 5}          # 3 gated out, 4 deduped vs 1
    assert got[5]["lang_pred"] == "de"

    # files arrived in doc_id order -> first-accepted == global min:
    # exact parity with the batch operator
    all_docs = spark.createDataFrame(
        [(d, t, lg, "s", len(t)) for b in rows for d, t, lg in b], DOC_SCHEMA
    )
    want = {
        r["doc_id"]: r
        for r in clean_corpus(
            all_docs, min_tokens=3, max_tokens=100, langs=("en", "de")
        ).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d]["n_tokens"] == want[d]["n_tokens"]
        assert got[d]["lang_pred"] == want[d]["lang_pred"]

    # replay idempotence: re-running the same batch appends nothing
    from louvain_communities_openmp_spark.streaming.doc_stream import (
        ingest_batch,
    )

    replay = spark.createDataFrame(
        [(d, t, lg, "s", len(t)) for d, t, lg in rows[1]], DOC_SCHEMA
    )
    assert ingest_batch(
        spark, replay, out_dir, min_tokens=3, max_tokens=100,
        langs=("en", "de"),
    ) == 0


def test_dynamic_pagerank_warm_start_over_versions(spark, tmp_path):
    """PageRank maintainer: v0 cold, v1 warm-started from v0's ranks.
    The fixpoint is start-independent, so the warm result must agree
    with a cold run on the same graph to tolerance while converging in
    no more iterations."""
    from louvain_communities_openmp_spark.operators.pagerank import pagerank
    from louvain_communities_openmp_spark.oracle.graphs import power_law
    from louvain_communities_openmp_spark.streaming.dynamic_pagerank import (
        DynamicPageRank,
    )

    store = EdgeStateStore(spark, str(tmp_path / "state"))
    # power-law graph: the fixpoint is FAR from the uniform start, so
    # cold convergence takes many iterations and the warm-start
    # advantage is measurable (on a regular graph uniform ≈ fixpoint
    # and both paths converge trivially fast)
    e0 = edges_from_list(spark, power_law(n=200, m=3))
    store.commit(e0, 0, {})
    dp = DynamicPageRank(store, tol=1e-9)
    v0, res0 = dp.update_to_latest()
    assert v0 == 0 and res0.iterations > 0
    assert dp.update_to_latest() is None  # already current

    deltas = spark.createDataFrame(
        [("ins", 0, 150, 1.0), ("del", 0, 1, 1.0)],
        "op string, src long, dst long, w double",
    )
    apply_delta_batch(store, deltas, 1)
    v1, res1 = dp.update_to_latest()
    assert v1 == 1
    # warm start (previous fixpoint, one small delta away) converges
    # faster than a cold uniform start on the SAME graph
    cold = pagerank(store.load(1), tol=1e-9)
    assert res1.iterations < cold.iterations
    got = {r["id"]: r["rank"] for r in dp.load_ranks(1).collect()}
    for r in cold.ranks.collect():
        assert abs(got[r["id"]] - r["rank"]) < 1e-6, r["id"]
    # rank snapshots are probability vectors
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_dynamic_components_warm_and_cold(spark, tmp_path):
    """CC maintainer: insert-only deltas take the warm path (previous
    labels merge in ~1-2 rounds, exact vs cold); a deletion batch
    forces the cold path; both land on the cold-truth labels."""
    from louvain_communities_openmp_spark.operators.components import (
        connected_components,
    )
    from louvain_communities_openmp_spark.streaming.dynamic_components import (
        DynamicComponents,
    )

    # two far-apart paths: 0-1-2-3 and 10-11-12-13
    und = [(i, i + 1) for i in range(3)] + [(i, i + 1) for i in range(10, 13)]
    e0 = edges_from_list(spark, [(a, b, 1.0) for a, b in und] + [(b, a, 1.0) for a, b in und])
    store = EdgeStateStore(spark, str(tmp_path / "state"))
    store.commit(e0, 0, {})
    dc = DynamicComponents(store)
    v0, res0, mode0 = dc.update_to_latest()
    assert (v0, mode0) == (0, "cold")
    assert dc.update_to_latest() is None  # current

    # insert-only delta bridging the two components -> warm path
    ins = spark.createDataFrame(
        [("ins", 3, 10, 1.0)], "op string, src long, dst long, w double"
    )
    apply_delta_batch(store, ins, 1)
    v1, res1, mode1 = dc.update_to_latest()
    assert (v1, mode1) == (1, "warm")
    cold1 = connected_components(store.load(1))
    got = {r["id"]: r["comp"] for r in dc.load_components(1).collect()}
    exp = {r["id"]: r["comp"] for r in cold1.components.collect()}
    assert got == exp                       # exact labels
    assert set(got.values()) == {0}         # merged into one component
    # warm convergence beats the cold run on the same graph
    assert res1.iterations <= cold1.iterations

    # deletion splits the bridge again -> cold path, still exact
    dels = spark.createDataFrame(
        [("del", 3, 10, 1.0)], "op string, src long, dst long, w double"
    )
    apply_delta_batch(store, dels, 2)
    v2, res2, mode2 = dc.update_to_latest()
    assert (v2, mode2) == (2, "cold")
    got2 = {r["id"]: r["comp"] for r in dc.load_components(2).collect()}
    exp2 = {
        r["id"]: r["comp"]
        for r in connected_components(store.load(2)).components.collect()
    }
    assert got2 == exp2
    assert set(got2.values()) == {0, 10}


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions survive across
    micro-batches in the state store and are emitted exactly once,
    when a later event closes them; rollups match the batch
    session_window computed over the closed portion."""
    import glob
    import shutil

    from louvain_communities_openmp_spark.streaming.stateful_sessions import (
        sessionize_stream,
    )

    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir)
    schema = "user_id long, ts timestamp, value double"
    batches = [
        # batch 0: u1 two events in one session; u2 one event
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:10:00", 2.0),
         (2, "2024-01-01 01:00:00", 5.0)],
        # batch 1: u1 event 2h later -> closes session A (3 events? no:
        # closes the 2-event session, opens a new one); u2 event 10min
        # later -> same open session (nothing emitted for u2)
        [(1, "2024-01-01 02:30:00", 4.0), (2, "2024-01-01 01:10:00", 1.0)],
        # batch 2: u2 event 3h later -> closes u2's 2-event session
        [(2, "2024-01-01 04:30:00", 9.0)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).select(
            "user_id", F.to_timestamp("ts").alias("ts"), "value"
        )
        d = f"{in_dir}/b{i}"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = glob.glob(f"{d}/part-*.parquet")[0]
        shutil.move(part, f"{in_dir}/{i:04d}.parquet")
        shutil.rmtree(d)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        sessionize_stream(stream, gap_seconds=1800.0)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"])): r
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # exactly the two closed sessions, emitted once each
    assert len(got) == 2
    u1 = got[(1, "2024-01-01 00:00:00")]
    assert str(u1["session_end"]) == "2024-01-01 00:10:00"
    assert u1["n_events"] == 2 and abs(u1["value_sum"] - 3.0) < 1e-9
    u2 = got[(2, "2024-01-01 01:00:00")]
    assert str(u2["session_end"]) == "2024-01-01 01:10:00"
    assert u2["n_events"] == 2 and abs(u2["value_sum"] - 6.0) < 1e-9


def test_stateful_sessionize_late_events_and_timeout(spark, tmp_path):
    """Late-data + abandoned-session semantics (ADVICE r4):
    (a) a cross-batch OUT-OF-ORDER event folds into the open session
    without regressing its last_ts frontier, so a later in-order event
    inside the gap does NOT spuriously close/split the session;
    (b) with a watermark, a session nobody ever closes is flushed by
    the event-time timeout once the watermark passes last_ts + gap."""
    import glob
    import shutil

    from louvain_communities_openmp_spark.streaming.stateful_sessions import (
        sessionize_stream,
    )

    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir)
    schema = "user_id long, ts timestamp, value double"
    batches = [
        # u9: single event, never followed -> abandoned (timeout case)
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:20:00", 2.0),
         (9, "2024-01-01 00:00:00", 7.0)],
        # u1 LATE event (00:10 < frontier 00:20): folds in, frontier
        # must stay 00:20 (regressing to 00:10 would make 00:45 a
        # 35-min gap and wrongly split the session)
        [(1, "2024-01-01 00:10:00", 4.0)],
        # in-order event 25 min after the true frontier: same session
        [(1, "2024-01-01 00:45:00", 1.0)],
        # closes u1's session; also advances the global watermark to
        # 02:00, far past u9's timeout at 00:30
        [(1, "2024-01-01 02:00:00", 5.0)],
        # one more batch so the 02:00 watermark (computed at the END of
        # the previous batch) is in force and u9's timeout fires
        [(8, "2024-01-01 02:10:00", 0.0)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
        d = f"{in_dir}/b{i}"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = glob.glob(f"{d}/part-*.parquet")[0]
        shutil.move(part, f"{in_dir}/{i:04d}.parquet")
        shutil.rmtree(d)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        sessionize_stream(stream, gap_seconds=1800.0, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"])): r
        for r in spark.sql("SELECT * FROM late_sessions").collect()
    }
    # u1: ONE unsplit session of 4 events incl. the late one
    u1 = got[(1, "2024-01-01 00:00:00")]
    assert str(u1["session_end"]) == "2024-01-01 00:45:00"
    assert u1["n_events"] == 4 and abs(u1["value_sum"] - 8.0) < 1e-9
    # u9: flushed by the event-time timeout, exactly once
    u9 = got[(9, "2024-01-01 00:00:00")]
    assert str(u9["session_end"]) == "2024-01-01 00:00:00"
    assert u9["n_events"] == 1 and abs(u9["value_sum"] - 7.0) < 1e-9
