"""Pages-table operators: capture synthesis, freshness dedupe, Katz.

The p_* driver queries put the input_hint shape and the byte-identity
extraction invariant into the DuckDB-gated hard signal; these tests pin
the same operators against in-Python references on fixtures.
"""

import math

from pyspark.sql import functions as F

from louvain_communities_openmp_spark.operators.centrality import katz_fixed
from louvain_communities_openmp_spark.oracle import karate
from louvain_communities_openmp_spark.sources.edges import edges_from_list
from louvain_communities_openmp_spark.sources.pages import (
    latest_snapshot,
    make_captures,
)


def test_make_captures_shape_and_no_ties(spark):
    ids = spark.range(40).withColumnRenamed("id", "doc_id")
    caps = make_captures(ids, "doc_id", n_captures=3)
    rows = caps.collect()
    assert len(rows) == 120
    by_url: dict = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["warc_ts"])
    # 3 captures per url, all timestamps distinct within a url
    for ts in by_url.values():
        assert len(ts) == 3
        assert len(set(ts)) == 3


def test_latest_snapshot_is_argmax_per_key(spark):
    ids = spark.range(40).withColumnRenamed("id", "doc_id")
    caps = make_captures(ids, "doc_id", n_captures=3).persist()
    got = {r["url"]: r["warc_ts"] for r in latest_snapshot(caps).collect()}
    want = {
        r["url"]: r["mx"]
        for r in caps.groupBy("url").agg(F.max("warc_ts").alias("mx")).collect()
    }
    assert got == want
    # one row per url, all columns preserved
    out = latest_snapshot(caps)
    assert set(out.columns) == {"url", "capture", "warc_ts"}
    assert out.count() == 40
    caps.unpersist()


def test_latest_snapshot_single_aggregation_no_window_sort(spark):
    """The plan must be the map-side-combinable max(struct) aggregate,
    not a window sort: exactly one Exchange (on the key), no Window."""
    ids = spark.range(16).withColumnRenamed("id", "doc_id")
    plan = latest_snapshot(
        make_captures(ids, "doc_id")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_katz_exact_int_matches_float_path(spark):
    e = edges_from_list(spark, karate())
    f = {r["id"]: r["katz"] for r in katz_fixed(e, 0.01, 4).collect()}
    x = {
        r["id"]: r["katz_x100000000"] / 1e8
        for r in katz_fixed(e, 0.01, 4, exact_int=True).collect()
    }
    assert set(f) == set(x)
    for v in f:
        # float path rounds half-up to 6 decimals, so it may sit a full
        # half-ulp (5e-7) from the exact integer-arithmetic value
        assert math.isclose(f[v], x[v], rel_tol=0, abs_tol=6e-7)


def test_katz_hand_computed_on_path(spark):
    # path 0-1-2 (w=1): k0=1; k1(v)=1+0.01*deg(v);
    # k2(0)=1+.01*k1(1)=1.0102, k2(1)=1+.01*(k1(0)+k1(2))=1.0202
    e = edges_from_list(spark, [(0, 1, 1), (1, 0, 1), (1, 2, 1), (2, 1, 1)])
    got = {r["id"]: r["katz"] for r in katz_fixed(e, 0.01, 2).collect()}
    assert got == {0: 1.0102, 1: 1.0202, 2: 1.0102}


def test_canonical_url_grammar(spark):
    from louvain_communities_openmp_spark.functions.urls import (
        canonical_url,
        host_of,
    )

    cases = [
        ("HTTPS://ExAmple.COM:443/Path#frag", "https://example.com/Path"),
        ("http://a.b:80/", "http://a.b/"),
        ("http://a.b:8080/x", "http://a.b:8080/x"),  # non-default port kept
        ("https://a.b", "https://a.b/"),  # empty path -> /
        ("https://a.b/x?", "https://a.b/x"),  # empty query dropped
        ("https://a.b/x?q=1", "https://a.b/x?q=1"),  # real query kept
        ("https://a.b/CaseSensitive", "https://a.b/CaseSensitive"),
        ("not a url#f", "not a url"),  # schemeless: fragment cut only
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]
    hosts = [
        r["h"]
        for r in df.select(host_of(F.col("url")).alias("h")).collect()
    ]
    assert hosts[0] == "example.com" and hosts[2] == "a.b" and hosts[-1] == ""


def test_extract_anchors_pairs_in_document_order(spark):
    from louvain_communities_openmp_spark.functions.extract import (
        extract_anchors_py,
    )

    html = (
        b'<a href="u1">first text</a> junk '
        b'<a class="c" href="u2">second</a><a href="u1">dup</a>'
    )
    assert extract_anchors_py(html) == [
        ("u1", "first text"),
        ("u2", "second"),
        ("u1", "dup"),
    ]


def test_anchor_text_terms_top_term(spark):
    from louvain_communities_openmp_spark.operators.anchors import (
        anchor_text_terms,
    )

    rows = [
        (b'<a href="t">alpha beta</a><a href="t">alpha</a>',),
        (b'<a href="t">gamma</a><a href="s">solo</a>',),
    ]
    pages = spark.createDataFrame(rows, "html binary")
    got = {
        r["url"]: (r["n_anchor_terms"], r["top_term"], r["top_term_n"])
        for r in anchor_text_terms(pages).collect()
    }
    assert got == {"t": (4, "alpha", 2), "s": (1, "solo", 1)}


def _caps_df(spark, rows):
    from louvain_communities_openmp_spark.streaming.capture_stream import (
        CAPTURE_SCHEMA,
    )

    return spark.createDataFrame(rows, CAPTURE_SCHEMA)


def test_capture_stream_batch_parity_and_out_of_order(spark, tmp_path):
    """Streaming argmax-merge over split batches == one-shot
    latest_snapshot over all captures, even when an older capture
    arrives in a LATER batch."""
    import datetime as dt

    from louvain_communities_openmp_spark.sources.pages import latest_snapshot
    from louvain_communities_openmp_spark.streaming.capture_stream import (
        SnapshotStore,
        apply_capture_batch,
    )

    t = lambda s: dt.datetime(2025, 1, 1, 0, 0, s)  # noqa: E731
    all_rows = [
        ("u1", 0, t(10)),
        ("u1", 1, t(30)),
        ("u2", 0, t(20)),
        ("u1", 2, t(5)),   # stale capture, arrives last
        ("u3", 0, t(1)),
    ]
    store = SnapshotStore(spark, str(tmp_path / "state"))
    apply_capture_batch(store, _caps_df(spark, all_rows[:2]), 0)
    apply_capture_batch(store, _caps_df(spark, all_rows[2:3]), 1)
    apply_capture_batch(store, _caps_df(spark, all_rows[3:]), 2)
    got = {
        r["url"]: (r["capture"], r["warc_ts"]) for r in store.load().collect()
    }
    want = {
        r["url"]: (r["capture"], r["warc_ts"])
        for r in latest_snapshot(_caps_df(spark, all_rows)).collect()
    }
    assert got == want
    assert got["u1"] == (1, t(30))  # stale arrival did not regress


def test_capture_stream_replay_is_exactly_once(spark, tmp_path):
    import datetime as dt

    from louvain_communities_openmp_spark.streaming.capture_stream import (
        SnapshotStore,
        apply_capture_batch,
    )

    rows = [("u1", 0, dt.datetime(2025, 1, 1))]
    store = SnapshotStore(spark, str(tmp_path / "state"))
    v0 = apply_capture_batch(store, _caps_df(spark, rows), 7)
    replay = apply_capture_batch(store, _caps_df(spark, rows), 7)
    assert v0 == 0 and replay == -1
    assert store.latest_version() == 0  # no duplicate version committed


def test_capture_stream_end_to_end_files(spark, tmp_path):
    """Drive the real readStream/foreachBatch path over parquet files."""
    import datetime as dt

    from louvain_communities_openmp_spark.streaming.capture_stream import (
        SnapshotStore,
        start_capture_stream,
    )

    import glob
    import shutil

    src = tmp_path / "caps"
    src.mkdir()
    t = lambda s: dt.datetime(2025, 1, 1, 0, 0, s)  # noqa: E731
    batches = [
        [("a", 0, t(1)), ("b", 0, t(2))],
        [("a", 1, t(9)), ("c", 0, t(3))],
    ]
    # the file source watches a FLAT dir: write each batch then move
    # its part file up under an ordered name (doc_stream test pattern)
    for i, rows in enumerate(batches):
        d = src / f"f{i}"
        _caps_df(spark, rows).coalesce(1).write.parquet(str(d))
        part = glob.glob(str(d / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{i:04d}.parquet"))
        shutil.rmtree(str(d))
    q = start_capture_stream(spark, str(src), str(tmp_path / "state"))
    q.awaitTermination(120)
    store = SnapshotStore(spark, str(tmp_path / "state"))
    got = {r["url"]: r["capture"] for r in store.load().collect()}
    assert got == {"a": 1, "b": 0, "c": 0}


def test_frontier_shards_politeness_invariants(spark):
    # host-affinity (one worker owns a host), dense per-host fetch_seq
    # starting at 1, eta = (seq-1)*15, and priority non-increasing in
    # fetch order within every host
    import __spark_entry__ as E

    rows = E.queries()["p_frontier_shards"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
        assert r["worker"] == r["host"] % 8
        assert r["eta_s"] == (r["fetch_seq"] - 1) * 15
    for host, hr in by_host.items():
        hr.sort(key=lambda r: r["fetch_seq"])
        assert [r["fetch_seq"] for r in hr] == list(range(1, len(hr) + 1))
        pr = [r["priority"] for r in hr]
        assert all(a >= b for a, b in zip(pr, pr[1:])), host


def test_click_depth_multi_source_cap_and_host_isolation(spark):
    # chain of host-0 pages 0->16->32->48->64->80: root 0, the 4-hop
    # cap keeps depths 0..4 and EXCLUDES page 80 (true depth 5); a
    # cross-host edge (0,1) must not leak host 0's root into host 1
    # (1 stays host 1's root at depth 0, 17 at depth 1)
    from louvain_communities_openmp_spark.operators.bfs import bfs
    from louvain_communities_openmp_spark.operators.transforms import vertices
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(0, 16), (16, 32), (32, 48), (48, 64), (64, 80), (0, 1), (1, 17)],
        "src long, dst long",
    ).withColumn("w", F.lit(1.0))
    intra = e.where((F.col("src") % 16) == (F.col("dst") % 16))
    roots = (
        vertices(e)
        .groupBy((F.col("id") % 16).alias("host"))
        .agg(F.min("id").alias("id"))
        .select("id")
    )
    got = {
        r["id"]: r["dist"]
        for r in bfs(intra, roots, max_iter=4).distances.collect()
    }
    assert got == {0: 0, 16: 1, 32: 2, 48: 3, 64: 4, 1: 0, 17: 1}


def test_absorb_first_hit_counts_hand_computed(spark):
    # targets = {0, 64}; line 1 ->(w2) 0 gives f1(1)=2; 2 -> 1 -> 0
    # gives f2(2)=2 (first-hit at step 2 via 1); 0 -> 2 back-edge must
    # NOT count (walks out of a target are dead: f(0) stays 0 after
    # t=0); 3 -> 0 and 3 -> 64 both absorb at step 1 (f1(3)=1+1)
    from louvain_communities_openmp_spark.operators.centrality import (
        absorb_fixed,
    )

    e = spark.createDataFrame(
        [
            (1, 0, 2.0),
            (2, 1, 1.0),
            (0, 2, 5.0),
            (3, 0, 1.0),
            (3, 64, 1.0),
        ],
        "src long, dst long, w double",
    )
    got = {r["id"]: r["absorb4"] for r in absorb_fixed(e, iters=4).collect()}
    assert got == {0: 1, 64: 1, 1: 2, 2: 2, 3: 2}


def test_sq_topk_codes_bounded_and_exact_twin_ranks_first(spark):
    # an exact duplicate vector must be the rank-1 SQ neighbor with
    # integer distance 0; all codes live in [0, 15]
    from louvain_communities_openmp_spark.operators.similarity import (
        sq_codes,
        sq_topk,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.orderBy("vec_id").limit(1).select(
        F.lit(999_999).cast("long").alias("vec_id"),
        "embedding",
        "label",
    )
    aug = emb.unionByName(first)
    c = sq_codes(aug)
    bad = c.select(
        F.exists("code", lambda v: (v < 0) | (v > 15)).alias("b")
    ).where("b").count()
    assert bad == 0
    top = sq_topk(aug, n_queries=1, k=3).collect()
    assert top[0]["neighbor_id"] == 999_999 and top[0]["sqdist"] == 0


def test_link_exchange_requires_both_directions(spark):
    from louvain_communities_openmp_spark.operators.webstructure import (
        link_exchange,
    )
    from pyspark.sql import functions as F

    # h0 <-> h1 reciprocal (one page edge each way); h0 -> h2 one-way
    e = spark.createDataFrame(
        [(0, 65), (65, 64), (0, 66)], "src long, dst long"
    ).withColumn("w", F.lit(1.0))
    rows = link_exchange(e, n_hosts=64).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["fwd_edges"], r["bwd_edges"], r["exchange_min"]) == (
        0, 1, 1, 1, 1
    )


def test_containment_is_asymmetric(spark):
    from louvain_communities_openmp_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    # a's single 5-gram appears verbatim in b => C(a in b) = 1.0;
    # C(b in a) = 1/6 < 0.6 is NOT emitted
    docs = spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    rows = ngram_containment_pairs(docs, k=5, threshold=0.6).collect()
    assert [(r["a"], r["b"], r["containment"]) for r in rows] == [(1, 2, 1.0)]


def test_widest_path_max_min_hand_computed(spark):
    # 0 ->5 1 ->3 2 ->9 3 and 0 ->2 2: widest(0,2) = max(min(5,3),2)=3,
    # widest(0,3) = min(5,3,9) = 3; first hop widest(0,1) = 5
    from louvain_communities_openmp_spark.operators.sssp import widest_fixed

    e = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 3.0), (2, 3, 9.0), (0, 2, 2.0)],
        "src long, dst long, w double",
    )
    got = {
        (r["s"], r["id"]): r["wide"]
        for r in widest_fixed(e, n_sources=1, rounds=4).dists.collect()
    }
    assert got == {(0, 1): 5, (0, 2): 3, (0, 3): 3}


def test_mutual_triangles_require_all_six_arcs(spark):
    from louvain_communities_openmp_spark.operators.triangles import (
        mutual_triangle_total,
    )
    from pyspark.sql import functions as F

    # triangle {1,2,3} fully reciprocal (6 arcs) counts; triangle
    # {4,5,6} is a one-way cycle (3 arcs) and must NOT count
    arcs = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),
            (4, 5), (5, 6), (6, 4)]
    e = spark.createDataFrame(arcs, "src long, dst long").withColumn(
        "w", F.lit(1.0)
    )
    assert mutual_triangle_total(e) == 1
