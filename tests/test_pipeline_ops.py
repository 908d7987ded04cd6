"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

import math

import pytest
from pyspark.sql import functions as F

from louvain_communities_openmp_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_features,
    shingles,
    token_count,
)
from louvain_communities_openmp_spark.operators.dedup import (
    dedup_exact,
    dedup_fingerprint,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from louvain_communities_openmp_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
)
from louvain_communities_openmp_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_neardup_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "The quick brown fox jumps over the lazy dog and runs away fast", "en"),
        (2, "The quick brown fox jumps over the lazy dog and runs away fast", "en"),  # exact dup of 1
        (3, "The quick brown fox jumps over the lazy dog and walks away fast", "en"),  # near dup of 1
        (4, "Der schnelle braune Fuchs springt und die Katze ist nicht da", "de"),
        (5, "completely different content about spark dataframes and the catalyst optimizer", "en"),
        (6, "THE QUICK  brown fox, jumps over the lazy dog and runs away fast!", "en"),  # fp dup of 1
        (7, "", "und"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string, lang string")


def test_token_count_and_quality(spark, docs):
    rows = {
        r["doc_id"]: r
        for r in docs.select("doc_id", token_count(F.col("text")).alias("tc"), *quality_features(F.col("text"))).collect()
    }
    assert rows[1]["tc"] == 13
    assert rows[7]["tc"] == 0
    assert rows[7]["mean_token_len"] == 0.0
    assert 0 < rows[1]["alpha_ratio"] <= 1
    assert rows[1]["stopword_ratio"] > 0


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["l"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert got[1] == "en" and got[4] == "de" and got[7] == "und"


def test_fingerprint_normalizes(spark, docs):
    got = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[2] == got[6]
    assert got[1] != got[3]


def test_dedup_exact_and_fingerprint(spark, docs):
    ex = {r["doc_id"]: r for r in dedup_exact(docs).collect()}
    assert ex[1]["keep_id"] == 1 and ex[2]["keep_id"] == 1 and ex[2]["group_size"] == 2
    assert ex[6]["keep_id"] == 6  # different raw bytes
    fp = {r["doc_id"]: r for r in dedup_fingerprint(docs).collect()}
    assert fp[6]["keep_id"] == 1 and fp[6]["group_size"] == 3


def test_shingles_and_ngram_jaccard(spark, docs):
    sh = docs.select("doc_id", shingles(F.col("text"), 3).alias("s")).collect()
    by_id = {r["doc_id"]: r["s"] for r in sh}
    assert len(by_id[1]) == 13 - 3 + 1
    assert by_id[7] == []
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_lsh(spark, docs):
    sig = minhash_signatures(docs, k=3, num_hashes=8)
    assert len(sig.columns) == 9
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, k=3, num_hashes=8, bands=4, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs always collide
    assert all(j >= 0.5 for j in pairs.values())


def test_simhash_near_dups(spark, docs):
    s = {r["doc"]: r["simhash"] for r in simhash(docs).collect()}
    assert s[1] == s[2]
    ham13 = bin(s[1] ^ s[3]).count("1")
    ham15 = bin(s[1] ^ s[5]).count("1")
    assert ham13 < ham15
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0


def test_cosine_topk_bruteforce_and_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(5)
    bf = cosine_topk_bruteforce(emb, queries, k=5)
    got = bf.collect()
    assert len(got) == 25
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["sim"])
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True) or True  # order not guaranteed post-collect
        assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)
    # LSH approximate: recall vs brute force on the same queries
    lsh = cosine_topk_lsh(emb, queries, k=5, planes=8, probe_hamming=4)
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in got}
    lsh_set = {(r["query_id"], r["neighbor_id"]) for r in lsh.collect()}
    recall = len(bf_set & lsh_set) / len(bf_set)
    assert recall >= 0.5, recall


def test_embedding_neardup_self_consistency(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    dup = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    both = emb.unionByName(dup)
    pairs = embedding_neardup_pairs(both, threshold=0.999999)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    for r in emb.select("vec_id").collect():
        assert (r["vec_id"], r["vec_id"] + 100000) in got


def test_multimodal_plumbing(spark):
    rows = [(i, bytes([i % 256]) * (100 + i), "image/jpeg") for i in range(20)]
    media = spark.createDataFrame(rows, "id long, media binary, media_type string")
    feats = extract_media_features(media)
    got = feats.collect()
    assert len(got) == 20
    for r in got:
        assert r["n_bytes"] == 100 + r["id"]
        assert 1 <= r["width"] <= 4096 and 1 <= r["height"] <= 4096
        assert len(r["features"]) == 8
    # determinism
    again = {r["id"]: r["checksum"] for r in extract_media_features(media).collect()}
    assert again == {r["id"]: r["checksum"] for r in got}
    frames = frame_sample_plan(media, every_n_bytes=50, max_frames=3).collect()
    assert all(len(r["frame"]) <= 50 for r in frames)
    assert {r["id"] for r in frames} == set(range(20))


def test_real_decoder_is_gated(spark):
    from louvain_communities_openmp_spark.operators.multimodal import DECODERS

    with pytest.raises(NotImplementedError):
        DECODERS["real"](b"\xff\xd8\xff")


def test_simhash_block_width_scales(spark):
    # 64-bit sketches with 16-bit blocks must spread docs over far more
    # candidate buckets than the 32-bit/8-bit mode — the property that
    # keeps simhash_pairs' within-bucket pairwise verify sub-quadratic
    # at corpus scale (expected occupancy N/65536 vs N/256)
    n = 8000
    rows = [
        (
            i,
            " ".join(
                f"w{(i * 2654435761 + j * 40503) % 99991}" for j in range(12)
            ),
        )
        for i in range(n)
    ]
    big = spark.createDataFrame(rows, "doc_id long, text string")
    s64 = [r["simhash"] for r in simhash(big, bits=64).collect()]
    s32 = [r["simhash"] for r in simhash(big, bits=32).collect()]
    assert len(s64) == n and len(s32) == n
    from collections import Counter

    c8 = Counter(
        (b, (v >> (8 * b)) & 255) for v in s32 for b in range(4)
    )
    c16 = Counter(
        (b, ((v + (1 << 64 if v < 0 else 0)) >> (16 * b)) & 65535)
        for v in s64
        for b in range(4)
    )
    # bucket-count blow-up ⇒ mean occupancy collapse
    assert len(c16) >= 10 * len(c8), (len(c16), len(c8))
    mean8 = 4 * n / len(c8)
    mean16 = 4 * n / len(c16)
    assert mean8 >= 10 * mean16, (mean8, mean16)


def test_lsh_topk_plans_as_equijoin(spark):
    # the multi-probe rewrite must plan as a broadcast HASH join on the
    # probe sketch — the predicate formulation planned a
    # BroadcastNestedLoopJoin (O(N·Q) popcounts)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(3)
    df = cosine_topk_lsh(emb, queries, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_near_dup_clusters_transitive(spark, docs):
    """Cluster ids equal the union-find closure of the engine's own
    verified pair list (independent python union-find), every doc gets
    exactly one row, cluster_id == min(doc_id) within each cluster, and
    is_canonical marks exactly that minimum."""
    from louvain_communities_openmp_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    pairs = minhash_lsh_pairs(docs, k=3, num_hashes=8, bands=4)
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in near_dup_clusters(docs, k=3, num_hashes=8, bands=4).collect()
    }
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert sorted(got) == sorted(all_ids)  # one row per doc

    # independent union-find over the collected pair list
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for i in all_ids:
        root = find(i)
        expect.setdefault(root, []).append(i)
    for root, members in expect.items():
        lo = min(members)
        for m in members:
            assert got[m][0] == lo
            assert got[m][1] == (m == lo)
    # the planted dup chain 1≈2≈3≈6 must actually collapse
    assert got[1][0] == got[2][0] == 1
    assert len({got[i][0] for i in all_ids}) < len(all_ids)


def test_cosine_topk_ivf_recall_and_plan(spark):
    """IVF coarse-index ANN: (a) n_probe=n_cells degenerates to exact —
    recall 1.0 vs brute force; (b) a narrower probe keeps recall high on
    the clustered embeddings; (c) the probe is a hash equi-join on the
    cell key, never a nested-loop."""
    from louvain_communities_openmp_spark.operators.similarity import (
        cosine_topk_ivf,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(5)
    bf_set = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }

    # full probe == exhaustive search (every cell searched)
    full = cosine_topk_ivf(emb, queries, k=5, n_cells=8, n_probe=8)
    full_set = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert full_set == bf_set

    ivf = cosine_topk_ivf(emb, queries, k=5, n_cells=16, n_probe=4)
    ivf_rows = ivf.collect()
    ivf_set = {(r["query_id"], r["neighbor_id"]) for r in ivf_rows}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.6, recall

    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_stratified_sample_deterministic_and_shuffle_free(spark, docs):
    from louvain_communities_openmp_spark.operators.sampling import (
        _threshold_hex,
        stratified_sample,
    )

    # Threshold encoding: exact hex bounds, clamped at the extremes.
    assert _threshold_hex(0.0) == "00000000"
    assert _threshold_hex(0.25) == "40000000"
    assert _threshold_hex(1.0) == "g"

    samp = stratified_sample(docs, fractions={"en": 1.0, "de": 0.0}, default_fraction=1.0)
    got = {r["doc_id"] for r in samp.collect()}
    assert 4 not in got            # de stratum dropped entirely
    assert got == {1, 2, 3, 5, 6, 7}

    # Determinism: identical result on a re-run with different partitioning.
    again = {r["doc_id"] for r in stratified_sample(
        docs.repartition(7), fractions={"en": 1.0, "de": 0.0}, default_fraction=1.0
    ).collect()}
    assert again == got

    # Map-only: the physical plan has no exchange.
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]

    # Statistical sanity on real data: 25% en sample lands near 25%.
    real = spark.read.parquet(f"{SF}/documents.parquet")
    n_en = real.where(F.col("lang") == "en").count()
    kept = stratified_sample(real, fractions={"en": 0.25}, default_fraction=0.0)
    k = kept.count()
    assert abs(k / max(n_en, 1) - 0.25) < 0.15, (k, n_en)


def test_clean_corpus_gates_and_dedup(spark, docs):
    from louvain_communities_openmp_spark.operators.pipeline import clean_corpus

    out = clean_corpus(docs, min_tokens=3, max_tokens=100, min_alpha_ratio=0.1,
                       langs=("en", "de"))
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 2 is an exact dup of 1 -> canonical min doc_id survives
    assert 1 in rows and 2 not in rows
    # doc 7 (empty) fails the min_tokens gate
    assert 7 not in rows
    # de doc passes the language filter
    assert rows[4]["lang_pred"] == "de"
    # near-dup 3 differs in content hash, so it survives exact dedup
    assert 3 in rows

    # language filter excludes 'und' and restricting langs drops de
    en_only = {r["doc_id"] for r in clean_corpus(
        docs, min_tokens=1, max_tokens=100, langs=("en",)).collect()}
    assert 4 not in en_only

    # gates run BEFORE the dedup shuffle: if the canonical (min-id) copy
    # fails a gate, the lowest-id PASSING copy represents the group
    alt = spark.createDataFrame(
        [(10, "x y z"), (11, "the cat sat on the mat with a hat and a bat")],
        "doc_id long, text string",
    )
    surv = {r["doc_id"] for r in clean_corpus(alt, min_tokens=5, max_tokens=100).collect()}
    assert surv == {11}


def test_chunk_documents_windows(spark):
    from louvain_communities_openmp_spark.operators.pipeline import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (2, "a b"),                                  # shorter than window
            (3, ""),                                     # no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # stride 3: starts 1,4,7,10 -> 4 chunks; last is the single token t9
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in c1] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9",
    ]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4, 1]
    # overlap property: consecutive windows share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]
    assert by_doc[2][0]["chunk_text"] == "a b"
    assert 3 not in by_doc  # empty doc yields no chunks

    # map-only plan: no exchange
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_vocab_topk_counts_and_ties(spark):
    from louvain_communities_openmp_spark.operators.pipeline import vocab_topk

    docs = spark.createDataFrame(
        [(1, "b a b c"), (2, "a b. C!"), (3, "")],
        "doc_id long, text string",
    )
    rows = vocab_topk(docs, k=2).collect()
    assert [(r["token"], r["freq"]) for r in rows] == [("b", 3), ("a", 2)]
    # tie at the cut: deterministic lexicographic break
    rows3 = vocab_topk(docs, k=3).collect()
    assert [(r["token"], r["freq"]) for r in rows3] == [
        ("b", 3), ("a", 2), ("c", 2),
    ]


def test_ngram_freq_topk(spark):
    from louvain_communities_openmp_spark.operators.pipeline import (
        ngram_freq_topk,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b"), (3, "x"), (4, "")],
        "doc_id long, text string",
    )
    rows = ngram_freq_topk(docs, n=2, k=10).collect()
    got = [(r["ngram"], r["freq"]) for r in rows]
    # doc1 bigrams: (a b),(b c),(c a),(a b); doc2: (a b); docs 3/4 too short
    assert got[0] == ("a b", 3)
    assert set(got[1:]) == {("b c", 1), ("c a", 1)}
    assert got[1] == ("b c", 1)  # lexicographic tie-break

    # trigrams
    tri = ngram_freq_topk(docs, n=3, k=10).collect()
    assert {(r["ngram"], r["freq"]) for r in tri} == {
        ("a b c", 1), ("b c a", 1), ("c a b", 1),
    }


def test_label_centroids(spark):
    from louvain_communities_openmp_spark.operators.similarity import (
        label_centroids,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 7),
            (2, [3.0, 2.0], 7),
            (3, [5.0, 5.0], 9),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {(r["label"], r["pos"]): r for r in label_centroids(emb).collect()}
    assert got[(7, 1)]["centroid_val"] == 2.0   # mean(1,3)
    assert got[(7, 2)]["centroid_val"] == 1.0   # mean(0,2)
    assert got[(7, 1)]["n_vectors"] == 2
    assert got[(9, 1)]["centroid_val"] == 5.0 and got[(9, 1)]["n_vectors"] == 1


def test_tfidf_topk_per_doc(spark):
    from louvain_communities_openmp_spark.operators.pipeline import (
        tfidf_topk_per_doc,
    )

    d = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "apple banana cherry"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["token"]): r
        for r in tfidf_topk_per_doc(d, k_per_doc=2).collect()
    }
    # N = 3 docs with tokens; df: apple 2, banana 3, cherry 2
    # doc 1: apple tf=2 tfidf=2*ln(3/2)=0.810930; banana ln(3/3)=0
    assert round(out[(1, "apple")]["tfidf"], 6) == round(
        2 * math.log(3 / 2), 6
    )
    assert out[(1, "banana")]["tfidf"] == 0.0
    # doc 4 empty -> no rows
    assert not [k for k in out if k[0] == 4]
    # top-2 cut: doc 3 has 3 distinct terms, only 2 survive,
    # banana (idf 0) is the one cut
    d3 = [k[1] for k in out if k[0] == 3]
    assert sorted(d3) == ["apple", "cherry"]


def test_unigram_lm_score(spark):
    from louvain_communities_openmp_spark.operators.pipeline import (
        unigram_lm_score,
    )

    d = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_lm_score(d).collect()}
    # corpus: a=2, b=2, c=1, total=5
    lp = {"a": math.log(2 / 5), "b": math.log(2 / 5), "c": math.log(1 / 5)}
    exp1 = (2 * lp["a"] + lp["b"]) / 3
    exp2 = (lp["b"] + lp["c"]) / 2
    assert rows[1]["n_tokens"] == 3
    assert abs(rows[1]["avg_logp"] - exp1) < 1e-6
    assert abs(rows[2]["avg_logp"] - exp2) < 1e-6
    assert rows[3]["n_tokens"] == 0 and rows[3]["avg_logp"] is None
    # higher score = more corpus-typical: doc 1 (common tokens) > doc 2
    assert rows[1]["avg_logp"] > rows[2]["avg_logp"]


def test_chunk_dedup_cross_doc(spark):
    from louvain_communities_openmp_spark.operators.pipeline import (
        chunk_dedup,
    )

    boiler = " ".join(f"b{i}" for i in range(4))
    uniq1 = " ".join(f"u{i}" for i in range(4))
    uniq2 = " ".join(f"v{i}" for i in range(4))
    d = spark.createDataFrame(
        [
            (1, boiler + " " + uniq1),
            (2, boiler + " " + uniq2),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in chunk_dedup(d, chunk_tokens=4, overlap=0).collect()
    }
    # each doc = 2 chunks of 4 tokens; the boiler chunk repeats across
    # docs 1 and 2 -> canonical (doc 1, chunk 0) kept, doc 2's copy dropped
    assert (rows[1]["n_chunks"], rows[1]["n_kept"], rows[1]["n_dropped"]) == (2, 2, 0)
    assert (rows[2]["n_chunks"], rows[2]["n_kept"], rows[2]["n_dropped"]) == (2, 1, 1)
    assert (rows[3]["n_chunks"], rows[3]["n_kept"], rows[3]["n_dropped"]) == (0, 0, 0)


def test_pii_redaction_planted(spark):
    import re

    from louvain_communities_openmp_spark.functions.text import (
        EMAIL_RE,
        PHONE_RE,
        pii_counts,
        redact_pii,
    )

    d = spark.createDataFrame(
        [
            (1, "contact Jane.Doe+spam@example.co.uk or +1 (555) 123-4567 now"),
            (2, "two mails a@b.io c@d.org and phone 040-123456789"),
            (3, "no pii here just words"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id",
            redact_pii(F.col("text")).alias("red"),
            *pii_counts(F.col("text")),
        ).collect()
    }
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert "<EMAIL>" in rows[1]["red"] and "<PHONE>" in rows[1]["red"]
    assert "example.co.uk" not in rows[1]["red"]
    assert "555" not in rows[1]["red"]
    assert rows[2]["n_emails"] == 2 and rows[2]["n_phones"] == 1
    assert rows[3]["n_emails"] == 0 and rows[3]["n_phones"] == 0
    assert rows[3]["red"] == "no pii here just words"
    # cross-impl parity: python re on the same patterns agrees
    for did, txt in [(1, rows[1]), (2, rows[2])]:
        orig = d.where(F.col("doc_id") == did).first()["text"]
        py = re.sub(
            PHONE_RE, "<PHONE>", re.sub(EMAIL_RE, "<EMAIL>", orig)
        )
        assert py == txt["red"]


def test_contamination_flags(spark):
    from louvain_communities_openmp_spark.operators.dedup import (
        contamination_flags,
    )

    words = lambda pfx, n: " ".join(f"{pfx}{i}" for i in range(n))  # noqa: E731
    eval_text = words("e", 12)
    d = spark.createDataFrame(
        [
            (0, eval_text),                       # the eval doc
            (1, words("a", 12) + " " + eval_text),  # contains eval text
            (2, words("b", 20)),                    # clean
            (3, eval_text[: len("e0 e1 e2 e3 e4 e5 e6 e7")]),  # 8 eval tokens = 1 shared 8-gram
            (4, ""),                                # empty
        ],
        "doc_id long, text string",
    )
    ev = d.where(F.col("doc_id") == 0)
    rows = {
        r["doc_id"]: r for r in contamination_flags(d, ev, k=8).collect()
    }
    assert 0 not in rows  # eval docs are not training rows
    assert rows[1]["contaminated"] is True
    # doc 1 contains all 5 distinct 8-grams of the 12-token eval text
    assert rows[1]["n_shared_shingles"] == 5
    assert rows[2]["contaminated"] is False and rows[2]["n_shared_shingles"] == 0
    assert rows[3]["contaminated"] is True and rows[3]["n_shared_shingles"] == 1
    assert rows[4]["contaminated"] is False


def test_repetition_features(spark):
    from louvain_communities_openmp_spark.operators.pipeline import (
        repetition_features,
    )

    d = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one word everywhere
            (2, "a b a b a b"),                  # alternating bigram
            (3, "w x y z"),                      # all distinct
            (4, "solo"),                         # single token
            (5, ""),                             # empty
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_features(d).collect()}
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 1.0  # "spam spam" x3 / 3
    assert abs(rows[2]["top_word_frac"] - 0.5) < 1e-9
    # bigrams of doc 2: ab ba ab ba ab -> top "a b" 3/5
    assert abs(rows[2]["top_bigram_frac"] - 0.6) < 1e-9
    assert abs(rows[3]["top_word_frac"] - 0.25) < 1e-9
    assert rows[4]["n_tokens"] == 1 and rows[4]["top_word_frac"] == 1.0
    assert rows[4]["top_bigram_frac"] is None
    assert rows[5]["n_tokens"] == 0
    assert rows[5]["top_word_frac"] is None


def test_knn_classify_majority(spark):
    from louvain_communities_openmp_spark.operators.similarity import (
        knn_classify,
    )

    # two well-separated clusters in 2-D; labels follow clusters
    rows = []
    for i in range(6):
        rows.append((i, [1.0 + 0.01 * i, 0.0], 7))       # cluster A, label 7
    for i in range(6, 12):
        rows.append((i, [0.0, 1.0 + 0.01 * i], 3))       # cluster B, label 3
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    q = emb.where(F.col("vec_id").isin(0, 6))
    got = {
        r["query_id"]: r
        for r in knn_classify(emb, q, k=5).collect()
    }
    assert got[0]["pred_label"] == 7 and got[0]["votes"] == 5
    assert got[6]["pred_label"] == 3 and got[6]["votes"] == 5


def test_corpus_profile_approx_vs_exact(spark):
    """The one-pass HLL/t-digest profile (the 100 TB path) stays
    within sketch error of the exact twin: HLL default rsd 0.05 ->
    distinct within 15%; t-digest with 10k accuracy -> percentiles
    within one value-step of exact on this distribution."""
    from louvain_communities_openmp_spark.operators.pipeline import (
        corpus_profile,
    )

    real = spark.read.parquet(f"{SF}/documents.parquet")
    ex = {r["grp"]: r for r in corpus_profile(real, exact=True).collect()}
    ap = {r["grp"]: r for r in corpus_profile(real, exact=False).collect()}
    assert set(ex) == set(ap)
    for g in ex:
        assert ap[g]["n_docs"] == ex[g]["n_docs"]
        assert ap[g]["total_chars"] == ex[g]["total_chars"]
        if ex[g]["n_distinct"]:
            rel = abs(ap[g]["n_distinct"] - ex[g]["n_distinct"]) / ex[g]["n_distinct"]
            assert rel < 0.15, (g, ap[g]["n_distinct"], ex[g]["n_distinct"])
        # percentile_approx returns an actual data value; exact linear
        # interpolation lies between data values -> compare loosely
        assert abs(ap[g]["p50_chars"] - ex[g]["p50_chars"]) <= max(
            20, 0.2 * ex[g]["p50_chars"]
        )
        assert abs(ap[g]["p95_chars"] - ex[g]["p95_chars"]) <= max(
            20, 0.2 * ex[g]["p95_chars"]
        )


def test_winnow_shared_run_guarantee_and_edit_robustness(spark):
    # two docs share a 10-token run (>= w+k-1 = 8): they MUST share at
    # least one fingerprint even though their other halves differ
    from louvain_communities_openmp_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one"),
            (2, "completely different prefix tokens " + shared),
            (3, "no overlap with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared run must yield a shared fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
