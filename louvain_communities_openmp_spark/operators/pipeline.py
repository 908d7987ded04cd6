"""End-to-end corpus cleaning: the composite filter chain a
training-data pipeline runs before tokenization.

clean_corpus = quality gates + language filter + exact dedup, fused so
the plan is ONE whole-stage-codegen scan (token/alpha/lang features are
pure Catalyst expressions from functions.text — no Python in the row
path) followed by ONE shuffle (window over md5(text), a uniform
64-bit-entropy key, so no skew) that both deduplicates and picks the
deterministic canonical (min doc_id) per content group.

Order matters at scale: the cheap map-side gates run BEFORE the dedup
shuffle, so only surviving rows are exchanged — on a 100 TB corpus
with a typical 40-60% filter rate that halves the shuffle volume
versus dedup-first. Consequence (documented semantics): the canonical
representative is the min doc_id among *survivors*, not among all
duplicates — a group whose lowest-id copy fails a quality gate is
represented by its lowest-id passing copy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_features, tokens


def gated_features(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_alpha_ratio: float = 0.0,
    langs: Sequence[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gated, language-filtered documents with their feature
    columns (doc_id, text_hash, lang_pred, n_tokens, n_chars,
    alpha_ratio) — the map-side half of clean_corpus, shared with the
    streaming ingest path (streaming/doc_stream.py). Pure Catalyst
    expressions; works on batch and streaming frames alike."""
    n_chars, n_tokens, _mean, alpha, _stop = quality_features(F.col(text_col))
    feats = docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("text_hash"),
        lang_id(F.col(text_col)).alias("lang_pred"),
        n_tokens,
        n_chars,
        alpha,
    )
    gated = feats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
    )
    if langs is not None:
        gated = gated.where(F.col("lang_pred").isin(list(langs)))
    return gated


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_alpha_ratio: float = 0.0,
    langs: Sequence[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Kept documents after quality gates, language filter, and exact
    dedup. Returns (doc_id, lang_pred, n_tokens, n_chars, alpha_ratio).

    All feature expressions are the same oracled Catalyst columns the
    standalone d_quality / d_lang_id queries use, so every gate is
    cross-engine verifiable; alpha_ratio is rounded to 6 decimals
    BEFORE the threshold compare to keep the boundary engine-portable.
    """
    gated = gated_features(
        docs, min_tokens, max_tokens, min_alpha_ratio, langs, text_col, id_col
    )
    w = Window.partitionBy("text_hash").orderBy(F.col(id_col).asc())
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, "lang_pred", "n_tokens", "n_chars", "alpha_ratio")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the pre-tokenizer sharding step of a training pipeline.

    Window i starts at token 1 + i*stride (stride = chunk_tokens -
    overlap) and takes `chunk_tokens` tokens; the final window may be
    shorter (slice clamps at the document end). Documents with zero
    tokens yield no chunks. Returns
    (doc_id, chunk_id, n_chunk_tokens, chunk_text).

    Scale shape: one whole-stage-codegen scan — tokenize, enumerate
    window starts with sequence(), slice per start, posexplode. No
    shuffle, no Python in the row path; output rows inherit the input
    partitioning, so a downstream writer sees the same file-level
    parallelism as the scan.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    t = tokens(F.col(text_col))
    n = F.size(t)
    chunks = F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n, F.lit(stride)),
            lambda s: F.array_join(F.slice(t, s, chunk_tokens), " "),
        )
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias(
            "n_chunk_tokens"
        ),
        "chunk_text",
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: the k most frequent tokens with counts,
    ties broken lexicographically (deterministic). Returns
    (token, freq) — the standard corpus-stats table built before
    tokenizer training / stopword derivation.

    Scale shape: explode → groupBy(token).count() is one shuffle with
    full map-side combine; hot tokens (stopwords) are NOT a skew
    problem because partial aggregation collapses each map partition
    to one row per token before the exchange. The final top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge of k
    rows), never a full sort.
    """
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


def ngram_freq_topk(
    docs: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-k word n-grams with counts, ties broken lexicographically.
    Returns (ngram, freq) — the phrase-statistics companion of
    vocab_topk (n=1 reduces to it). Same scale shape: codegen n-gram
    enumeration (sequence + slice, no Python), one map-side-combined
    shuffle, TakeOrderedAndProject top-k."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    grams = F.when(n_tok < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_tok - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )
    )
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


def tfidf_topk_per_doc(
    docs: DataFrame,
    k_per_doc: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the keyword-extraction /
    feature-selection primitive of a corpus pipeline. Returns
    (doc_id, token, tf, tfidf) where tf is the in-document count,
    idf = ln(N / df) with N = documents containing >=1 token and
    df = documents containing the token, and tfidf = round(tf*idf, 6).

    Ranking is on the ROUNDED score (desc) then token (asc) so the
    per-doc cut is engine-portable: the unrounded double is
    order-of-evaluation sensitive in the last ulp, the rounded key is
    not, and the lexicographic tiebreak settles equal-score terms.

    Scale shape: one explode + (doc, token) map-side-combined count
    shuffle; df is a token-keyed aggregate of that table (second
    shuffle, token-cardinality-sized); N is a scalar. The idf join is
    token-keyed — vocabulary-sized, NOT corpus-sized — and the per-doc
    top-k is a doc-partitioned window over <= distinct-terms-per-doc
    rows. No Python, no all-pairs anything.
    """
    tf = (
        docs.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    tf = tf.persist()
    n_docs = tf.select(id_col).distinct().count()
    df_t = tf.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    scored = tf.join(df_t, "token").select(
        id_col,
        "token",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    # tf stays persisted: the RETURNED plan reads it twice (tf rows +
    # the df aggregate) — unpersisting here, before the caller's
    # action, would force both reads to recompute the explode. The
    # cache is (doc, distinct-token)-sized and is reclaimed by Spark's
    # context cleaner once the frame is unreachable.
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k_per_doc)
        .select(id_col, "token", "tf", "tfidf")
    )


def unigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-likelihood under the corpus's own
    maximum-likelihood unigram model — the cheapest LM-based quality
    signal (low score = token distribution unlike the corpus; the
    classic perplexity-filter stand-in when no external LM is
    available). Returns (doc_id, n_tokens, avg_logp) with
    logp(tok) = ln(corpus_count(tok) / corpus_total) and
    avg_logp = round(mean over the document's token STREAM, 6)
    (repeats weighted by occurrence). Empty documents are kept with
    n_tokens = 0 and avg_logp NULL.

    Scale shape: the (doc, token) tf table feeds both sides — the
    unigram model is a token-keyed aggregate (vocabulary-sized), and
    the scoring join is tf-table x vocabulary on the token key, never
    corpus-text x anything. One extra doc-keyed sum finishes.
    """
    tf = (
        docs.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    total = tf.agg(F.sum("tf")).first()[0] or 0
    uni = tf.groupBy("token").agg(F.sum("tf").alias("ctok"))
    per_doc = (
        tf.join(uni, "token")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("ctok") / F.lit(float(total)))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_logp"),
        )
    )
    # tf stays persisted for the same reason as tfidf_topk_per_doc:
    # the returned plan reads it twice (scoring join + unigram model)
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        "avg_logp",
    )


def chunk_dedup(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    min_dup_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document chunk-level dedup — the C4/RefinedWeb-style
    boilerplate pass at chunk granularity: a chunk is BOILERPLATE when
    its exact text occurs in >= ``min_dup_docs`` DISTINCT documents;
    boilerplate chunks are dropped everywhere EXCEPT their canonical
    occurrence (lexicographically smallest (doc_id, chunk_id)), so
    exactly one copy of every repeated span survives. Returns the
    per-document summary (doc_id, n_chunks, n_kept, n_dropped);
    documents with no tokens report (0, 0, 0).

    Scale shape: chunking is the zero-shuffle codegen scan of
    chunk_documents; the dup test is ONE shuffle keyed on the chunk
    text hash (md5 — uniform, no skew) computing per-group distinct-doc
    count + min occurrence with map-side combine; the verdict join is
    hash-keyed. Nothing is corpus-quadratic.
    """
    ch = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=overlap,
        text_col=text_col, id_col=id_col,
    ).withColumn("h", F.md5("chunk_text"))
    grp = ch.groupBy("h").agg(
        F.countDistinct(id_col).alias("ndocs"),
        F.min(F.struct(id_col, "chunk_id")).alias("canon"),
    )
    flagged = ch.join(grp, "h").select(
        id_col,
        "chunk_id",
        (
            (F.col("ndocs") >= min_dup_docs)
            & ~(
                (F.col(f"canon.{id_col}") == F.col(id_col))
                & (F.col("canon.chunk_id") == F.col("chunk_id"))
            )
        ).alias("dropped"),
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("dropped"), 0).otherwise(1)).alias("n_kept"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("n_dropped"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
    )


def repetition_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition gates: the fraction of a document's
    token stream consumed by its single most frequent word and by its
    most frequent word bigram — high values mark template/spam pages
    that length and stopword gates miss (Rae et al. 2021's
    "repetition" filters, the word/bigram members). Returns
    (doc_id, n_tokens, top_word_frac, top_bigram_frac), fractions
    rounded to 6; top_bigram_frac is NULL when n_tokens < 2, both
    NULL when the document has no tokens.

    Scale shape: two explode + (doc, gram) map-side-combined counts,
    each followed by a doc-keyed max — all JVM-side, no windows over
    the raw token stream, no Python.
    """
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    base = docs.select(F.col(id_col), t.alias("t"), n_tok.alias("n"))
    words = (
        base.select(id_col, "n", F.explode("t").alias("w"))
        .groupBy(id_col, "n", "w")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col, "n")
        .agg(F.max("c").alias("topw"))
    )
    bigrams_arr = F.when(
        F.col("n") < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.col("n") - 1),
            lambda i: F.array_join(F.slice("t", i, 2), " "),
        )
    )
    bigrams = (
        base.select(id_col, "n", F.explode(bigrams_arr).alias("g"))
        .groupBy(id_col, "n", "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("topg"))
    )
    return (
        base.select(id_col, "n")
        .join(words.select(id_col, "topw"), id_col, "left")
        .join(bigrams, id_col, "left")
        .select(
            id_col,
            F.col("n").cast("long").alias("n_tokens"),
            F.round(F.col("topw") / F.col("n"), 6).alias("top_word_frac"),
            F.round(F.col("topg") / (F.col("n") - 1), 6).alias(
                "top_bigram_frac"
            ),
        )
    )


def corpus_profile(
    docs: DataFrame,
    group_col: str = "source",
    exact: bool = True,
) -> DataFrame:
    """Per-group corpus profile: document count, distinct-content
    count, and n_chars percentiles — the dataset-card statistics table.

    ``exact=True`` (default; oracle-checkable) uses exact distinct and
    exact interpolated percentiles. ``exact=False`` is the 100 TB
    path: HyperLogLog distinct (approx_count_distinct) and t-digest
    percentiles (percentile_approx) — one pass, bounded memory, no
    exact-distinct shuffle of the hash column; pytest pins its error
    against the exact twin (rel. error < 5% at HLL's default 0.05 rsd).
    """
    if exact:
        distinct = F.countDistinct(F.md5("text")).alias("n_distinct")
        p50 = F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias(
            "p50_chars"
        )
        p95 = F.round(F.percentile("n_chars", F.lit(0.95)), 6).alias(
            "p95_chars"
        )
    else:
        distinct = F.approx_count_distinct(F.md5("text")).alias("n_distinct")
        p50 = F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).cast(
            "double"
        ).alias("p50_chars")
        p95 = F.percentile_approx("n_chars", F.lit(0.95), F.lit(10000)).cast(
            "double"
        ).alias("p95_chars")
    return (
        docs.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count("*").alias("n_docs"),
            distinct,
            F.sum("n_chars").alias("total_chars"),
            p50,
            p95,
        )
        .select(
            "grp",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("total_chars").cast("long").alias("total_chars"),
            "p50_chars",
            "p95_chars",
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    term set — the retrieval-scoring primitive of a web corpus (and
    the ranking half of a RAG data pipeline). Returns one row per
    document matching ≥1 query term: (doc_id, n_terms_matched, bm25)
    with bm25 = Σ_{t ∈ Q ∩ doc} idf(t)·tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln(1 + (N − df + 0.5) /
    (df + 0.5)) (the Robertson–Spärck Jones smoothed form), rounded
    to 6. No float-ordered top-k cut: the row SET is the exact set of
    matching docs, engine-portable by construction.

    Cross-engine float contract: N, df, tf, dl are exact integers;
    avgdl is one division of two exact integers; each per-term score
    is the same scalar expression tree on both engines; only the ≤|Q|
    per-doc term-sum is order-sensitive (the aa_score discipline).

    Scale shape: one explode filtered to the |Q| query terms BEFORE
    the (doc, term) count shuffle — the exchanged volume is matches
    only, not the corpus token stream; df/avgdl/N are scalar-or-|Q|-
    sized aggregates broadcast into the scoring join; dl comes from a
    pure-Catalyst token_count column, no second explode.
    """
    terms = sorted(set(query_terms))
    base = docs.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("toks"),
    ).where(F.size("toks") > 0)
    base = base.persist()
    stats = base.agg(
        F.count("*").alias("n"), F.sum(F.size("toks")).alias("total_len")
    ).first()
    n_docs, avgdl = stats["n"], stats["total_len"] / float(stats["n"])
    tf = (
        base.select(
            id_col,
            F.size("toks").alias("dl"),
            F.explode("toks").alias("token"),
        )
        .where(F.col("token").isin(terms))
        .groupBy(id_col, "token", "dl")
        .agg(F.count("*").alias("tf"))
        # eager checkpoint: materializes the matched-rows aggregate (the
        # one consumer of ``base``) so base can be unpersisted before
        # returning — sibling operators (katz_fixed, mis_rounds) already
        # follow this no-leaked-cache discipline; repeated bench/driver
        # invocations previously accumulated doc-sized cached frames
        .localCheckpoint(eager=True)
    )
    df_t = tf.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    per_term = tf.join(F.broadcast(df_t), "token").select(
        id_col,
        (
            idf
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.lit(avgdl)
                )
            )
        ).alias("score"),
    )
    out = per_term.groupBy(id_col).agg(
        F.count("*").alias("n_terms_matched"),
        F.round(F.sum("score"), 6).alias("bm25"),
    )
    # tf is checkpointed above (the only reader of base), so the
    # doc-sized cache can be released immediately instead of waiting
    # for the context cleaner
    base.unpersist()
    return out
