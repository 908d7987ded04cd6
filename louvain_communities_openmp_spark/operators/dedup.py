"""Deduplication operators for web-scale corpora.

Four families, cheapest→richest; each returns a DataFrame keyed by
doc_id so downstream "keep one representative" is a trivial filter:

- exact:     md5 hash groupBy (one shuffle, map-side combined)
- minhash:   shingle → k minhashes → LSH bands → bucket join →
             candidate pairs verified by exact Jaccard
- ngram:     candidate pairs by shared shingle → exact Jaccard
- simhash:   32-bit sign sketch over token hashes, near-dups by
             small Hamming distance
- embedding: cosine ≥ threshold over vector pairs (see similarity.py)

Scale notes: every candidate-generation join keys on a content hash
(uniformly distributed — no natural skew); repeated-shingle hot keys
(boilerplate) are capped with a per-shingle document-frequency limit
(`max_df`), the standard guard that keeps bucket joins from going
quadratic on boilerplate at 10^12-doc scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalize, tokens


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (doc_id, keep_id, group_size, text_hash).

    keep_id = min doc_id of the group (deterministic representative).
    """
    h = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    g = h.groupBy("text_hash").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("group_size")
    )
    return h.join(g, "text_hash").select(id_col, "keep_id", "group_size", "text_hash")


def dedup_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint dedup (whitespace/punct/case
    insensitive): (doc_id, keep_id, group_size, fp)."""
    h = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    g = h.groupBy("fp").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("group_size")
    )
    return h.join(g, "fp").select(id_col, "keep_id", "group_size", "fp")


def _shingled(docs: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(doc, sh): distinct word k-gram shingles per non-empty document.

    Plan shape matters enormously here: the token array is projected as
    a REAL column before the shingle transform so the per-shingle
    lambda references an attribute, not the tokenization expression —
    inlining tokens(text) into the lambda makes Catalyst re-run the
    regexp chain once per shingle position, turning an O(tokens) doc
    scan into O(tokens × shingles) (measured 50× slower). The non-empty
    filter is likewise applied to the raw text (one cheap predicate
    that pushes to the scan) instead of to size(sh), whose pushdown
    would re-inline the whole shingle expression into the scan filter.

    Equivalent semantics to filtering size(sh) > 0: normalize(text)
    non-empty ⇔ at least one token ⇔ at least one shingle.
    """
    td = docs.where(normalize(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    )
    n = F.size("toks")
    sh = F.when(n < k, F.array(F.array_join("toks", " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice("toks", i, k), " "),
        )
    )
    return td.select("doc", F.array_distinct(sh).alias("sh"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by exact k-gram Jaccard ≥ threshold.

    Candidates = pairs sharing ≥1 shingle (shingles with document
    frequency > max_df are dropped — boilerplate guard). Output:
    (a, b, jaccard) with a < b, jaccard rounded to 6dp.
    """
    s = _shingled(docs, text_col, id_col, k).persist()
    sizes = s.select("doc", F.size("sh").alias("n"))
    ex = s.select("doc", F.explode("sh").alias("g"))
    ex = ex.join(
        ex.groupBy("g").agg(F.count("*").alias("df")).where(F.col("df") <= max_df),
        "g",
    ).select("doc", "g")
    common = (
        ex.alias("x")
        .join(ex.alias("y"), (F.col("x.g") == F.col("y.g")) & (F.col("x.doc") < F.col("y.doc")))
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    # gate on the UNROUNDED ratio with the same -1e-12 epsilon as the
    # DuckDB twin (rounding first would keep borderline pairs the twin
    # drops); round only the projected output column
    j = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    out = (
        common.join(sizes.select(F.col("doc").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("n").alias("nb")), "b")
        .where(j >= threshold - 1e-12)
        .select("a", "b", F.round(j, 6).alias("jaccard"))
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc, mh_0..mh_{n-1}): md5-based 32-bit minhash signature columns
    (8 hex chars each). Engine-portable (md5 + string-min over
    fixed-width lowercase hex == numeric min), fully deterministic.

    Plan: explode shingle POSITIONS (a cheap int sequence), build each
    shingle from the pass-through token-array attribute, then ceil(n/4)
    md5 calls per shingle (one salted 128-bit hash yields four
    independent 32-bit minhash slots) → groupBy(doc) with per-column
    min (map-side combined). Two plan hazards this shape dodges, both
    measured at 30-50× on sf0.1:

    - inlining tokens(text) into the shingle-transform lambda makes
      Catalyst re-run the regexp chain once per shingle position
      (O(tokens × shingles) per doc) — so tokens is projected as a real
      column first;
    - exploding the built shingle ARRAY triggers
      InferFiltersFromGenerate, whose size(sh)>0 predicate pushes to
      the scan and re-inlines the entire shingle expression into the
      filter — exploding a position sequence leaves nothing expensive
      to infer a filter from.

    Duplicate shingles are NOT dropped (min is idempotent), saving the
    array_distinct.
    """
    td = docs.where(normalize(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    )
    n = F.size("toks")
    npos = F.when(n < k, F.lit(1)).otherwise(n - k + 1)
    ex = td.select(
        "doc", "toks", F.explode(F.sequence(F.lit(1), npos)).alias("i")
    )
    g = F.when(F.size("toks") < k, F.array_join("toks", " ")).otherwise(
        F.array_join(F.slice("toks", F.col("i"), k), " ")
    )
    n_salts = (num_hashes + 3) // 4
    hashed = ex.select(
        "doc",
        *[
            F.md5(F.concat(F.lit(f"{j}:"), g)).alias(f"_h{j}")
            for j in range(n_salts)
        ],
    )
    aggs = []
    for i in range(num_hashes):
        j, off = divmod(i, 4)
        aggs.append(
            F.min(F.substring(F.col(f"_h{j}"), off * 8 + 1, 8)).alias(f"mh_{i}")
        )
    return hashed.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band-bucket join for candidates,
    exact Jaccard verification. Output (a, b, jaccard), a < b.

    shingle→minhash→band→bucket-join: bands of rows hashed together;
    two docs collide in ≥1 band ⇒ candidate (standard S-curve).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, k, num_hashes).persist()
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band_{b}"))
    banded = sig.select("doc", *band_cols)
    stacked = banded.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("h"))
                for b in range(bands)
            ])
        ).alias("bh"),
    ).select("doc", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    cand = (
        stacked.alias("x")
        .join(
            stacked.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.h") == F.col("y.h"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .distinct()
    )
    s = _shingled(docs, text_col, id_col, k)
    j = F.size(F.array_intersect("sha", "shb")).cast("double") / F.size(
        F.array_union("sha", "shb")
    )
    verified = (
        cand.join(s.select(F.col("doc").alias("a"), F.col("sh").alias("sha")), "a")
        .join(s.select(F.col("doc").alias("b"), F.col("sh").alias("shb")), "b")
        .where(j >= threshold - 1e-12)
        .select("a", "b", F.round(j, 6).alias("jaccard"))
    )
    return verified


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """SimHash sketch (default 64-bit): per token, hash to `bits` bits
    (md5 prefix); each bit votes ±1 weighted by token frequency; sketch
    bit = sign of the sum. Output (doc, simhash long).

    64-bit default: the pairs join below buckets on sketch blocks, and
    expected bucket size is N / 2^block_bits — at corpus scale
    (10^10+ docs) a 32-bit sketch's 8-bit blocks (N/256 per bucket) go
    quadratic in the within-bucket verify, while 64/16 keeps buckets at
    N/65536. The 64-bit hash is assembled from two md5 32-bit halves
    with exact signed arithmetic (identical expression in the DuckDB
    oracle twin — no shift-semantics dependence), and bit votes read
    the non-negative halves directly.
    """
    if bits not in (32, 64):
        raise ValueError("simhash: bits must be 32 or 64")
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")),
                " ",
            )
        ).alias("t"),
    ).where(F.col("t") != "")
    if bits == 32:
        h = toks.withColumn(
            "h_lo", F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
        ).withColumn("h_hi", F.lit(0).cast("long"))
    else:
        md = F.md5("t")
        h = toks.withColumn(
            "h_hi", F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
        ).withColumn(
            "h_lo", F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
        )
    # bit i of the hash, read from the non-negative 32-bit halves so no
    # engine-specific signed-shift behavior is involved
    def _hbit(i: int):
        col, off = ("h_lo", 0) if i < 32 else ("h_hi", 32)
        return F.shiftright(F.col(col), i - off).bitwiseAND(F.lit(1))

    votes = [
        F.sum(F.when(_hbit(i) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = h.groupBy("doc").agg(*votes)
    sketch = None
    for i in range(bits):
        one = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        # bit 63 carries the sign in two's complement: its weight is
        # -2^63, keeping the sum inside signed-64 range exactly
        weight = -(2**63) if i == 63 else 2**i
        term = one * F.lit(weight).cast("long")
        sketch = term if sketch is None else sketch + term
    return agg.select("doc", sketch.alias("simhash"))


def simhash_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, bits: int = 64) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation by pigeonhole block (distance ≤ 3 ⇒ at least
    one of 4 equal blocks) — block-equality bucket join, then exact
    popcount verify. 64-bit sketches use 4×16-bit blocks: expected
    bucket size N/65536 instead of the 32-bit mode's N/256, which is
    what keeps the within-bucket pairwise verify sub-quadratic at
    10^10+ documents.
    """
    block_bits = 16 if bits == 64 else 8
    mask = (1 << block_bits) - 1
    s = simhash(docs, text_col, id_col, bits=bits).persist()
    # arithmetic shiftright + mask extracts the block exactly even for
    # negative sketches: the low block_bits of floor(x/2^k) match the
    # logical shift's in two's complement
    blocks = s.select(
        "doc",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("blk"),
                    F.shiftright("simhash", b * block_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("v"),
                )
                for b in range(4)
            ])
        ).alias("kb"),
    ).select("doc", "simhash", F.col("kb.blk").alias("blk"), F.col("kb.v").alias("v"))
    cand = (
        blocks.alias("x")
        .join(
            blocks.alias("y"),
            (F.col("x.blk") == F.col("y.blk"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("a"),
            F.col("y.doc").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "a",
        "b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long").alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def near_dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Transitive near-duplicate clustering with a canonical
    representative per cluster — the dedup step an LLM training-data
    pipeline actually runs (pairs alone are not actionable; "keep one
    doc per near-dup cluster" is).

    Pipeline: minhash_lsh_pairs (band-bucket candidates + exact-Jaccard
    verify) → symmetric pair graph → connected components (hash-min +
    pointer jumping, O(log diameter) rounds — near-dup clusters chain:
    A~B~C with A!~C still dedups together) → cluster_id = min doc_id in
    the component; docs in no pair are singleton clusters of
    themselves. Output: (doc_id, cluster_id, is_canonical), exactly one
    row per input doc; filtering is_canonical yields the deduplicated
    corpus.

    Scale shape: the quadratic-risk stage is bounded by the LSH
    band-bucket join (see minhash_lsh_pairs); the component step runs
    only over the near-dup PAIR graph (≪ corpus — only docs with ≥1
    verified near-dup), and the cluster map joins back to the corpus on
    the doc-id key (plain shuffle hash join; AQE broadcasts it when the
    dup share is small).
    """
    from .components import connected_components

    pairs = minhash_lsh_pairs(
        docs, text_col, id_col, k, num_hashes, bands, threshold
    )
    sym = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    comp = connected_components(sym).components
    ids = docs.select(F.col(id_col).alias("doc_id"))
    out = ids.join(
        comp.select(F.col("id").alias("doc_id"), F.col("comp")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster_id"),
        (
            F.coalesce(F.col("comp"), F.col("doc_id")) == F.col("doc_id")
        ).alias("is_canonical"),
    )
    return out


def contamination_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose text
    shares >= ``min_shared`` distinct word ``k``-gram shingles with any
    document in ``eval_docs`` — the standard n-gram-overlap
    contamination check run before training on a corpus that may
    contain eval-set material. Returns one row per TRAINING doc (docs
    whose id is absent from eval_docs): (doc_id, n_shared_shingles,
    contaminated).

    Plan shape: both sides explode to DISTINCT shingle rows; the
    overlap test is one equi-join on the shingle string (uniform
    content key, no skew) against the eval side's distinct-shingle
    set — eval sets are benchmark-sized (10^3-10^6 rows), so Catalyst
    broadcasts that side at scale; the per-doc count is one map-side-
    combined aggregate. Nothing touches training-corpus pairs.
    """
    from ..functions.text import shingles

    eval_ids = eval_docs.select(F.col(id_col)).distinct()
    eval_sh = (
        eval_docs.select(
            F.explode(shingles(F.col(text_col), k=k)).alias("sh")
        )
        .distinct()
    )
    train = docs.join(eval_ids, id_col, "left_anti")
    train_sh = train.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k=k)).alias("sh")
    ).distinct()
    shared = (
        train_sh.join(eval_sh, "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_shingles"))
    )
    return train.select(id_col).join(shared, id_col, "left").select(
        id_col,
        F.coalesce("n_shared_shingles", F.lit(0)).cast("long").alias(
            "n_shared_shingles"
        ),
        (F.coalesce("n_shared_shingles", F.lit(0)) >= min_shared).alias(
            "contaminated"
        ),
    )


def ngram_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.6,
    max_df: int = 1000,
) -> DataFrame:
    """ASYMMETRIC k-gram containment C(a⊆b) = |A∩B| / |A| — the
    quote / subset-document detector Jaccard misses (a short doc fully
    quoted inside a long one has high containment but low Jaccard).
    Candidates come from the same shared-shingle equi-join as
    ngram_jaccard_pairs (df > max_df shingles dropped — boilerplate
    guard; bucketed, not all-pairs), and each unordered candidate pair
    emits up to TWO directed rows: (a, b, containment) means "fraction
    of a's shingles that also appear in b". Gate on the unrounded ratio
    with the twin's -1e-12 epsilon; round only the output column.
    """
    s = _shingled(docs, text_col, id_col, k).persist()
    sizes = s.select("doc", F.size("sh").alias("n"))
    ex = s.select("doc", F.explode("sh").alias("g"))
    ex = ex.join(
        ex.groupBy("g").agg(F.count("*").alias("df")).where(F.col("df") <= max_df),
        "g",
    ).select("doc", "g")
    common = (
        ex.alias("x")
        .join(
            ex.alias("y"),
            (F.col("x.g") == F.col("y.g")) & (F.col("x.doc") != F.col("y.doc")),
        )
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    c = F.col("inter").cast("double") / F.col("na")
    return (
        common.join(sizes.select(F.col("doc").alias("a"), F.col("n").alias("na")), "a")
        .where(c >= threshold - 1e-12)
        .select("a", "b", F.round(c, 6).alias("containment"))
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    POSITIONAL word k-gram (not the distinct set — position matters),
    slide a window of ``w`` consecutive gram hashes, and keep each
    window's minimum hash; the distinct (doc, fp) set is the document's
    fingerprint. Guarantee: any shared run of >= w + k - 1 tokens
    between two documents yields at least one shared fingerprint, while
    storage is ~2/(w+1) of the gram count — the plagiarism/quote
    detector that survives local edits.

    Gram hash = first 15 hex chars of md5 parsed base-16 (60 bits,
    BIGINT-safe, identical in Spark and DuckDB — the salted-md5
    convention of minhash_signatures). Docs with fewer than w grams
    emit the single min over what they have. Plan: the only exchange is
    the per-doc sort for the sliding window (state bounded by one doc's
    gram count) plus the final distinct — both uniform-keyed.
    """
    from pyspark.sql import Window

    td = docs.where(normalize(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    )
    n = F.size("toks")
    grams = F.when(n < k, F.array(F.array_join("toks", " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice("toks", i, k), " "),
        )
    )
    g = td.select("doc", F.posexplode(grams).alias("pos", "g")).select(
        "doc",
        "pos",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    cnt = Window.partitionBy("doc")
    fp = (
        g.select(
            "doc",
            "pos",
            F.min("h").over(win).alias("fp"),
            F.count("*").over(cnt).alias("ng"),
        )
        .where(F.col("pos") <= F.greatest(F.lit(0), F.col("ng") - w))
        .select("doc", "fp")
        .distinct()
    )
    return fp
