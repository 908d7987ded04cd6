"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline. All math in
  DOUBLE with left-to-right accumulation (F.aggregate), so results are
  bit-identical to a sequential oracle over the same vectors.
- LSH (random-hyperplane sign sketch) bucketed variant: the scale
  path — candidates only within matching sketch-prefix buckets, then
  exact cosine re-rank. Hyperplanes are hash-derived (splitmix64), no
  RNG state, fully deterministic and reproducible executor-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns (double math)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(a: Column) -> Column:
    return a.cast(ArrayType(DoubleType()))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (vec_id, embedding) — typically a small frame; it is
    broadcast so the candidate side never shuffles. Output
    (query_id, neighbor_id, sim) with sim rounded to 6dp; ties broken
    by ascending neighbor_id; self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def _plane_coefs(plane: int, dim: int) -> list[float]:
    """Deterministic hyperplane coefficients in [-1, 1): splitmix64 of
    (plane, dimension), computed driver-side once and shipped as a
    literal array (stays inside whole-stage codegen; no per-row
    hashing)."""
    from ..oracle.graphs import _mix64

    return [_mix64(plane * 100_003 + d) / float(2**63) - 1.0 for d in range(dim)]


def lsh_sketch(vec: Column, planes: int, dim: int) -> Column:
    """Random-hyperplane sign sketch (long) for array<double> vectors
    of length `dim`."""
    sketch = None
    for p in range(planes):
        coefs = F.array(*[F.lit(c) for c in _plane_coefs(p, dim)])
        proj = F.aggregate(
            F.zip_with(vec, coefs, lambda v, h: v * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2**p).cast("long")
        sketch = term if sketch is None else sketch + term
    return sketch


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row else 0


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 12,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH sketch within
    `probe_hamming` bits of the query's sketch, re-ranked by exact
    cosine.

    Multi-probe as an EQUI-join: each query row explodes into the
    C(planes,0..probe_hamming) XOR masks of popcount ≤ probe_hamming
    (79 rows at 12 planes / h=2), probe sketch = qsk ^ mask, and the
    candidate side joins on csk = probe sketch. ``csk within hamming h
    of qsk`` ⟺ ``csk = qsk ^ m for exactly one mask m`` (m = csk^qsk
    is unique), so the result set is identical to the predicate form —
    but the plan is a broadcast HASH join, not a nested-loop join. The
    predicate form evaluates Q popcounts per candidate row (O(N·Q) —
    fine at Q=10, quadratic at a production ANN workload with Q ~ N);
    the equi-join is O(N + Q·79) hash lookups and survives large Q.
    """
    from itertools import combinations

    dim = _dim_of(embeddings, vec_col)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("csk", lsh_sketch(F.col("cv"), planes, dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qsk", lsh_sketch(F.col("qv"), planes, dim))
    masks = [0] + [
        sum(1 << b for b in bits)
        for r in range(1, probe_hamming + 1)
        for bits in combinations(range(planes), r)
    ]
    qx = q.withColumn(
        "psk",
        F.explode(
            F.array(*[
                F.col("qsk").bitwiseXOR(F.lit(m).cast("long")) for m in masks
            ])
        ),
    )
    pairs = (
        c.join(F.broadcast(qx), F.col("csk") == F.col("psk"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim ≥ threshold),
    LSH-bucketed: near-identical vectors share the exact sketch."""
    dim = _dim_of(embeddings, vec_col)
    c = embeddings.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("sk", lsh_sketch(F.col("v"), planes, dim)).persist()
    x, y = c.alias("x"), c.alias("y")
    return (
        x.join(y, (F.col("x.sk") == F.col("y.sk")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.round(cosine(F.col("x.v"), F.col("y.v")), 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def ivf_cells(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _cent_vecs: list | None = None,
) -> DataFrame:
    """The IVF cell-assignment pass of cosine_topk_ivf, exposed on its
    own for index diagnostics: (vec_id, cv, cell) with cell = 1-based
    argmax-cosine centroid id, lowest-cell tie-break — identical
    expressions to the search path, so balance numbers describe the
    real index. Centroids ship as broadcast literals inside
    whole-stage codegen (no Python in the scan)."""
    if _cent_vecs is None:
        cents = (
            embeddings.orderBy(id_col)
            .limit(n_cells)
            .select(as_double(F.col(vec_col)).alias("cv"))
            .collect()
        )
        _cent_vecs = [r["cv"] for r in cents]

    def sims_arr(vec: Column) -> Column:
        return F.array(*[
            cosine(vec, F.array(*[F.lit(float(x)) for x in cv]))
            for cv in _cent_vecs
        ])

    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("sims", sims_arr(F.col("cv")))
        .withColumn(
            "cell",
            F.array_position(F.col("sims"), F.array_max("sims")).cast("long"),
        )
        .drop("sims")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse index: every
    vector is assigned to its nearest centroid cell; a query searches
    only its `n_probe` nearest cells with an exact cosine re-rank.

    Centroid choice is deterministic — the `n_cells` lowest-id vectors
    serve as coarse anchors (a production deployment would k-means
    them; the IVF *plan shape* is identical either way and is what
    matters at scale): the inverted index is one cell-assignment pass
    over the corpus (centroids ship as broadcast literals inside
    whole-stage codegen — no Python in the scan), the probe is a
    cell-key EQUI-join against the tiny exploded (query, cell) frame,
    and the re-rank touches ~n_probe/n_cells of the corpus instead of
    all of it. Assignment tie-break: first-max = lowest cell id, via
    array_position(arr, array_max(arr)).

    Output (query_id, neighbor_id, sim), identical contract to
    cosine_topk_lsh / cosine_topk_bruteforce.
    """
    from pyspark.sql import Window

    dim = _dim_of(embeddings, vec_col)
    cents = (
        embeddings.orderBy(id_col)
        .limit(n_cells)
        .select(as_double(F.col(vec_col)).alias("cv"))
        .collect()
    )
    cent_vecs = [r["cv"] for r in cents]

    def sims_arr(vec: Column) -> Column:
        # cosine vs every centroid, sequential left-to-right double
        # accumulation (F.aggregate) — the same expression the DuckDB
        # twin inlines, so the argmax assignment is engine-portable
        return F.array(*[
            cosine(vec, F.array(*[F.lit(float(x)) for x in cv]))
            for cv in cent_vecs
        ])

    c = ivf_cells(
        embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        _cent_vecs=cent_vecs,
    ).withColumnRenamed("vec_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn(
        "qs",
        F.explode(
            F.arrays_zip(
                sims_arr(F.col("qv")).alias("cs"),
                F.sequence(F.lit(1), F.lit(len(cent_vecs))).alias("cell"),
            )
        ),
    ).select(
        "query_id",
        "qv",
        F.col("qs.cs").alias("cs"),
        F.col("qs.cell").cast("long").alias("cell"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("cell"))
    probes = (
        q.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    pairs = (
        c.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def label_centroids(emb: DataFrame, round_to: int = 6) -> DataFrame:
    """Per-label embedding centroids as LONG-FORM rows
    (label, pos, centroid_val) with pos 1-based — the IVF coarse-index
    training step exposed as a first-class query (and the shape a
    cross-engine oracle can hash: row-per-dimension avoids array-float
    equality).

    Scale shape: posexplode → groupBy(label, pos).avg() is ONE shuffle
    with full map-side combine — each map partition emits at most
    |labels|·dim partial rows regardless of vector count. Centroids are
    rounded for engine-portable values (summation order differs across
    engines; 1e-6 is far above double-accumulation jitter at any
    realistic per-label count).
    """
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    )
    return (
        ex.groupBy(
            F.col("label").cast("long").alias("label"),
            (F.col("pos0") + 1).cast("long").alias("pos"),
        )
        .agg(
            F.round(F.avg(F.col("val").cast("double")), round_to).alias(
                "centroid_val"
            ),
            F.count("*").alias("n_vectors"),
        )
    )


def knn_classify(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label vote: for each query vector, the majority label among
    its exact top-k cosine neighbors (ties → smallest label —
    deterministic). Returns (query_id, pred_label, votes) — the
    weak-labeling / label-propagation primitive of an embedding-indexed
    corpus (auto-tagging new documents from their nearest labeled
    neighbors).

    Plan: the neighbor search is cosine_topk_bruteforce (broadcast
    queries, one pass over the candidate side); the vote is a
    (query, label)-keyed count over k·|Q| rows — driver-scale, free.
    The labels join touches only the k·|Q| neighbor rows, not the
    corpus.
    """
    nn = cosine_topk_bruteforce(
        embeddings, queries, k=k, id_col=id_col, vec_col=vec_col
    )
    lab = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nl")
    )
    votes = (
        nn.join(lab, "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count("*").alias("votes"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("nl")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("nl").cast("long").alias("pred_label"),
            "votes",
        )
    )


def sq_codes(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 16,
) -> DataFrame:
    """Per-dimension uniform scalar quantization (SQ) codes.

    Global per-dimension min/max (EXACT aggregates — no summation, so
    engine-identical across Spark and the DuckDB twin) define ``levels``
    uniform buckets; code_d(x) = clamp(floor((x - mn_d) * levels /
    (mx_d - mn_d)), 0, levels-1), constant dimensions code to 0. The
    dim-stats frame is dimension-bounded (64 rows here), collected once
    and shipped as two literal arrays so the per-row quantization stays
    inside whole-stage codegen. At levels=16 a 64-dim float32 vector
    compresses 256 B -> 64 one-byte codes: a brute scan over codes reads
    4x fewer bytes and compares in integer arithmetic (the SQ leg of the
    LSH / IVF / SQ ANN triad; compose with IVF cells for the 100 TB
    path, re-rank survivors with exact cosine)."""
    ex = embeddings.select(
        F.posexplode(as_double(F.col(vec_col))).alias("d", "x")
    )
    stats = (
        ex.groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("d")
        .collect()
    )
    mn = F.array(*[F.lit(r["mn"]) for r in stats])
    mx = F.array(*[F.lit(r["mx"]) for r in stats])

    def code(x, i):
        lo = F.element_at(mn, i + 1)
        hi = F.element_at(mx, i + 1)
        raw = (x - lo) * F.lit(float(levels)) / (hi - lo)
        clamped = F.least(
            F.lit(levels - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), F.floor(raw)),
        )
        return F.when(hi > lo, clamped).otherwise(F.lit(0).cast("long"))

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(as_double(F.col(vec_col)), code).alias("code"),
    )


def sq_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    levels: int = 16,
) -> DataFrame:
    """Approximate top-k neighbors by integer squared distance between
    SQ codes for the ``n_queries`` smallest-id vectors. Distances are
    BIGINT-exact (sums of squared code deltas), ties break on ascending
    neighbor id — fully deterministic, no float tolerance anywhere.
    Queries broadcast; the candidate side never shuffles (one window
    per query partition for the top-k cut)."""
    from pyspark.sql import Window

    codes = sq_codes(embeddings, levels=levels)
    q = (
        codes.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("code").alias("qc"))
    )
    dist = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("qc", "code", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("sqdist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("sqdist"), F.asc("neighbor_id")
    )
    out = (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sqdist")
    )
    return out
