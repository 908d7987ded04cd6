"""Neighborhood analytics: local clustering coefficient and
common-neighbor (co-citation) pair ranking.

Both consume the symmetric directed edge representation and evaluate
on the simple undirected graph (self-loops dropped, duplicates
collapsed) — the same canonicalization as triangles.py.

Scale notes:
- clustering_coefficient reuses the degree-ordered triangle counter
  (wedge work bounded by arboricity: Σ outdeg² with outdeg = O(√E))
  plus one vertex-sized join against the degree table.
- common_neighbors_topk enumerates wedges by self-joining the
  adjacency on the pivot vertex; wedge volume is Σ deg(pivot)², which
  hubs dominate on power-law graphs. `max_pivot_degree` caps that
  quadratic (the max_df boilerplate guard from dedup.py transplanted
  to graphs): a pivot shared by >cap pages contributes similarity
  signal near zero but cost near cap² — drop it. The final top-k is
  TakeOrderedAndProject (per-partition heap), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import triangle_count


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set as a SYMMETRIC pair table
    (both directions present), self-loops dropped, duplicates
    collapsed."""
    c = (
        edges.select("src", "dst")
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )
    return c.unionAll(
        c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex:
    lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), 0.0 when deg < 2.
    Returns (id, degree, triangles, lcc) with lcc rounded to 6
    decimals for cross-engine hash stability."""
    sym = _simple_undirected(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    )
    tri = triangle_count(edges).per_vertex
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1.0)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("lcc"),
        )
    )


def common_neighbors_topk(
    edges: DataFrame,
    k: int = 100,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """Top-k vertex pairs by common-neighbor count (co-citation
    similarity / link-prediction score). Returns
    (a, b, common_neighbors, is_edge) with a < b, ranked by
    (count desc, a, b) — fully deterministic.

    Wedges are enumerated by a self-join of the symmetric adjacency on
    the pivot; `max_pivot_degree` (if set) drops hub pivots BEFORE the
    join, bounding the per-pivot quadratic — making the count a
    lower-bound approximation (hub-mediated wedges excluded; the
    oracle twin applies the same cut). `is_edge` marks pairs that
    are already adjacent (link prediction ranks the non-adjacent ones).
    """
    sym = _simple_undirected(edges)
    piv = sym
    if max_pivot_degree is not None:
        pd = sym.groupBy(F.col("src").alias("u")).agg(
            F.count("*").alias("pdeg")
        )
        piv = (
            sym.join(
                pd.where(F.col("pdeg") <= max_pivot_degree), sym.src == pd.u
            )
            .select("src", "dst")
        )
    # wedge: pivot u adjacent to both a and b, a < b
    left = piv.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    right = piv.select(F.col("src").alias("u"), F.col("dst").alias("b"))
    pairs = (
        left.join(right, "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common_neighbors"))
    )
    adj = sym.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.lit(True).alias("is_edge")
    )
    return (
        pairs.join(adj, ["a", "b"], "left")
        .select(
            "a",
            "b",
            "common_neighbors",
            F.coalesce("is_edge", F.lit(False)).alias("is_edge"),
        )
        .orderBy(
            F.col("common_neighbors").desc(), F.col("a").asc(), F.col("b").asc()
        )
        .limit(k)
    )


def adamic_adar_topk(
    edges: DataFrame,
    k: int = 100,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor pairs with their Adamic-Adar score
    aa = Σ_{u ∈ CN(a,b)} 1/ln(deg(u)) — the degree-discounted
    link-prediction score (hub co-neighbors count less). Returns
    (a, b, common_neighbors, aa_score) ranked by the INTEGER key
    (common_neighbors desc, a, b): deterministic and engine-portable,
    unlike ranking by the float score whose summation order differs
    across engines. aa_score is rounded to 6 decimals.

    Same wedge plan and hub cap as common_neighbors_topk — the pivot
    degree is already on the wedge row, so the score is one extra
    map-side-combined SUM in the same shuffle. With
    ``max_pivot_degree`` set, both the count and the score are
    lower-bound approximations (hub-mediated wedges excluded); the
    oracle twin applies the same cut.
    """
    sym = _simple_undirected(edges)
    pd = sym.groupBy(F.col("src").alias("u")).agg(F.count("*").alias("pdeg"))
    if max_pivot_degree is not None:
        pd = pd.where(F.col("pdeg") <= max_pivot_degree)
    piv = sym.join(pd, sym.src == pd.u).select(
        F.col("u"), F.col("dst"), F.col("pdeg")
    )
    left = piv.select("u", F.col("dst").alias("a"), "pdeg")
    right = piv.select("u", F.col("dst").alias("b"))
    return (
        left.join(right, "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("pdeg"))), 6).alias("aa_score"),
        )
        .orderBy(
            F.col("common_neighbors").desc(), F.col("a").asc(), F.col("b").asc()
        )
        .limit(k)
    )


def jaccard_topk(
    edges: DataFrame,
    k: int = 100,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """Neighbor-set Jaccard similarity for the top-k common-neighbor
    pairs: j(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
                  = cn / (deg(a) + deg(b) - cn).

    Returns (a, b, common_neighbors, jaccard) with a < b, ranked by the
    INTEGER key (common_neighbors desc, a, b) — same engine-portable
    ordering contract as adamic_adar_topk; jaccard rounded to 6.

    Plan: the common_neighbors wedge aggregation (one self-join on the
    pivot + map-side-combined count) plus two broadcast-sized degree
    joins on the k result rows' endpoints — the degree table is
    vertex-sized but the join keys arrive AFTER the top-k cut, so only
    the shuffle for deg itself touches V rows.

    With ``max_pivot_degree`` set, common_neighbors (and therefore
    jaccard) is a LOWER-BOUND approximation: wedges mediated by a
    dropped hub pivot are excluded from the intersection while the
    degrees in the denominator still come from the full graph — the
    same hub-cap semantics common_neighbors_topk / adamic_adar_topk
    apply (their counts/scores are likewise approximate under the
    cap). The DuckDB oracle twin applies the identical cut, so
    cross-engine parity holds at either setting.
    """
    sym = _simple_undirected(edges)
    piv = sym
    if max_pivot_degree is not None:
        pdeg = sym.groupBy(F.col("src").alias("u")).agg(
            F.count("*").alias("pdeg")
        )
        piv = (
            sym.join(
                pdeg.where(F.col("pdeg") <= max_pivot_degree),
                sym.src == pdeg.u,
            )
            .select("src", "dst")
        )
    left = piv.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    right = piv.select(F.col("src").alias("u"), F.col("dst").alias("b"))
    pairs = (
        left.join(right, "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common_neighbors"))
        .orderBy(
            F.col("common_neighbors").desc(), F.col("a").asc(), F.col("b").asc()
        )
        .limit(k)
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (
                    F.col("dega") + F.col("degb") - F.col("common_neighbors")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(
            F.col("common_neighbors").desc(), F.col("a").asc(), F.col("b").asc()
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient: the Pearson correlation of
    (deg(src), deg(dst)) over the symmetric edge list — positive on
    social-like graphs (hubs link hubs), negative on web/biological
    graphs (hubs link leaves). One row (assortativity, n_edges),
    rounded to 6.

    Scale shape: one vertex-sized degree aggregation, two joins that
    broadcast the degree table when small (AQE decides), and corr()
    as a single-pass algebraic aggregate — no quadratic anywhere.
    """
    sym = _simple_undirected(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    ann = (
        sym.join(
            deg.select(F.col("id").alias("src"), F.col("deg").alias("sdeg")),
            "src",
        )
        .join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddeg")),
            "dst",
        )
    )
    x = F.col("sdeg").cast("double")
    y = F.col("ddeg").cast("double")
    # corr spelled as covar/(σx·σy) with try_divide: a zero-variance
    # side (regular graph) yields NULL like DuckDB's corr(), instead
    # of the DIVIDE_BY_ZERO that ANSI-mode F.corr raises
    return ann.agg(
        F.round(
            F.try_divide(
                F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y)
            ),
            6,
        ).alias("assortativity"),
        F.count("*").alias("n_edges"),
    )


def resource_allocation_topk(
    edges: DataFrame,
    k: int = 100,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor pairs with their Resource-Allocation score
    ra = Σ_{u ∈ CN(a,b)} 1/deg(u) (Zhou–Lü–Zhang 2009) — Adamic-Adar's
    harder-discounting sibling (1/deg instead of 1/ln deg), the
    strongest of the classic local link-prediction indices on dense
    web-like graphs. Returns (a, b, common_neighbors, ra_score) ranked
    by the INTEGER key (common_neighbors desc, a, b) — the
    engine-portable ordering contract of adamic_adar_topk; ra_score
    rounded to 6.

    Identical wedge plan and hub-cap semantics to adamic_adar_topk
    (the pivot degree rides the wedge row; the score is one extra
    map-side-combined SUM in the same shuffle; with
    ``max_pivot_degree`` both count and score are lower-bound
    approximations and the oracle twin applies the same cut).

    Reference analog: none (the reference is Louvain-only) — a
    link-graph companion on the shared edge-table contract.
    """
    sym = _simple_undirected(edges)
    pd = sym.groupBy(F.col("src").alias("u")).agg(F.count("*").alias("pdeg"))
    if max_pivot_degree is not None:
        pd = pd.where(F.col("pdeg") <= max_pivot_degree)
    piv = sym.join(pd, sym.src == pd.u).select(
        F.col("u"), F.col("dst"), F.col("pdeg")
    )
    left = piv.select("u", F.col("dst").alias("a"), "pdeg")
    right = piv.select("u", F.col("dst").alias("b"))
    return (
        left.join(right, "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.col("pdeg")), 6).alias("ra_score"),
        )
        .orderBy(
            F.col("common_neighbors").desc(), F.col("a").asc(), F.col("b").asc()
        )
        .limit(k)
    )


def preferential_attachment_topk(
    edges: DataFrame,
    k: int = 100,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """Preferential-attachment score pa = deg(a)·deg(b) for the top-k
    common-neighbor pairs — the growth-model baseline of the local
    link-prediction family (Barabási–Albert attachment kernel).
    Returns (a, b, common_neighbors, pa_score) with a < b, ranked by
    (common_neighbors desc, a, b); pa_score is an exact BIGINT product
    of two exact degrees, so the cross-engine check needs NO float
    tolerance anywhere in this query.

    Plan: the jaccard_topk shape — wedge aggregation + top-k cut FIRST,
    then two degree joins that touch only the k result rows' endpoints
    (degrees always from the FULL graph; only the candidate wedge
    enumeration honors ``max_pivot_degree``, same cap semantics as the
    siblings).
    """
    sym = _simple_undirected(edges)
    piv = sym
    if max_pivot_degree is not None:
        pdeg = sym.groupBy(F.col("src").alias("u")).agg(
            F.count("*").alias("pdeg")
        )
        piv = (
            sym.join(
                pdeg.where(F.col("pdeg") <= max_pivot_degree),
                sym.src == pdeg.u,
            )
            .select("src", "dst")
        )
    left = piv.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    right = piv.select(F.col("src").alias("u"), F.col("dst").alias("b"))
    pairs = (
        left.join(right, "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common_neighbors"))
        .orderBy(
            F.col("common_neighbors").desc(), F.col("a").asc(), F.col("b").asc()
        )
        .limit(k)
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            (F.col("dega") * F.col("degb")).cast("long").alias("pa_score"),
        )
        .orderBy(
            F.col("common_neighbors").desc(), F.col("a").asc(), F.col("b").asc()
        )
    )
