"""Structural utilities: graph description, synthetic edge deltas,
community-connectivity validation.

Covers the remaining reference surface:
- writeGraph/operator<< pretty-print (Graph.hxx:654-718) → describe()
- generateEdgeDeletions/Insertions (batch.hxx:100-140) → deterministic
  hash-based deltas (no rand(): reproducible across runs/executors)
- communitiesDisconnectedOmp (properties.hxx:378-400) → per-community
  connectivity via label propagation restricted to intra-community
  edges
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components
from .transforms import vertices


def describe_graph(edges: DataFrame) -> DataFrame:
    """One-row frame: order (vertices), size (directed edges), total
    weight, self-loops — the DataFrame analog of the reference's
    `order: N size: M {...}` writer."""
    n = vertices(edges).count()
    return edges.agg(
        F.lit(n).alias("order"),
        F.count("*").alias("size"),
        F.coalesce(F.sum("w"), F.lit(0.0)).alias("total_weight"),
        F.coalesce(
            F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0)), F.lit(0)
        ).alias("self_loops"),
    )


def generate_edge_deltas(
    edges: DataFrame, frac_del: float = 0.05, frac_ins: float = 0.05, salt: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Deterministic synthetic batch update (batch.hxx semantics):

    - deletions: an existing-edge sample (must exist — trivially true),
      picked by a hash predicate over (src, dst);
    - insertions: new edges u→v with v = a hash-shifted endpoint,
      filtered to not already exist (batch.hxx:192-209 tidy rule).

    Both returned as *undirected* deltas (one direction; the applier
    symmetricizes). Hash-based: same output for same input and salt.
    """
    und = edges.where(F.col("src") < F.col("dst"))
    h = F.pmod(F.hash("src", "dst", F.lit(salt)), F.lit(1_000_000))
    dels = und.where(h < int(frac_del * 1_000_000)).select("src", "dst")
    n = vertices(edges).count()
    ins = (
        und.where(h >= int((1.0 - frac_ins) * 1_000_000))
        .select(
            "src",
            F.pmod(
                F.col("dst") + F.pmod(F.hash("dst", F.lit(salt)), F.lit(max(n - 1, 1))) + 1,
                F.lit(n),
            ).alias("dst"),
            F.lit(1.0).alias("w"),
        )
        .where(F.col("src") != F.col("dst"))
        .join(edges.select("src", "dst"), ["src", "dst"], "left_anti")
        .dropDuplicates(["src", "dst"])
    )
    return dels, ins


def intra_community_components(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Connected components of the graph restricted to intra-community
    edges: (id, com, comp)."""
    ms = membership.select(F.col("id").alias("src"), F.col("com").alias("csrc"))
    md = membership.select(F.col("id").alias("dst"), F.col("com").alias("cdst"))
    intra = (
        edges.join(ms, "src")
        .join(md, "dst")
        .where(F.col("csrc") == F.col("cdst"))
        .select("src", "dst", "w")
    )
    comps = connected_components(intra).components
    # vertices with no intra-community edge are their own component
    allv = membership.select("id", "com")
    return allv.join(comps, "id", "left").select(
        "id", "com", F.coalesce("comp", F.col("id")).alias("comp")
    )


def disconnected_communities(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Communities that are internally disconnected (reference quality
    metric, properties.hxx:378-400): (com, n_parts) with n_parts > 1."""
    icc = intra_community_components(edges, membership)
    return (
        icc.groupBy("com")
        .agg(F.countDistinct("comp").alias("n_parts"))
        .where(F.col("n_parts") > 1)
    )


def refine_partition(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Leiden-style refinement step (Traag, Waltman & van Eck 2019,
    "From Louvain to Leiden: guaranteeing well-connected
    communities"): split every internally-disconnected community into
    its connected parts. The refined label is the minimum vertex id
    of the part — globally unique without any renumber pass, since
    parts are disjoint vertex sets.

    Whenever a community IS disconnected, the split strictly
    increases modularity: no intra-community edge crosses the parts
    (they are separate components), so the edge term is unchanged
    while the degree-square penalty shrinks — pytest pins this
    invariant (tests/test_structure.py). For an already-connected
    partition the refinement is the identity up to the min-id
    canonical labels.

    Cost = one intra-community edge filter (two vertex-sized
    membership joins) + connected components on the induced subgraph
    (components.py's hash-min + pointer-jump kernel, O(log d) rounds).

    Returns (id, com, refined): the original and refined labels.
    """
    icc = intra_community_components(edges, membership)
    return icc.select("id", "com", F.col("comp").alias("refined"))


def sparsify_edges(
    edges: DataFrame, fraction: float = 0.1, salt: str = "g1"
) -> DataFrame:
    """Deterministic graph sparsification: keep an undirected edge iff
    md5(salt|min|max) falls below the fraction threshold — the
    interactive-analysis subsample of a 100 TB graph. Hash-based like
    the stratified document sampler (sampling.py): same (salt, edge) →
    same verdict across runs, engines, and partitionings, and BOTH
    directions of an undirected edge share one verdict (the key is the
    sorted endpoint pair), so the sample stays symmetric. Map-only —
    no shuffle, no RNG state.
    """
    from .sampling import _threshold_hex

    lo = F.least("src", "dst").cast("string")
    hi = F.greatest("src", "dst").cast("string")
    bucket = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), lo, hi)), 1, 8
    )
    return edges.where(bucket < F.lit(_threshold_hex(fraction)))


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Degree-correlation curve knn(k) (Pastor-Satorras, Vázquez &
    Vespignani 2001) — the curve behind the assortativity scalar: for
    each degree k, the mean neighbor degree over all edge endpoints of
    degree-k vertices,

        knn(k) = ( Σ_{v: deg v = k} Σ_{u ∈ N(v)} deg u ) / (k · n_k).

    The edge-wise form keeps every sum integer-valued (exact in both
    engines) with ONE final division, so the 6-decimal rounding is
    engine-stable — no mean-of-means float-order sensitivity.

    Expects the mirrored directed table. Plan: one degree aggregate,
    re-joined onto the edge list (vertex-sized build side → broadcast
    under AQE at small scale, shuffle-hash above), then two map-side-
    combined aggregates (per-vertex, then per-degree). Output is one
    row per distinct degree — bounded, never vertex-sized.

    Returns (deg, n_vertices, sum_nb_deg, knn).
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nb = (
        edges.join(
            deg.select(
                F.col("src").alias("dst"), F.col("deg").alias("ndeg")
            ),
            "dst",
        )
        .groupBy("src")
        .agg(F.sum("ndeg").alias("snd"))
        .join(deg, "src")
    )
    return (
        nb.groupBy("deg")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum("snd").cast("long").alias("sum_nb_deg"),
        )
        .select(
            F.col("deg").cast("long").alias("deg"),
            "n_vertices",
            "sum_nb_deg",
            F.round(
                F.col("sum_nb_deg") / (F.col("deg") * F.col("n_vertices")),
                6,
            ).alias("knn"),
        )
    )
