"""Explicit hub-key salting for skewed joins (north-rule mandate).

Web link graphs are power-law: a handful of hub hosts carry orders of
magnitude more edges than the median, so any edge⋈state equi-join on
the vertex key sends a hub's entire adjacency to one reducer. Two
guards exist in this engine:

1. AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
   session.py) — runtime splitting of oversized partitions; and
2. THIS module — plan-level salted high-degree splits for the cases
   AQE cannot fix: a single key (not partition) that is itself too
   large, or a broadcast-ineligible state side joined repeatedly where
   re-splitting each round wastes AQE work.

Mechanics (the standard replicate-broadcast-side / scatter-big-side
construction): hot keys — those whose edge count exceeds
``hot_threshold`` — get ``n_salts`` virtual copies. Edge rows on a hot
key scatter uniformly across salts via a deterministic hash of the
OTHER join column (so the same row always lands on the same salt — no
randomness); state rows on a hot key replicate to every salt. Cold
keys keep salt 0 on both sides. The join key becomes (key, salt), the
hub reducer becomes ``n_salts`` reducers, and the result is row-for-row
identical to the unsalted join (pinned by pytest against it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(edges: DataFrame, key: str, hot_threshold: int) -> DataFrame:
    """(key) frame of keys whose edge count exceeds the threshold —
    one map-side-combined aggregate; hub sets are tiny by power-law, so
    downstream plans broadcast this frame."""
    return (
        edges.groupBy(F.col(key).alias("_hk"))
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > hot_threshold)
        .select("_hk")
    )


def salted_join(
    edges: DataFrame,
    state: DataFrame,
    key: str,
    hot_threshold: int = 1_000_000,
    n_salts: int = 32,
    scatter_col: str | None = None,
    keep_salt: bool = False,
) -> DataFrame:
    """``edges ⋈ state`` on ``key`` with hot keys split across
    ``n_salts`` reducers. ``state``'s join column must also be named
    ``key``; output columns = the plain join's columns (salt plumbing
    is dropped). ``scatter_col`` (default: any other edge column)
    deterministically spreads a hot key's edge rows across salts.

    At 10^12-doc scale: hot_threshold bounds the per-reducer row count
    for any single key at threshold + |edges on key| / n_salts; the
    hot-key frame is broadcast twice (once per side's salting) and the
    join itself stays a plain shuffled equi-join on (key, salt) that
    Catalyst/AQE plan as usual.
    """
    other_cols = [c for c in edges.columns if c != key]
    if scatter_col is None:
        if not other_cols:
            raise ValueError("edges needs a second column to scatter by")
        scatter_col = other_cols[0]
    hot = hot_keys(edges, key, hot_threshold)
    e = edges.join(
        F.broadcast(hot), edges[key] == hot["_hk"], "left"
    ).select(
        *edges.columns,
        F.when(
            F.col("_hk").isNotNull(),
            F.pmod(F.hash(F.col(scatter_col)), F.lit(n_salts)),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("_salt"),
    )
    s = state.join(
        F.broadcast(hot), state[key] == hot["_hk"], "left"
    ).select(
        *state.columns,
        F.when(
            F.col("_hk").isNotNull(),
            F.sequence(F.lit(0), F.lit(n_salts - 1)),
        )
        .otherwise(F.array(F.lit(0)))
        .alias("_salts"),
    ).select(*state.columns, F.explode("_salts").alias("_salt"))
    j = e.join(s, [key, "_salt"])
    return j if keep_salt else j.drop("_salt")
