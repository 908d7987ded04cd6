"""Deterministic sampling operators for training-data pipelines.

The scale constraint drives the design: at corpus scale (10^10+ rows)
a sampler must be a MAP-ONLY pass — no shuffle, no window, no count()
pre-pass. `stratified_sample` therefore uses hash-threshold (Bernoulli
by content hash) sampling: a row is kept iff the first 8 hex chars of
md5(salt|id) fall below a per-stratum threshold. That gives

- determinism: same (salt, id) always samples the same way, across
  runs, engines, partitionings, and cluster sizes — re-running the
  pipeline on grown data keeps every previously-sampled row whose id
  survives (sample stability, the property reservoir sampling lacks);
- exact portability: thresholds compare 8-char lowercase hex STRINGS
  lexicographically, which equals numeric comparison and is bit-exact
  between Spark and the DuckDB oracle (no float rounding at the
  boundary);
- zero-shuffle execution: the whole operator is one whole-stage-codegen
  scan — per-stratum thresholds compile to a literal CASE chain.

Expected (not exact) per-stratum counts: E[kept] = f * n_stratum with
binomial concentration — the right trade at scale, where an exact-quota
variant would need a per-stratum sort (full shuffle) for no practical
gain at n >> 1/f^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = 8  # 32 bits of md5 — plenty for fraction resolution


def _threshold_hex(fraction: float) -> str:
    """8-hex-char exclusive upper bound for a keep fraction in [0,1].

    f >= 1 maps to 'g' (lexicographically above every hex string, so
    everything is kept); f <= 0 maps to '00000000' (nothing kept).
    """
    if fraction >= 1.0:
        return "g"
    n = max(0, min(16**HEX_DIGITS, round(fraction * 16**HEX_DIGITS)))
    return format(n, f"0{HEX_DIGITS}x")


def sample_bucket(id_col: Column, salt: str = "s7") -> Column:
    """The deterministic 8-hex-char sampling bucket of a row id."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, HEX_DIGITS
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.25,
    id_col: str = "doc_id",
    salt: str = "s7",
) -> DataFrame:
    """Deterministic hash-threshold stratified sample.

    Keeps each row iff md5(salt|id)[:8] < threshold(stratum), where the
    per-stratum thresholds are compiled driver-side into a literal CASE
    chain — the plan is a single filter+project scan with no shuffle
    (the analog of the reference's sampled-input experiment harness,
    main.sh:30-41, re-expressed as a declarative map-only operator).

    Returns (id_col, strata_col, bucket) for the kept rows; `bucket`
    makes every kept row independently verifiable.
    """
    fractions = fractions or {}
    bucket = sample_bucket(F.col(id_col), salt)
    thr: Column = F.lit(_threshold_hex(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return (
        df.select(F.col(id_col), F.col(strata_col), bucket.alias("bucket"))
        .where(F.col("bucket") < thr)
    )
