"""Deterministic stratified sampling — the corpus-subsampling step a
training-data pipeline runs to rebalance sources/languages (e.g. CCNet's
per-language budgets, The Pile's per-subset epochs).

Why not ``DataFrame.sample``: Spark's sample() draws per-partition from a
seeded RNG stream, so its OUTPUT DEPENDS ON PARTITIONING — the same call
over the same rows repartitioned differently (or read from a differently
split file set) selects different rows. At 100 TB, where file splits
change with cluster config, that is not reproducible. The fix is
content-hash thresholding: keep a row iff ``bucket(hash(key)) <
rate * n_buckets`` — a pure function of the row, independent of
partitioning, executor count, and row order; re-runs and resumes select
the identical subset, and the selection composes with dedup (a kept key
is kept everywhere).

The bucket is the first three hex nibbles of md5(key) (4096 buckets —
rate granularity 1/4096), chosen because md5 is native in BOTH engines so
the DuckDB twin reproduces the selection bit-for-bit (xxhash64 would be
faster JVM-side but has no DuckDB counterpart; swap it in production if
oracle parity is not needed). Per-stratum rates ride a broadcast join of
the tiny rates table — never a shuffle of the corpus.

Dual-dialect twin: driver_queries._Q["stratified_sample"];
tests/test_module_oracle_parity pins this module to the twin's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_BUCKETS = 4096


def hash_bucket(key) -> "F.Column":
    """Deterministic 0..4095 bucket from the md5 hex prefix of `key` —
    engine-portable (conv() the first 3 hex chars; DuckDB twin rebuilds
    the same value from per-nibble strpos arithmetic)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 3), 16, 10).cast("int")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "doc_id",
    stratum_col: str = "source",
    default_rate: float = 0.0,
) -> DataFrame:
    """Rows of `df` whose hash bucket falls under their stratum's rate.
    Strata absent from `rates` sample at `default_rate` (0.0 = drop —
    the explicit-allowlist behavior a curation pipeline wants)."""
    spark = SparkSession.getActiveSession()
    rates_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, rate double",
    )
    return (
        df.join(F.broadcast(rates_df), stratum_col, "left")
        .withColumn("rate", F.coalesce(F.col("rate"), F.lit(float(default_rate))))
        .where(hash_bucket(F.col(key_col)) < F.col("rate") * N_BUCKETS)
        .drop("rate")
    )


def mixture_rates(
    df: DataFrame,
    stratum_col: str = "lang",
    alpha: float = 0.5,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-rebalanced per-stratum target rates (the multilingual
    mixture rule of XLM-R / mC4): q_s ∝ (n_s/N)^alpha flattens the raw
    distribution toward uniform as alpha→0; rate_s = min(1, budget·q_s/n_s)
    converts the mixture into per-stratum keep rates for `budget` total
    rows (budget=None ⇒ N, pure reweighting).

    One groupBy over the corpus; everything after runs on the ≤|strata|-row
    counts frame, so the unpartitioned windows are model-sized, never
    corpus-sized (the lm.py precedent). With the default alpha=0.5 the
    power is sqrt — IEEE-correctly-rounded, so the DuckDB twin reproduces
    q bit-for-bit before the 6-digit rounding that guards the remaining
    20-term sum-order ulps.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()  # counts-frame only: ≤ |strata| rows
    pow_p = (
        F.sqrt(F.col("p")) if alpha == 0.5 else F.pow(F.col("p"), F.lit(float(alpha)))
    )
    scored = (
        counts.withColumn("p", F.col("n_docs") / F.sum("n_docs").over(w))
        .withColumn("pa", pow_p)
        .withColumn("q", F.round(F.col("pa") / F.sum("pa").over(w), 6))
    )
    if budget is None:
        budget_col = F.sum("n_docs").over(w)
    else:
        budget_col = F.lit(int(budget))
    return scored.select(
        stratum_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("q").cast("double").alias("q"),
        F.least(
            F.lit(1.0),
            F.round(F.col("pa") / F.sum("pa").over(w) * budget_col / F.col("n_docs"), 6),
        )
        .cast("double")
        .alias("rate"),
    )


def temperature_sample(
    df: DataFrame,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    budget: int | None = None,
) -> DataFrame:
    """Compose mixture_rates with the hash-threshold selection: rows kept
    iff bucket(key) < floor(rate·4096). The rates frame is |strata| rows —
    broadcast — so the corpus is scanned twice (once for counts, once for
    the filter) and never shuffled."""
    rates = mixture_rates(df, stratum_col, alpha, budget).select(stratum_col, "rate")
    return (
        df.join(F.broadcast(rates), stratum_col, "inner")
        .where(hash_bucket(F.col(key_col)) < F.floor(F.col("rate") * N_BUCKETS))
        .drop("rate")
    )
