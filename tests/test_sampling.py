"""Deterministic stratified sampling (operators/sampling.py).

The property under test is the one DataFrame.sample cannot give: the
selection is a pure function of the row, so it survives repartitioning,
file-split changes, and re-runs — and nests across rates (a row kept at
rate r is kept at every r' > r). Module rows are pinned to the
dual-dialect `stratified_sample` twin that CORRECTNESS checks vs DuckDB.
"""

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import driver_queries as dq
from warc_metadata_sidecar_spark.operators.sampling import (
    N_BUCKETS,
    hash_bucket,
    mixture_rates,
    stratified_sample,
    temperature_sample,
)

SF_DIR = "/root/testdata/sf0.001"

RATES = {
    "src0": 1.0,
    "src1": 0.5,
    "src2": 0.25,
    "src3": 0.125,
    "src4": 0.0625,
    "src5": 0.0,
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _kept_ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_module_matches_twin(spark, docs):
    dq.register_views(spark, SF_DIR)
    twin = spark.sql(dq.spark_sql_for("stratified_sample"))
    mod = stratified_sample(docs, RATES, key_col="doc_id", stratum_col="source")
    twin_rows = sorted(tuple(r) for r in twin.select("doc_id", "source", "bucket").collect())
    mod_rows = sorted(
        tuple(r)
        for r in mod.withColumn("bucket", hash_bucket(F.col("doc_id")))
        .select(F.col("doc_id").cast("long"), "source", "bucket")
        .collect()
    )
    assert mod_rows == twin_rows
    assert len(mod_rows) > 0


def test_partitioning_invariance(spark, docs):
    """The failure mode of DataFrame.sample: output depends on partitioning.
    Hash-threshold selection must not."""
    base = _kept_ids(stratified_sample(docs.coalesce(1), RATES))
    for parts in (3, 7):
        assert _kept_ids(stratified_sample(docs.repartition(parts), RATES)) == base
    # and order-independence: reversing row order changes nothing
    rev = docs.orderBy(F.desc("doc_id"))
    assert _kept_ids(stratified_sample(rev, RATES)) == base


def test_rates_nest(spark, docs):
    """bucket < r*N is monotone in r: the rate-0.25 sample of a stratum is
    a subset of its rate-0.5 sample — resampling a corpus down never
    selects previously-unselected rows (stable curation epochs)."""
    lo = set(_kept_ids(stratified_sample(docs, {"src7": 0.25})))
    hi = set(_kept_ids(stratified_sample(docs, {"src7": 0.5})))
    assert lo < hi


def test_default_rate_and_zero(spark, docs):
    all_src9 = docs.where(F.col("source") == "src9").count()
    # absent stratum + default 1.0 -> everything kept
    kept = stratified_sample(docs, {"src0": 0.0}, default_rate=1.0)
    assert kept.where(F.col("source") == "src9").count() == all_src9
    # rate 0.0 and absent-with-default-0.0 both drop
    assert kept.where(F.col("source") == "src0").count() == 0
    dropped = stratified_sample(docs, {"src0": 1.0})
    assert dropped.where(F.col("source") == "src9").count() == 0


def test_rate_accuracy_large(spark):
    """On 40k synthetic keys the kept fraction lands near the rate
    (binomial 5-sigma band) and bucket values cover the full range."""
    n, rate = 40_000, 0.3
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    kept = stratified_sample(df, {"s": rate}).count()
    sigma = (n * rate * (1 - rate)) ** 0.5
    assert abs(kept - n * rate) < 5 * sigma
    stats = df.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).first()
    assert stats["lo"] == 0 and stats["hi"] == N_BUCKETS - 1


def test_mixture_rates_matches_twin(spark, docs):
    dq.register_views(spark, SF_DIR)
    twin = sorted(tuple(r) for r in spark.sql(dq.spark_sql_for("mixture_weights")).collect())
    mod = sorted(
        tuple(r) for r in mixture_rates(docs, "lang", alpha=0.5, budget=250).collect()
    )
    assert mod == twin


def test_temperature_sample_matches_twin(spark, docs):
    dq.register_views(spark, SF_DIR)
    twin = sorted(
        tuple(r)
        for r in spark.sql(dq.spark_sql_for("temperature_sample"))
        .select("doc_id", "lang")
        .collect()
    )
    mod = sorted(
        tuple(r)
        for r in temperature_sample(docs, "lang", "doc_id", alpha=0.5, budget=250)
        .select(F.col("doc_id").cast("long"), "lang")
        .collect()
    )
    assert mod == twin
    assert len(mod) > 0


def test_mixture_flattens_toward_uniform(spark, docs):
    """alpha<1 must shrink the majority stratum's share and grow every
    minority's: q_en < p_en and q_s > p_s for all other langs."""
    rows = {
        r["lang"]: r for r in mixture_rates(docs, "lang", alpha=0.5).collect()
    }
    n_tot = sum(r["n_docs"] for r in rows.values())
    majority = max(rows, key=lambda k: rows[k]["n_docs"])
    assert majority == "en"
    for lang, r in rows.items():
        p = r["n_docs"] / n_tot
        if lang == majority:
            assert r["q"] < p
        else:
            assert r["q"] > p
    # alpha=0 would be uniform; alpha=1 is the raw distribution
    raw = {r["lang"]: r["q"] for r in mixture_rates(docs, "lang", alpha=1.0).collect()}
    assert abs(raw[majority] - rows[majority]["n_docs"] / n_tot) < 1e-6


def test_temperature_sample_hits_budget(spark, docs):
    """Kept total lands near the requested budget (each stratum is a
    binomial at its rate; 5-sigma bound on the sum)."""
    budget = 250
    kept = temperature_sample(docs, "lang", budget=budget).count()
    assert abs(kept - budget) < 5 * (budget**0.5)


def test_plan_broadcasts_rates(spark, docs):
    """The rates side must never shuffle the corpus: the join is a
    BroadcastHashJoin and the corpus scan carries no Exchange below it."""
    plan = stratified_sample(docs, RATES)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
