"""Hashed-BoW linear classifier scoring (operators/classifier.py) pinned
to the dual-dialect classifier_score twin plus plan/behavior checks."""

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import driver_queries as dq
from warc_metadata_sidecar_spark.operators.classifier import (
    N_FEATURE_BUCKETS,
    feature_bucket,
    score_documents,
)

SF_DIR = "/root/testdata/sf0.001"

# the oracle's inline pseudo-model, as the dict a trained model would be
WEIGHTS = {b: ((b * 37) % 101 - 50) / 25.0 for b in range(N_FEATURE_BUCKETS)}
BIAS = 0.25


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_module_matches_twin(spark, docs):
    dq.register_views(spark, SF_DIR)
    twin = sorted(
        tuple(r) for r in spark.sql(dq.spark_sql_for("classifier_score")).collect()
    )
    mod = sorted(
        tuple(r)
        for r in score_documents(docs, WEIGHTS, bias=BIAS)
        .select(F.col("doc_id").cast("long"), "n_words", "score")
        .collect()
    )
    assert mod == twin and len(mod) == 500


def test_scores_discriminate_and_bound(spark, docs):
    rows = score_documents(docs, WEIGHTS, bias=BIAS).collect()
    scores = [r["score"] for r in rows]
    assert all(0.0 < s < 1.0 for s in scores)
    assert max(scores) - min(scores) > 0.2  # the model separates docs


def test_missing_buckets_zero_weight(spark, docs):
    """An empty model scores every doc sigmoid(bias) exactly — untrained
    buckets contribute 0, not NULL."""
    rows = score_documents(docs, {}, bias=0.0).collect()
    assert all(r["score"] == 0.5 for r in rows)


def test_bucket_range(spark, docs):
    stats = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select(feature_bucket(F.col("w")).alias("b"))
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .first()
    )
    assert 0 <= stats["lo"] and stats["hi"] <= N_FEATURE_BUCKETS - 1


def test_plan_broadcast_model(spark, docs):
    """The weight table must ride a broadcast; the corpus shuffles only
    for its two map-side-combined aggregations."""
    plan = (
        score_documents(docs, WEIGHTS, bias=BIAS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
