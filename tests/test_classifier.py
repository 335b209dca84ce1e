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


def _surrogate_loss(docs_py, w, bias):
    """Mean squared fast-sigmoid error on the training sample (the
    surrogate the trainer descends)."""
    tot = 0.0
    for y, nw, fb in docs_py:
        z = bias + sum(sorted((cnt / nw) * w.get(b, 0.0) for b, cnt in fb))
        p = 0.5 + 0.5 * z / (1.0 + abs(z))
        tot += (p - y) ** 2
    return tot / len(docs_py)


def test_train_matches_sequential_twin_bit_exact(spark, docs):
    """Distributed training == the sequential re-train, bit-for-bit (no
    rounding): the fast-sigmoid surrogate keeps every step IEEE-exact and
    the sorted folds make accumulation order-independent."""
    from warc_metadata_sidecar_spark.operators.classifier import (
        train_linear_classifier,
    )

    labeled = docs.withColumn("y", (F.col("lang") == "en").cast("double"))
    w, bias = train_linear_classifier(labeled, "y", iters=3, eta=0.5)
    exp = dict(dq._classifier_train_twin(SF_DIR))
    assert bias == exp.pop(-1)
    assert w == exp


def test_train_decreases_surrogate_loss_and_feeds_scoring(spark, docs):
    """The trained model reduces the surrogate loss vs the zero init on
    its own training sample, and plugs straight into score_documents
    (scores in (0,1), biased below 0.5 for the minority-positive label)."""
    import hashlib

    from warc_metadata_sidecar_spark.operators.classifier import (
        train_linear_classifier,
    )

    labeled = docs.withColumn("y", (F.col("lang") == "en").cast("double"))
    w, bias = train_linear_classifier(labeled, "y", iters=3, eta=0.5)
    docs_py = []
    for r in docs.select("doc_id", "lang", "text").collect():
        ws = r.text.split(" ")
        fb: dict[int, int] = {}
        for wd in ws:
            b = int(hashlib.md5(wd.encode()).hexdigest()[:2], 16)
            fb[b] = fb.get(b, 0) + 1
        docs_py.append(
            (1.0 if r.lang == "en" else 0.0, float(len(ws)), sorted(fb.items()))
        )
    assert _surrogate_loss(docs_py, w, bias) < _surrogate_loss(docs_py, {}, 0.0)
    scored = score_documents(docs, w, bias)
    rows = scored.collect()
    assert all(0.0 < r.score < 1.0 for r in rows)
    en_frac = docs.where("lang = 'en'").count() / docs.count()
    assert en_frac < 0.5
    assert sum(r.score for r in rows) / len(rows) < 0.5
