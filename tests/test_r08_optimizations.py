"""Focused tests for the r8 optimization-round internals changes.

Each r8 change is behavior-preserving by construction; the broad parity /
bit-exactness suites cover most of them end-to-end. These tests pin the
three internals where a NEW code path exists that the end-to-end suites
would not isolate on their own:

  1. _srp_bucket_expr's single-F.expr form: the literal-hyperplane branch
     AND the md5 fallback branch (taken by vectors whose width differs
     from the sampled dims) must both produce the pre-r8 buckets.
  2. update_filter_shards' fresh-build path (plain grouped apply) must
     produce byte-identical filter states to the cogroup-with-empty path.
  3. containment_pairs with materialize=True (the new default) must equal
     materialize=False rows exactly.
  4. tfidf_keywords with materialize=True (the new default) must equal
     materialize=False rows exactly.
  5. the scale-adaptive `<t>_fan` views: repartitioned exactly when the
     split estimate is below parallelism, and row-identical to the
     canonical statements for the _FAN_QUERIES rewrites.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.session import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session("test_r08", cpus=4, shuffle_partitions=4)
    yield s


def _py_srp_bucket(vec, planes, table):
    """Independent per-row twin of the SRP bucket definition."""
    bucket = 0
    for p in range(planes):
        prefix = f"{table}:{p}:" if table else f"{p}:"
        dot = 0.0
        for d, x in enumerate(vec):
            nib = hashlib.md5(f"{prefix}{d}".encode()).hexdigest()[0]
            h = float("0123456789abcdef".index(nib) + 1) - 7.5
            dot += x * h
        if dot > 0:
            bucket += 1 << p
    return bucket


def test_srp_bucket_expr_literal_and_fallback_branches(spark):
    from warc_metadata_sidecar_spark.operators.similarity import _srp_bucket_expr

    # dims sampled as 4: the 4-wide vector takes the literal branch, the
    # 3-wide vector MUST fall back to the md5 form — both must match the
    # independent Python twin.
    rows = [(1, [0.5, -1.0, 2.0, 0.25]), (2, [1.0, 1.0, -3.0])]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    out = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", _srp_bucket_expr("v", planes=5, table=2, dims=4).alias("b")
        ).collect()
    }
    for vec_id, vec in rows:
        assert out[vec_id] == _py_srp_bucket(vec, planes=5, table=2)


def test_update_filter_shards_fresh_build_equals_cogroup_path(spark):
    from warc_metadata_sidecar_spark.frontier.seen import (
        FILTERS_SCHEMA,
        update_filter_shards,
    )

    urls = spark.createDataFrame(
        [(f"https://h{i % 7}.example.com/p/{i}",) for i in range(300)], ["url"]
    )
    fresh = {
        r.shard: (bytes(r.state), r.adds)
        for r in update_filter_shards(spark, urls, None, key="url").collect()
    }
    empty = spark.createDataFrame([], FILTERS_SCHEMA)
    cogrouped = {
        r.shard: (bytes(r.state), r.adds)
        for r in update_filter_shards(spark, urls, empty, key="url").collect()
    }
    assert fresh == cogrouped
    assert sum(a for _, a in fresh.values()) == 300


def test_containment_pairs_materialize_equals_recompute(spark):
    from warc_metadata_sidecar_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight and more"),
            (3, "a completely different document with its own words here"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    a = sorted(
        map(tuple, containment_pairs(docs, threshold=0.3, materialize=True).collect())
    )
    b = sorted(
        map(tuple, containment_pairs(docs, threshold=0.3, materialize=False).collect())
    )
    assert a == b
    assert a  # the fixture must actually produce pairs


def test_tfidf_keywords_materialize_equals_recompute(spark):
    from warc_metadata_sidecar_spark.operators.quality import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry date"),
            (2, "banana cherry cherry cherry elderberry"),
            (3, "apple fig grape fig fig"),
            (4, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, tfidf_keywords(docs, k=3, materialize=True).collect()))
    b = sorted(map(tuple, tfidf_keywords(docs, k=3, materialize=False).collect()))
    assert a == b
    assert a  # the fixture must actually produce keywords


def test_fan_views_adaptive_and_row_identical(spark):
    """r8 scale-adaptive fan-out: register_views publishes `<t>_fan` views
    that are repartitioned to defaultParallelism ONLY when the file-size
    estimate yields fewer splits than cores, and the _FAN_QUERIES rewrite
    returns exactly the canonical rows."""
    from warc_metadata_sidecar_spark import driver_queries as dq

    sf = "/root/testdata/sf0.001"
    dq.register_views(spark, sf)
    # small local files -> the fan view must be repartitioned to parallelism
    n_par = spark.sparkContext.defaultParallelism
    fan = spark.table("documents_fan")
    assert fan.rdd.getNumPartitions() == n_par
    # same rows either way
    assert fan.count() == spark.table("documents").count()
    # the condition is adaptive: a large-file estimate must NOT repartition
    # (simulated by the estimate arithmetic itself)
    split = dq._split_bytes(spark)
    assert max(1, -(-(split * n_par) // split)) >= n_par  # big file -> no fan
    # a fanned query's rows equal the canonical (unfanned) statement's rows
    name = "fingerprint_winnow"
    fanned = dq.queries()[name](spark, sf)
    plain = spark.sql(dq.spark_sql_for(name))
    a = sorted(map(tuple, fanned.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b
    assert a  # the fixture must actually produce fingerprints
