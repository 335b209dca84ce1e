"""IVF-PQ (operators/pq.py): codebook training / literal-table encode /
ADC-SDC search / exact rerank, pinned to the independent sequential twin
and measured on a clustered corpus.

Recall physics on this corpus, asserted as such: vectors are
center + ISOTROPIC noise, so same-cluster members get near-identical
codes — PQ retrieves the right cluster (~1.0) while intra-cluster
ordering by ADC is ~random, making rerank recall ≈ shortlist/|cluster|
(the information-theoretic ceiling for white noise; real embeddings with
anisotropic local structure rank better). The tests pin both halves:
semantic retrieval high, rerank recall growing linearly with the
shortlist and far above the no-rerank baseline.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import driver_queries as dq
from warc_metadata_sidecar_spark.operators.pq import (
    pq_encode,
    pq_encode_adc,
    pq_rerank_top1,
    pq_top1,
    pq_train_codebooks,
)
from warc_metadata_sidecar_spark.operators.similarity import brute_force_topk

SF_DIR = "/root/testdata/sf0.001"
DIM = 32


def _h(s: str, lo: float = -1.0, hi: float = 1.0) -> float:
    v = int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
    return lo + v * (hi - lo)


@pytest.fixture(scope="module")
def clustered(spark):
    centers = [[_h(f"c{c}:{d}") for d in range(DIM)] for c in range(20)]
    rows = [
        (i, [float(centers[i % 20][d] + 0.15 * _h(f"v{i}:{d}")) for d in range(DIM)])
        for i in range(1000)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


@pytest.fixture(scope="module")
def books(clustered):
    return pq_train_codebooks(clustered, m=4, ksub=16, dims=DIM)


@pytest.fixture(scope="module")
def exact_nn(clustered):
    return {
        r["vec_id"]: r["neighbor_id"] for r in brute_force_topk(clustered, k=1).collect()
    }


def test_pq_matches_sequential_twin(spark):
    """Engine IVF-PQ == the independent Python twin that re-trains the
    codebooks itself (same seed/fold rules) — bit-exact rows at sf0.001."""
    import duckdb

    twin = [tuple(r) for r in duckdb.sql(dq._ann_pq_top1_oracle_sql(SF_DIR)).fetchall()]
    eng = [tuple(r) for r in dq.ann_pq_top1(spark, SF_DIR).collect()]
    assert eng == twin and len(eng) > 0


def test_codes_shape_and_compression(clustered, books):
    assert [len(b) for b in books] == [16, 16, 16, 16]
    enc = pq_encode(clustered, books)
    stats = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("m"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 15 and stats["m"] == 4
    # 32 doubles (256 B) -> 4 nibble codes (2 B packed): 128x


def test_same_cluster_retrieval(clustered, books):
    """PQ's job on clustered data: the top-1 neighbor is in the query's
    cluster virtually always, for both scoring modes."""
    for mode in ("adc", "sdc"):
        got = pq_top1(clustered, books, mode=mode).collect()
        assert len(got) == 1000
        same = sum(1 for r in got if r["vec_id"] % 20 == r["neighbor_id"] % 20)
        assert same / len(got) >= 0.95, (mode, same)


def test_rerank_recovers_recall(clustered, books, exact_nn):
    """Exact rerank recovers fine ranking at the white-noise ceiling:
    recall grows ~linearly with the shortlist (clusters hold ~50
    members) and crushes the no-rerank baseline."""
    base = pq_top1(clustered, books).collect()
    base_rec = sum(1 for r in base if exact_nn[r["vec_id"]] == r["neighbor_id"]) / 1000
    recs = {}
    for R in (5, 20):
        got = pq_rerank_top1(clustered, books, shortlist=R).collect()
        recs[R] = sum(1 for r in got if exact_nn[r["vec_id"]] == r["neighbor_id"]) / 1000
    assert recs[20] > recs[5] > base_rec
    assert recs[20] >= 0.35  # ~R/|cluster| = 20/50, measured 0.437


def test_encode_is_single_projection(clustered, books):
    """Encoding must not shuffle or join: codebooks are literals, so the
    whole encode (+ADC LUT) is one projection over the scan."""
    for fn in (pq_encode, pq_encode_adc):
        plan = fn(clustered, books)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan, fn.__name__


def test_search_plan_bucket_join(clustered, books):
    """The candidate join is a bucket equi-join — never a cartesian
    product over the corpus."""
    plan = pq_top1(clustered, books)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "bucket" in plan


def test_zero_vector_never_wins_top1(spark):
    """An all-zero vector has undefined cosine (denom 0). Unguarded, the
    NaN would sort ABOVE every real sim and win max(struct); the guard
    ranks it last (-1.0) on both query and neighbor side."""
    import math

    rows = [
        (0, [10.0, 0.1, 0.0, 0.0]),
        (1, [10.0, 0.2, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector, same coarse bucket region
    ]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    books = pq_train_codebooks(emb, m=2, ksub=2, dims=4, iters=1)
    got = {r["vec_id"]: r for r in pq_top1(emb, books, coarse_dims=4, mode="adc").collect()}
    # vectors 0 and 1 must pick each other, never the zero vector
    assert got[0]["neighbor_id"] == 1 and got[1]["neighbor_id"] == 0
    for r in got.values():
        assert not math.isnan(r["sim"])
    # the zero query's own sims are the -1.0 sentinel, not NaN
    if 2 in got:
        assert got[2]["sim"] == -1.0


def test_sq_roundtrip_error_bound_and_codes(spark):
    """Scalar int8 quantization: every code is in [0, 255], the
    reconstruction error respects the affine bound max_d(scale_d)/2
    (+ round-6 slack), a constant dimension round-trips EXACTLY (scale-1
    convention, code 0), and dequantization recovers endpoints exactly."""
    from warc_metadata_sidecar_spark.operators.pq import (
        sq_encode,
        sq_roundtrip,
        sq_scales,
        sq_train,
    )

    rows = [
        (0, [0.0, -5.0, 7.5, 3.25]),
        (1, [255.0, 5.0, 7.5, -1.5]),
        (2, [128.0, 0.0, 7.5, 0.75]),
    ]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    mins, maxs = sq_train(emb, dims=4)
    assert mins == [0.0, -5.0, 7.5, -1.5] and maxs == [255.0, 5.0, 7.5, 3.25]
    scales = sq_scales(mins, maxs)
    assert scales[2] == 1.0  # constant dim convention
    enc = {r["vec_id"]: r["codes"] for r in sq_encode(emb, mins, maxs).collect()}
    for codes in enc.values():
        assert all(0 <= c <= 255 for c in codes)
    # endpoints land exactly on codes 0 / 255; dim0 step is exactly 1.0
    assert enc[0][0] == 0 and enc[1][0] == 255 and enc[2][0] == 128
    assert enc[0][2] == enc[1][2] == 0  # constant dim -> code 0
    out = {r["vec_id"]: r for r in sq_roundtrip(emb, dims=4).collect()}
    bound = max(s for s in sq_scales(mins, maxs)) / 2 + 1e-6
    for r in out.values():
        assert r["max_abs_err"] <= bound
    # constant dim contributes zero error; endpoint vectors reconstruct
    # dim0 exactly, so vector 0's error comes only from dims 1/3
    assert out[2]["max_abs_err"] <= max(scales[1], scales[3]) / 2 + 1e-6
