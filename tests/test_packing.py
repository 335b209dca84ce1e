"""Sequence packing (operators/packing.py): GPT-style chunked layout and
first-fit-sequential greedy bins, pinned to their driver twins plus the
tiling/bound invariants a trainer's loader depends on."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import driver_queries as dq
from warc_metadata_sidecar_spark.operators.packing import pack_chunked, pack_greedy

SF_DIR = "/root/testdata/sf0.001"
SEQ_LEN = 128


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chunked_matches_twin(spark, docs):
    dq.register_views(spark, SF_DIR)
    twin = _rows(spark.sql(dq.spark_sql_for("pack_chunked")))
    mod = _rows(pack_chunked(docs, seq_len=SEQ_LEN, n_groups=4))
    assert mod == twin and len(mod) > 0


def test_greedy_matches_sequential_twin(spark, docs):
    import duckdb

    twin = sorted(
        tuple(r) for r in duckdb.sql(dq._pack_greedy_oracle_sql(SF_DIR)).fetchall()
    )
    mod = _rows(pack_greedy(docs, seq_len=SEQ_LEN, n_groups=4))
    assert mod == twin and len(mod) > 0


def test_chunks_tile_exactly(spark, docs):
    """Every chunk except each group's last holds exactly seq_len tokens,
    and each doc's spans tile the doc: contiguous offsets summing to its
    token count."""
    spans = pack_chunked(docs, seq_len=SEQ_LEN, n_groups=4).cache()
    fills = (
        spans.groupBy("grp", "chunk_id")
        .agg(F.sum("span_len").alias("fill"))
        .withColumn(
            "is_last",
            F.col("chunk_id") == F.max("chunk_id").over(Window.partitionBy("grp")),
        )
        .collect()
    )
    for r in fills:
        if not r["is_last"]:
            assert r["fill"] == SEQ_LEN, r
        else:
            assert 0 < r["fill"] <= SEQ_LEN
    per_doc = (
        spans.groupBy("grp", "doc_id")
        .agg(
            F.sum("span_len").alias("tot"),
            F.min("off").alias("off0"),
            F.count("*").alias("n_spans"),
        )
        .collect()
    )
    n_toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    for r in per_doc:
        assert r["tot"] == n_toks[r["doc_id"]]
        assert r["off0"] == 0


def test_partitioning_invariance(spark, docs):
    base_c = _rows(pack_chunked(docs.coalesce(1), seq_len=SEQ_LEN))
    base_g = _rows(pack_greedy(docs.coalesce(1), seq_len=SEQ_LEN))
    shuffled = docs.repartition(7).orderBy(F.desc("doc_id"))
    assert _rows(pack_chunked(shuffled, seq_len=SEQ_LEN)) == base_c
    assert _rows(pack_greedy(shuffled, seq_len=SEQ_LEN)) == base_g


def test_greedy_respects_bound_and_order(spark, docs):
    out = pack_greedy(docs, seq_len=SEQ_LEN, n_groups=4).cache()
    per_seq = (
        out.groupBy("grp", "seq_id")
        .agg(F.sum("n_toks").alias("fill"), F.count("*").alias("n_docs"))
        .collect()
    )
    for r in per_seq:
        # a sequence only exceeds the budget when it is one oversized doc
        assert r["fill"] <= SEQ_LEN or r["n_docs"] == 1, r
    # seq_id is non-decreasing in doc_id within a group (first-fit walk)
    rows = sorted(
        (r["grp"], r["doc_id"], r["seq_id"]) for r in out.collect()
    )
    last: dict = {}
    for g, d, s in rows:
        assert s >= last.get(g, 0)
        last[g] = s


def test_chunked_single_exchange(spark, docs):
    """The layout costs exactly one shuffle: the window's hash exchange on
    grp. No join, no extra repartition."""
    # seq_len distinct from every other test so Spark's cache manager can't
    # substitute a previously-cached identical spans frame (which would
    # serve the query from InMemoryTableScan and hide the exchange)
    plan = (
        pack_chunked(docs, seq_len=96)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_plan_batches_and_balanced_shards_hand_computed(spark):
    """operators/batching: bucket boundaries (15->0, 16->1, 31->1,
    32->2), batch fill order + cross-bucket unique batch ids, pad-waste
    bound (a batch's members differ by <= bucket width), and the
    round-robin token balance of balanced_shards."""
    from warc_metadata_sidecar_spark.operators.batching import (
        balanced_shards,
        plan_batches,
    )

    rows = [(i, t) for i, t in enumerate([3, 15, 16, 17, 31, 32, 40, 200, 18, 19])]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["bucket"], r["batch_id"], r["pos"])
        for r in plan_batches(docs, batch_size=2).collect()
    }
    assert got[0][0] == 0 and got[1][0] == 0          # <16 -> bucket 0
    assert got[2][0] == 1 and got[4][0] == 1          # [16,32) -> bucket 1
    assert got[5][0] == 2 and got[6][0] == 2          # [32,64) -> bucket 2
    assert got[7][0] == 4                             # 200 in [128,256)
    # bucket 1 holds 16,17,18,19,31: batches (16,17), (18,19), (31)
    b1 = sorted((t, got[i]) for i, t in rows if got[i][0] == 1)
    assert [x[1][2] for x in b1] == [0, 1, 0, 1, 0]
    assert b1[0][1][1] == b1[1][1][1] != b1[2][1][1]
    # batch ids are globally unique across buckets
    ids = {}
    for i, _t in rows:
        ids.setdefault(got[i][1], set()).add(got[i][0])
    assert all(len(v) == 1 for v in ids.values())

    sh = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(docs, n_shards=2).collect()
    }
    # bucket 1 by tokens desc: 31,19,18,17,16 -> shards 0,1,0,1,0
    assert [sh[i] for i in (4, 9, 8, 3, 2)] == [0, 1, 0, 1, 0]
