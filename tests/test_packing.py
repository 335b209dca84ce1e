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
