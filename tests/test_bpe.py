"""Exact BPE tokenization (operators/bpe.py): distributed-trained merges,
Arrow-batched memoizing encoder, pinned to the standalone Python twin."""

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import driver_queries as dq
from warc_metadata_sidecar_spark.operators.bpe import (
    bpe_token_counts,
    encode_word,
    train_bpe,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def merges(docs):
    return train_bpe(docs, n_merges=60)


def test_matches_sequential_twin(spark):
    import duckdb

    twin = [tuple(r) for r in duckdb.sql(dq._bpe_token_counts_oracle_sql(SF_DIR)).fetchall()]
    eng = [tuple(r) for r in dq.bpe_token_counts_docs(spark, SF_DIR).collect()]
    assert eng == twin and len(eng) == 500


def test_merges_compress(spark, docs, merges):
    """More merges ⇒ no doc's token count grows, and the corpus total
    strictly shrinks; counts stay within [n_words, chars+words]."""
    few = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(docs, merges[:5]).collect()}
    many = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(docs, merges).collect()}
    assert all(many[d] <= few[d] for d in few)
    assert sum(many.values()) < sum(few.values())
    rows = bpe_token_counts(docs, merges).join(
        docs.select("doc_id", F.length("text").alias("chars")), "doc_id"
    ).collect()
    for r in rows:
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["chars"] + r["n_words"] + 1


def test_encode_word_greedy(spark, docs, merges):
    """encode_word is a pure function: zero merges = chars + </w>; the
    corpus's most frequent word compresses; unknown alphabets pass
    through unmerged."""
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("abc", {}) == ["a", "b", "c", "</w>"]
    top = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .groupBy("w").count().orderBy(F.desc("count")).first()["w"]
    )
    assert len(encode_word(top, ranks)) < len(top) + 1
    assert encode_word("ßßß", ranks) == ["ß", "ß", "ß", "</w>"]


def test_trainer_deterministic(spark, docs, merges):
    assert train_bpe(docs.repartition(7), n_merges=60) == merges
