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


def _train_py(wc: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Standalone merge loop (same (-count, pair) tie-break as the
    trainer) over an explicit word->count table."""
    vocab = {tuple(w) + ("</w>",): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        vocab = new
    return merges


def test_vocab_cap_bounds_driver_state(spark):
    """VERDICT r6 task 2: training on a vocabulary LARGER than max_vocab
    must (a) collect only the deterministic md5-sample survivors and
    (b) produce exactly the merges a sequential twin trains on that same
    surviving sample — the bounded-collect contract."""
    import hashlib
    import re

    rows = [
        (i, f"tok{i}ab tok{i}ab shared tail{i % 7}") for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    capped = train_bpe(docs, n_merges=20, max_vocab=64)

    wc: dict[str, int] = {}
    for _i, text in rows:
        for w in re.split(r"\s+", text):
            if w:
                wc[w] = wc.get(w, 0) + 1
    sample_mod = -(-len(wc) // 64)
    assert sample_mod > 1
    surv = {
        w: c
        for w, c in wc.items()
        if int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % sample_mod == 0
    }
    assert 0 < len(surv) < len(wc)
    assert capped == _train_py(surv, 20)


def test_min_count_prunes_tail(spark):
    """min_count drops hapax words from training; the merges equal a twin
    trained on the pruned table only."""
    rows = [(0, "aa aa aa bb bb zz"), (1, "aa bb qq"), (2, "aa aa yy")]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    pruned = train_bpe(docs, n_merges=10, min_count=2)
    assert pruned == _train_py({"aa": 6, "bb": 3}, 10)
