"""Intra-document repetition filters (the Gopher curation rules: Rae et
al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", App. A1.1) — the standard quality gate a training-data
pipeline runs alongside dedup and the LM perplexity gate.

Signals (word-fraction adaptation of the paper's character-fraction
rules, thresholds kept at the paper's values — documented deviation):

- ``top2_frac``: occurrences of the most frequent word 2-gram / total
  2-grams (paper rule: drop > 0.20 — boilerplate/navigation pages).
- ``dup5_frac``: fraction of word 5-grams that are repeats of an earlier
  5-gram, 1 - distinct/total (paper rule: drop > 0.15 — templated spam).
- ``keep``: both thresholds pass.

Spark-first shape: position explode (whole-stage codegen) -> groupBy
(doc_id, gram) with map-side partial aggregation — duplicate grams
collapse within each partition, so the shuffle carries per-doc DISTINCT
grams, not per-position rows — then one groupBy(doc_id) rollup per leg
and a doc_id-co-partitioned join (both sides exit their aggregation
hash-partitioned by doc_id, so AQE reuses the exchange). No UDFs, no
per-doc quadratic HOFs.

Documents with < 5 words have no 5-grams and are dropped from the output
(the SQL twin drops them identically). The dual-dialect twin is
driver_queries._Q["gopher_repetition"]; tests/test_module_oracle_parity
pins this module to the twin's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP2_MAX = 0.20
DUP5_MAX = 0.15


def _gram_positions(n: int) -> str:
    """Positions column for word n-grams of the `ws` array (callers
    guarantee size(ws) >= n, so the sequence() bound is ascending)."""
    return f"transform(sequence(1, size(ws) - {n - 1}), i -> concat_ws(' ', slice(ws, i, {n})))"


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, n_words, top2_frac, dup5_frac, keep — the Gopher repetition
    gate over whitespace words."""
    w = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("ws")
    ).where(F.size("ws") >= 5)

    g2 = (
        w.select("doc_id", F.explode(F.expr(_gram_positions(2))).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n2"),
            F.max("cnt").alias("m2"),
        )
    )
    g5 = (
        w.select("doc_id", F.explode(F.expr(_gram_positions(5))).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n5"),
            F.count(F.lit(1)).cast("double").alias("d5"),
        )
    )
    nw = w.select("doc_id", F.size("ws").cast("bigint").alias("n_words"))
    top2 = F.round(F.col("m2") / F.col("n2"), 4)
    dup5 = F.round(1 - F.col("d5") / F.col("n5"), 4)
    return (
        nw.join(g2, "doc_id")
        .join(g5, "doc_id")
        .select(
            "doc_id",
            "n_words",
            top2.alias("top2_frac"),
            dup5.alias("dup5_frac"),
            ((top2 <= TOP2_MAX) & (dup5 <= DUP5_MAX)).alias("keep"),
        )
        .orderBy("doc_id")
    )
