"""Sequence packing — assembling tokenized documents into fixed-length
training sequences (the step between curation and the trainer's loader).

Two industry-standard disciplines:

* ``pack_chunked`` — GPT-style "concatenate then cut": within each group,
  documents are laid end-to-end in deterministic key order and the token
  stream is cut every ``seq_len`` tokens; documents may straddle a cut.
  The doc→chunk assignment is pure prefix-sum arithmetic, so it is fully
  native: one window cumsum plus a bounded explode over the chunk range a
  doc spans — no Python in the hot path, and the layout is a pure function
  of (group, key order), independent of partitioning and file splits.

* ``pack_greedy`` — first-fit-sequential without splitting documents:
  walk the group's docs in key order, open a new sequence whenever the
  next doc would overflow ``seq_len`` (an oversized doc rides alone).
  Inherently sequential per group, so it runs as ``applyInPandas`` over
  groups; each task holds only one group's token COUNTS (never text), so
  state is |group| longs and the shuffle is one hash exchange on the
  group key.

At 100 TB: ``n_groups`` partitions the corpus (scale it with the
cluster), chunked packing's only shuffle is the window exchange on
(group, key), and greedy's is the same single exchange. Dual-dialect
twin: driver_queries ``pack_chunked``; sequential twin: ``pack_greedy``
(VALUES oracle). tests/test_packing.py pins module == twin for both.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_layout(
    df: DataFrame, n_groups: int, key_col: str, text_col: str, n_tokens_col: str | None
):
    """(key, grp, n_toks, before): tokens laid end-to-end per group in key
    order; `before` is the group-stream offset where this doc starts."""
    toks = (
        F.col(n_tokens_col)
        if n_tokens_col
        else F.size(F.split(F.col(text_col), " "))
    ).cast("long")
    base = df.select(
        F.col(key_col).cast("long").alias("doc_id"),
        (F.col(key_col).cast("long") % n_groups).alias("grp"),
        toks.alias("n_toks"),
    ).where(F.col("n_toks") > 0)
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.withColumn("before", F.coalesce(F.sum("n_toks").over(w), F.lit(0)))


def pack_chunked(
    df: DataFrame,
    seq_len: int = 128,
    n_groups: int = 4,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """One row per (doc, chunk) span: grp, chunk_id, doc_id, off (token
    offset inside the doc where the span starts), span_len."""
    laid = _with_layout(df, n_groups, key_col, text_col, n_tokens_col)
    L = F.lit(int(seq_len))
    k0 = F.floor(F.col("before") / L)
    k1 = F.floor((F.col("before") + F.col("n_toks") - 1) / L)
    spans = laid.withColumn("chunk_id", F.explode(F.sequence(k0, k1)))
    start = F.greatest(F.col("chunk_id") * L, F.col("before"))
    end = F.least((F.col("chunk_id") + 1) * L, F.col("before") + F.col("n_toks"))
    return spans.select(
        "grp",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "doc_id",
        (start - F.col("before")).cast("long").alias("off"),
        (end - start).cast("long").alias("span_len"),
    )


def pack_greedy(
    df: DataFrame,
    seq_len: int = 128,
    n_groups: int = 4,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """One row per doc: grp, doc_id, seq_id, n_toks — first-fit-sequential
    bins in key order, never splitting a doc."""
    laid = _with_layout(df, n_groups, key_col, text_col, n_tokens_col).drop("before")

    def fill(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq, acc, out = 0, 0, []
        for n in pdf["n_toks"]:
            if acc > 0 and acc + n > seq_len:
                seq, acc = seq + 1, 0
            out.append(seq)
            acc += n
        pdf["seq_id"] = out
        return pdf[["grp", "doc_id", "seq_id", "n_toks"]]

    return laid.groupBy("grp").applyInPandas(
        fill, "grp long, doc_id long, seq_id long, n_toks long"
    )
