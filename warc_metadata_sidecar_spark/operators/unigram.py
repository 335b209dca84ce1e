"""Unigram-LM subword segmentation (the SentencePiece/Kudo-2018 apply
path) + distributed token accounting.

Reference anchor: the reference never tokenizes (warc_metadata_sidecar.py
treats payloads as opaque strings); a training-data pipeline tokenizes
EVERYTHING, and the unigram model (Kudo, "Subword Regularization", ACL
2018 — public literature) is the BPE alternative used by SentencePiece.
This module implements the deterministic APPLY path — Viterbi
segmentation against a given piece table — not the EM trainer: at corpus
scale you train once (sampled) and apply everywhere, and the apply path
is the 100 TB cost.

Determinism contract (the oracle twin replays it exactly):

- best[j] = max over i < j, word[i:j] in pieces, of best[i] + logp —
  scanned with i ASCENDING and a STRICT > update, so equal scores keep
  the SMALLEST i (= the longest final piece; ties resolve greedy-long,
  the same rule at every position);
- a character absent from the piece table segments as itself with
  UNK_LOGP (constant), so segmentation is total;
- floats: the DP adds the same literal float64 values in the same order
  on both sides — bit-identical, no rounding contract needed.

Scale shape (unigram_token_counts): the BPE-encode discipline — words
are counted first (one exchange), Viterbi runs ONCE per DISTINCT word
inside an Arrow-batched pandas UDF (Python cost O(distinct words), not
O(corpus)), pieces explode and aggregate map-side (second exchange).
The piece table travels as a plain Python dict into the UDF closure —
vocabulary-sized (tens of thousands), the same bound as the broadcast
BPE merges table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

UNK_LOGP = -20.0


def viterbi_segment(word: str, pieces: dict[str, float], max_piece_len: int = 8) -> list[str]:
    """Deterministic Viterbi split of one word (see module contract)."""
    n = len(word)
    if n == 0:
        return []
    best = [0.0] + [float("-inf")] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = pieces.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = UNK_LOGP
                else:
                    continue
            score = best[i] + lp
            if score > best[j]:
                best[j] = score
                back[j] = (i, piece)
    out: list[str] = []
    j = n
    while j > 0:
        i, piece = back[j]  # total segmentation: back[j] always set
        out.append(piece)
        j = i
    out.reverse()
    return out


def unigram_token_counts(
    docs: DataFrame,
    pieces: dict[str, float],
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """(piece, n) corpus piece frequencies under Viterbi segmentation.

    Words = lowercase \\w+ runs (the repo's tokenization convention);
    Viterbi runs once per DISTINCT word, weighted by its corpus count."""
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^\w]+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )

    schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_p: list[str] = []
            out_n: list[int] = []
            for word, wc in zip(pdf["word"], pdf["wc"]):
                for piece in viterbi_segment(word, pieces, max_piece_len):
                    out_p.append(piece)
                    out_n.append(int(wc))
            yield pd.DataFrame({"piece": out_p, "n": out_n})

    per_word = words.mapInPandas(batches, schema)
    return per_word.groupBy("piece").agg(F.sum("n").cast("long").alias("n"))
