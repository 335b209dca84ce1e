"""Unigram-LM Viterbi segmentation (operators/unigram.py): hand-computed
splits, the smallest-i (greedy-long) tie rule, UNK fallback totality, and
the distinct-word-memoized distributed accounting."""

from __future__ import annotations

from warc_metadata_sidecar_spark.operators.unigram import (
    UNK_LOGP,
    unigram_token_counts,
    viterbi_segment,
)


def test_viterbi_hand_computed():
    pieces = {"a": -8.0, "b": -8.01, "c": -8.02, "ab": -3.0, "bc": -3.1,
              "abc": -2.0, "the": -2.5, "t": -8.2, "h": -8.3, "e": -8.4}
    assert viterbi_segment("abc", pieces) == ["abc"]           # -2.0 beats all
    assert viterbi_segment("abca", pieces) == ["abc", "a"]     # -10.0
    assert viterbi_segment("thea", pieces) == ["the", "a"]
    # 'ab'+'c' (-11.02) vs 'a'+'bc' (-11.1): ab+c wins
    assert viterbi_segment("abc", {k: v for k, v in pieces.items() if k != "abc"}) == ["ab", "c"]


def test_viterbi_tie_prefers_longest_final_piece():
    # both splits score exactly -6.0: x(-3.0)+yz(-3.0) vs xy(-3.0)+z(-3.0).
    # ascending-i strict-> keeps the SMALLEST i at the last position ->
    # the LONGER final piece 'yz'
    pieces = {"x": -3.0, "yz": -3.0, "xy": -3.0, "z": -3.0, "y": -50.0}
    assert viterbi_segment("xyz", pieces) == ["x", "yz"]


def test_viterbi_unk_totality():
    pieces = {"a": -5.0}
    assert viterbi_segment("aqa", pieces) == ["a", "q", "a"]
    assert viterbi_segment("", pieces) == []
    # an unknown MULTI-char run segments char by char, each at UNK_LOGP
    assert viterbi_segment("qq", pieces) == ["q", "q"]
    assert UNK_LOGP < min(-5.0, -8.0)


def test_unigram_token_counts_memoized_weighting(spark):
    """Counts weight each DISTINCT word's single segmentation by its
    corpus frequency; hand-checked against scalar segmentation."""
    pieces = {"a": -8.0, "b": -8.01, "ab": -3.0, "ba": -3.05, "c": -8.02}
    docs = spark.createDataFrame(
        [(1, "ab ab c"), (2, "AB c!c"), (3, "bab")],
        "doc_id long, text string",
    )
    got = {
        r["piece"]: r["n"]
        for r in unigram_token_counts(docs, pieces).collect()
    }
    # words: ab x3, c x3, bab x1; bab -> b+ab (-11.01) vs ba+b (-11.06)
    assert got == {"ab": 4, "c": 3, "b": 1}
