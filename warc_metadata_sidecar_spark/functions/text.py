"""Text-analysis expression library for training-data pipelines.

All native column expressions (JVM-side, WholeStageCodegen) — language-ID,
quality scoring, token counting, and fingerprinting never leave the JVM.
These are the engine-API twins of the oracle-checked SQL in
driver_queries.py (lang_id_markers, text_quality, token_count_hist,
fingerprint_winnow).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language (closed set; the vectorized detector in
# functions/detectors.py is the UDF-grade variant with full profiles)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "les", "des", "une", "est"],
    "de": ["der", "die", "und", "nicht", "ein"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.split(text, r"\s+")


def bpe_ish_tokens_col(text: Column) -> Column:
    """BPE-ish subword-boundary token count: split on whitespace AND
    letter/digit/punct boundaries — a regex approximation of byte-pair
    pre-tokenization (GPT-2 style pre-tokenizer class split)."""
    return F.split(
        F.trim(F.regexp_replace(text, r"(\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+)", " $1 ")), r"\s+"
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def quality_score_col(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: rewards mid-length docs,
    token diversity, and alphabetic density; penalizes very short docs.
    (C4/Gopher-style rule-of-thumb scoring, expressed natively.)"""
    toks = tokens_col(text)
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(n, F.lit(1.0))
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^\p{L}]", "")).cast("double")
        / F.greatest(F.length(text).cast("double"), F.lit(1.0))
    )
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * distinct_ratio + F.lit(0.3) * alpha_ratio, 6
    )


def lang_guess_col(text: Column) -> Column:
    """argmax marker-hit language guess, 'und' when no marker fires."""
    words = F.array_distinct(F.split(F.lower(text), r"\s+"))
    scores = [
        (code, F.size(F.array_intersect(words, F.lit(list(markers)))))
        for code, markers in LANG_MARKERS.items()
    ]
    best = None
    best_code = F.lit("und")
    for code, score in scores:
        if best is None:
            best, best_code = score, F.when(score > 0, F.lit(code)).otherwise(F.lit("und"))
        else:
            best_code = F.when((score > best) & (score > 0), F.lit(code)).otherwise(best_code)
            best = F.greatest(best, score)
    return best_code


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-dedup key."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))


def winnow_fingerprints_col(text: Column, gram: int = 8, keep_mod: int = 16) -> Column:
    """Rolling-hash winnowing: md5 over each char `gram`-gram, keep hashes
    whose first hex nibble == 0 (1/keep_mod sample) — a content-defined
    fingerprint set robust to local edits. Native: sequence + transform."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (gram - 1), F.lit(1)))
    hashes = F.transform(idx, lambda i: F.md5(text.substr(i, F.lit(gram))))
    return F.filter(hashes, lambda h: F.substring(h, 1, 1) == F.lit("0"))


# PII scrubbing (training-data pipelines redact before training). The regex
# subset is deterministic and shared VERBATIM with the dual-dialect oracle
# (driver_queries pii_redaction): emails, dotted-quad IPs, and +?digit
# phone-ish runs of 7+ digits with optional separators.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d[\d() -]{5,}\d\b"


def redact_pii_col(text: Column) -> Column:
    """Emails -> <EMAIL>, IPs -> <IP>, phone-ish digit runs -> <PHONE>
    (applied in that order, all native regexp_replace)."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IP, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def pii_counts_col(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) per document, counted SEQUENTIALLY in
    redaction order (emails counted on raw text, IPs after email redaction,
    phones after both) so the counts equal exactly what redact_pii_col
    replaces — a digit run inside an email must not double-count as a
    phone."""

    def n(t: Column, pat: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))

    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IP, "<IP>")
    return n(text, PII_EMAIL), n(after_email, PII_IP), n(after_ip, PII_PHONE)


# --- dedup-key text canonicalization (r7) -----------------------------------
#
# The normalize-before-hash stage every exact/near dedup pass runs first
# (CCNet/Dolma normalize text before MinHashing; the reference sidecar
# hands text through verbatim — warc_metadata_sidecar.py:205 — so this
# extends the dedup family, not the sidecar parity surface):
#   1. Unicode NFC (precomposed form, so "e" + U+0301 == "é")
#   2. default Unicode lowercasing
#   3. zero-width / BOM / control characters stripped
#   4. all whitespace (incl. NBSP) collapsed to single spaces, trimmed
# Steps 2-4 are native JVM expressions; NFC has no Catalyst builtin, so
# it rides ONE Arrow-batched pandas UDF (unicodedata.normalize — the
# same UAX #15 algorithm DuckDB's nfc_normalize implements, which is
# what makes the oracle twin expressible).

_ZW_CONTROL = "[​‌‍﻿­\x00-\x08\x0e-\x1f\x7f]"
_WS_CLASS = "[ \t\n\r\x0b\x0c ]+"


def _nfc_udf():
    import pandas as pd  # noqa: F401 — annotation type for the UDF
    import unicodedata

    @F.pandas_udf("string")
    def nfc(s):  # type: ignore[no-untyped-def]
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return nfc


def normalize_dedup_key_col(text: Column) -> Column:
    """Canonical dedup-key form of `text` (see block comment above)."""
    nfc = _nfc_udf()
    lowered = F.lower(nfc(text))
    stripped = F.regexp_replace(lowered, _ZW_CONTROL, "")
    return F.trim(F.regexp_replace(stripped, _WS_CLASS, " "))
