"""Main-content extraction — block-level text-density scoring.

Reference anchor: the sidecar treats a payload as one opaque string
(warc_metadata_sidecar.py:213 buffers the whole body; detectors look at
bytes, never structure). A training pipeline needs the OPPOSITE move:
drop chrome (nav bars, footers, link farms) and keep prose. This is the
jusText/readability family (Pomikálek 2011, public literature) reduced
to its load-bearing core — block segmentation + per-block link-density
and length gates — deliberately DOM-free so every step is a native
column expression (no HTML parser dependency, no Python in the loop):

  1. segment: split the page on block-level tag boundaries
     (</?p|div|td|section|article|h1-6|li|blockquote|ul|ol|table ...>)
  2. per block: visible text = strip remaining tags; link text = the
     inner text of <a> spans (regexp_extract_all + aggregate lengths)
  3. keep a block iff visible length >= min_chars AND
     link_chars * DEN <= visible_chars * NUM  (link-density <=
     max_link_density, CROSS-MULTIPLIED — integer compare, no float
     division, so the DuckDB oracle replicates it exactly)
  4. main_text = kept blocks re-joined in document order

Scale shape: one explode (posexplode of the split) + one groupBy(doc_id)
with map-side partial aggregation — linear, one exchange; the per-block
arithmetic is all JVM-side codegen (regexp/length/aggregate), zero
Python.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|td|th|section|article|h[1-6]|li|blockquote|ul|ol|"
    r"table|tr|br|header|footer|nav|aside)\b[^>]*>"
)
TAG_RE = r"<[^>]+>"
ANCHOR_INNER_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def split_blocks(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, block_idx, block) — raw block strings in document order."""
    return pages.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), BLOCK_SPLIT_RE)).alias(
            "block_idx", "block"
        ),
    )


def block_signals(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-block visibility/link metrics:
    (doc_id, block_idx, block_text, n_chars, link_chars).

    Anchor inner text is measured BEFORE tag stripping (the <a> spans are
    gone afterwards); tag stripping runs on the whole block so nested
    inline markup (<b>, <span>) never counts toward length."""
    blocks = split_blocks(pages, text_col)
    # pattern as a Column literal — an f-string into F.expr would need SQL
    # backslash escaping (\b in a SQL literal is a backspace)
    anchors = F.regexp_extract_all("block", F.lit(ANCHOR_INNER_RE), 1)
    link_chars = F.aggregate(
        anchors,
        F.lit(0),
        lambda acc, s: acc + F.length(F.trim(F.regexp_replace(s, TAG_RE, ""))),
    )
    block_text = F.trim(F.regexp_replace(F.col("block"), TAG_RE, ""))
    return blocks.select(
        "doc_id",
        "block_idx",
        block_text.alias("block_text"),
        F.length(block_text).alias("n_chars"),
        link_chars.cast("int").alias("link_chars"),
    )


def main_content(
    pages: DataFrame,
    text_col: str = "text",
    min_chars: int = 20,
    max_link_density: Fraction = Fraction(2, 5),
) -> DataFrame:
    """One row per page: (doc_id, main_text, n_blocks, n_kept).

    max_link_density is a Fraction so the gate stays an INTEGER
    cross-multiplied compare (link_chars * den <= n_chars * num) — no
    float division anywhere, the oracle-exactness discipline of
    operators/phash."""
    num, den = max_link_density.numerator, max_link_density.denominator
    sig = block_signals(pages, text_col)
    keep = (F.col("n_chars") >= min_chars) & (
        F.col("link_chars") * den <= F.col("n_chars") * num
    )
    scored = sig.withColumn("keep", keep)
    return scored.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct("block_idx", "block_text"),
                        )
                    )
                ),
                lambda s: s["block_text"],
            ),
        ).alias("main_text"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
    )
