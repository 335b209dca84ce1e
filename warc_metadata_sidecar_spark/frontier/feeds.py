"""RSS/Atom feed discovery — the syndication surfaces a crawler polls
for freshness (the recrawl scheduler's push-style complement): feed
ENDPOINTS declared in page HTML, and item/entry URLs inside the feed
XML itself. The reference has no discovery stage (per-record loop,
warc_metadata_sidecar.py:205); this extends the N5 family next to
extract_hrefs / sitemap discovery, reusing the SAME base-tag + RFC 3986
resolution machinery (frontier/crawl._with_base_cols/_resolve_refs).

Parsed subset (documented contract, native regexp only — no XML parser
in the image, and feeds in the wild are rarely well-formed anyway):
  * endpoint discovery: `<link ...>` elements whose type attribute is
    application/rss+xml or application/atom+xml, href in any attribute
    order; resolution honors a `<base href>` like every other surface.
  * RSS items: `<item> ... <link>URL</link> ... </item>` (element text
    form, whitespace-tolerant).
  * Atom entries: `<entry> ... <link ... href="URL"> ... </entry>`,
    excluding rel values other than alternate (rel omitted = alternate,
    the Atom default).

Scale shape: both extractors are projection + explode per match — no
shuffle; dedup/aggregation is the caller's one exchange. Feed XML rides
the text column, never raw payload bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.frontier.crawl import (
    _resolve_refs,
    _with_base_cols,
)


def extract_feed_urls(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(parent_url, url, feed_kind) for every feed `<link>` declared in
    the page head; feed_kind in ('rss', 'atom')."""
    staged = pages.select(
        F.col(url_col).alias("parent_url"), F.col(html_col).alias("_text")
    ).select(
        "parent_url",
        F.regexp_extract(
            F.col("_text"),
            r"""(?i)<base\s[^>]*?href\s*=\s*["']([^"'#>]+)""",
            1,
        ).alias("_base_href"),
        F.col("_text").alias("_stripped"),
    )
    links = F.regexp_extract_all(
        F.col("_stripped"), F.lit(r"(?is)<link\s[^>]*>"), F.lit(0)
    )
    rows = (
        staged.select("parent_url", "_base_href", F.explode(links).alias("_m"))
        .withColumn(
            "feed_kind",
            F.lower(
                F.regexp_extract(
                    F.col("_m"),
                    r"""(?i)type\s*=\s*["']application/(rss|atom)\+xml["']""",
                    1,
                )
            ),
        )
        .filter(F.col("feed_kind") != "")
        .withColumn(
            "_href",
            F.regexp_extract(
                F.col("_m"), r"""(?is)href\s*=\s*["']([^"'#>]+)""", 1
            ),
        )
        .filter(F.col("_href") != "")
        .drop("_m")
    )
    return _resolve_refs(_with_base_cols(rows), extra=("feed_kind",))


def extract_feed_items(
    feeds: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, url, feed_kind) for every RSS `<item><link>` /
    Atom `<entry><link href>` in the feed bodies; item URLs resolve
    against the feed URL (they are usually absolute already)."""
    staged = feeds.select(
        F.col(url_col).alias("parent_url"), F.col(xml_col).alias("_text")
    ).withColumn("_base_href", F.lit(""))
    rss = (
        staged.select(
            "parent_url",
            "_base_href",
            F.explode(
                F.regexp_extract_all(
                    F.col("_text"), F.lit(r"(?is)<item[\s>].*?</item>"), F.lit(0)
                )
            ).alias("_m"),
        )
        .withColumn(
            "_href",
            F.regexp_extract(
                F.col("_m"), r"(?is)<link\s*>\s*([^<\s][^<]*?)\s*</link>", 1
            ),
        )
        .withColumn("feed_kind", F.lit("rss"))
        .select("parent_url", "_base_href", "_href", "feed_kind")
    )
    atom = (
        staged.select(
            "parent_url",
            "_base_href",
            F.explode(
                F.regexp_extract_all(
                    F.col("_text"), F.lit(r"(?is)<entry[\s>].*?</entry>"), F.lit(0)
                )
            ).alias("_m"),
        )
        # an entry may carry several <link> elements (self, alternate,
        # enclosure...) — explode them all, then apply the rel rule:
        # rel omitted = alternate (the Atom default); other rels drop
        .select(
            "parent_url",
            "_base_href",
            F.explode(
                F.regexp_extract_all(
                    F.col("_m"),
                    F.lit(r"""(?is)<link\s[^>]*?href\s*=\s*["'][^"']+["'][^>]*>"""),
                    F.lit(0),
                )
            ).alias("_link"),
        )
        .filter(
            ~F.col("_link").rlike(r"""(?i)rel\s*=\s*["']""")
            | F.col("_link").rlike(r"""(?i)rel\s*=\s*["']alternate["']""")
        )
        .withColumn(
            "_href",
            F.regexp_extract(
                F.col("_link"), r"""(?is)href\s*=\s*["']([^"'#>]+)""", 1
            ),
        )
        .withColumn("feed_kind", F.lit("atom"))
        .select("parent_url", "_base_href", "_href", "feed_kind")
    )
    both = rss.unionByName(atom).filter(F.col("_href") != "")
    out = _resolve_refs(_with_base_cols(both), extra=("feed_kind",))
    return out.withColumnRenamed("parent_url", "feed_url")
