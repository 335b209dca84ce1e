"""robots.txt parsing into the engine's robots table (N4).

The scheduler consumes (host, path_prefix, allowed, crawl_delay_s, budget)
rows; in production those come from fetched robots.txt bodies. This module
turns a (host, robots_txt) DataFrame into that table with NATIVE column
expressions — explode lines, regexp-extract directives, window-scope them
to their RFC 9309 group (consecutive User-agent lines = one group) — no
Python in the path.

Scope (REP, RFC 9309): Disallow/Allow/Crawl-delay directives of any group
that names `*` among its (possibly several) user-agent lines, with
longest-match precedence, `*` wildcards and trailing-`$` anchors evaluated
by the scheduler (scheduler.apply_robots); an empty `Disallow:` means
allow-all; groups naming only specific agents and Sitemap lines are
ignored. `budget` is not a robots.txt concept — callers supply it
(default politeness budget), like gen.robots does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.frontier.scheduler import DEFAULT_BUDGET


def parse_robots_txt(
    raw: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    default_budget: int = DEFAULT_BUDGET,
) -> DataFrame:
    """(host, robots_txt) -> robots table rows (schema.ROBOTS).

    Every host gets one allow-all row (carrying its crawl_delay, or 1 when
    unspecified) plus one deny row per `Disallow:` path in the wildcard
    group — exactly the shape scheduler.apply_robots/host_budgets join on.
    """
    lines = raw.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).withColumn("line", F.regexp_replace(F.trim(F.lower("line")), r"#.*$", ""))

    # scope (RFC 9309 §2.2.1): CONSECUTIVE user-agent lines form ONE group
    # whose rules apply to every listed agent — a group starts at a UA line
    # not directly preceded by another UA line, directives attach to the
    # latest group, and the group is wildcard-scoped if ANY of its UA lines
    # is '*' ('User-agent: *' + 'User-agent: foo' + 'Disallow: /x' must deny
    # /x for the wildcard crawler; last-UA-wins scoping lost that rule).
    is_ua = F.col("line").rlike(r"^user-agent\s*:")
    agent = F.when(
        is_ua, F.trim(F.regexp_extract("line", r"^user-agent\s*:\s*(.*)$", 1))
    )
    w_seq = Window.partitionBy("host").orderBy("line_no")
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = lines.withColumn("_is_ua", is_ua).withColumn(
        "_grp",
        F.sum(
            F.when(
                F.col("_is_ua") & ~F.coalesce(F.lag("_is_ua").over(w_seq), F.lit(False)),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    w_grp = Window.partitionBy("host", "_grp")
    scoped = (
        grouped.withColumn(
            "_star",
            F.max(F.when(F.col("_is_ua") & (agent == "*"), 1).otherwise(0)).over(w_grp),
        )
        # _grp > 0 drops rules preceding any user-agent line (invalid per
        # RFC 9309 — they belong to no group)
        .filter((F.col("_star") == 1) & (F.col("_grp") > 0) & ~F.col("_is_ua"))
        .drop("_is_ua", "_grp", "_star")
    )

    disallows = scoped.filter(F.col("line").rlike(r"^disallow\s*:")).select(
        "host",
        F.trim(F.regexp_extract("line", r"^disallow\s*:\s*(\S*)", 1)).alias("path_prefix"),
    )
    allows = scoped.filter(F.col("line").rlike(r"^allow\s*:")).select(
        "host",
        F.trim(F.regexp_extract("line", r"^allow\s*:\s*(\S*)", 1)).alias("path_prefix"),
    )
    delays = (
        scoped.filter(F.col("line").rlike(r"^crawl-delay\s*:"))
        .select(
            "host",
            F.regexp_extract("line", r"^crawl-delay\s*:\s*(\d+)", 1)
            .cast("int")
            .alias("crawl_delay_s"),
        )
        .groupBy("host")
        .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
    )

    hosts = raw.select(F.col(host_col).alias("host")).distinct()
    allow_rows = hosts.join(delays, "host", "left").select(
        "host",
        F.lit(None).cast("string").alias("path_prefix"),
        F.lit(True).alias("allowed"),
        F.coalesce("crawl_delay_s", F.lit(1)).alias("crawl_delay_s"),
        F.lit(default_budget).alias("budget"),
    )
    deny_rows = (
        disallows.filter(F.length("path_prefix") > 0)  # empty Disallow: allow-all
        .join(delays, "host", "left")
        .select(
            "host",
            "path_prefix",
            F.lit(False).alias("allowed"),
            F.coalesce("crawl_delay_s", F.lit(1)).alias("crawl_delay_s"),
            F.lit(default_budget).alias("budget"),
        )
        .distinct()
    )
    # RFC 9309 Allow rules: path-scoped allowed=true rows; the scheduler's
    # longest-match evaluation lets 'Allow: /a/ok' carve an exception out of
    # 'Disallow: /a'
    allow_path_rows = (
        allows.filter(F.length("path_prefix") > 0)
        .join(delays, "host", "left")
        .select(
            "host",
            "path_prefix",
            F.lit(True).alias("allowed"),
            F.coalesce("crawl_delay_s", F.lit(1)).alias("crawl_delay_s"),
            F.lit(default_budget).alias("budget"),
        )
        .distinct()
    )
    return allow_rows.unionByName(deny_rows).unionByName(allow_path_rows)


def extract_sitemaps(
    raw: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """`Sitemap:` directives from robots.txt bodies: (host, sitemap_url).

    RFC 9309 §2.3 / sitemaps.org: Sitemap lines live OUTSIDE user-agent
    groups and carry absolute URLs, so extraction is line-scoped — no
    group machinery. The directive name matches case-insensitively but the
    URL is taken VERBATIM from the raw line (paths are case-sensitive;
    parse_robots_txt's lowercasing pipeline must not touch it). Distinct
    per (host, url) — duplicate directives collapse. Native expressions
    only; at 100 TB this is a projection + one distinct on a tiny output
    (hosts x few sitemaps)."""
    lines = raw.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    url = F.trim(F.regexp_extract("line", r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$", 1))
    return (
        lines.select("host", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def extract_sitemap_locs(
    fetched: DataFrame, url_col: str = "sitemap_url", text_col: str = "body"
) -> DataFrame:
    """<loc> entries from fetched sitemap XML: one row per loc —
    (sitemap_url, loc, is_index). is_index marks a <sitemapindex> document
    (its locs are MORE SITEMAPS to fetch, not pages — the caller loops:
    index locs feed the next fetch round, urlset locs feed the frontier;
    sitemap indexes nest at most one level per the spec, so the loop is
    bounded). Whitespace inside <loc> is trimmed per the spec; entities
    are left as-is (sitemaps.org requires entity-escaped URLs — callers
    unescape at canonicalization). Native: one regexp_extract_all +
    posexplode, no XML parser in the hot path."""
    locs = F.expr(
        f"regexp_extract_all({text_col}, '<loc>\\\\s*([^<]+?)\\\\s*</loc>', 1)"
    )
    return (
        fetched.select(
            F.col(url_col).alias("sitemap_url"),
            F.col(text_col).contains("<sitemapindex").alias("is_index"),
            F.posexplode(locs).alias("pos", "loc"),
        )
        .select("sitemap_url", F.trim("loc").alias("loc"), "is_index", "pos")
    )
