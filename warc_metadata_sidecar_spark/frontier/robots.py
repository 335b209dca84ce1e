"""robots.txt parsing into the engine's robots table (N4).

The scheduler consumes (host, path_prefix, allowed, crawl_delay_s, budget)
rows; in production those come from fetched robots.txt bodies. This module
turns a (host, robots_txt) DataFrame into that table with NATIVE column
expressions — explode lines, regexp-extract directives, window-scope them
to the preceding `User-agent: *` group — no Python in the path.

Scope (documented subset of REP, RFC 9309): the `User-agent: *` group's
Disallow/Allow/Crawl-delay directives; an empty `Disallow:` means
allow-all; other agent groups, wildcards inside paths, and Sitemap lines
are ignored. `budget` is not a robots.txt concept — callers supply it
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

    # scope: lines belong to the most recent 'user-agent:' directive above
    # them; we keep only the wildcard group's lines
    agent = F.when(
        F.col("line").rlike(r"^user-agent\s*:"),
        F.trim(F.regexp_extract("line", r"^user-agent\s*:\s*(.*)$", 1)),
    )
    w = Window.partitionBy("host").orderBy("line_no").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scoped = lines.withColumn("agent", F.last(agent, ignorenulls=True).over(w)).filter(
        F.col("agent") == "*"
    )

    disallows = scoped.filter(F.col("line").rlike(r"^disallow\s*:")).select(
        "host",
        F.trim(F.regexp_extract("line", r"^disallow\s*:\s*(\S*)", 1)).alias("path_prefix"),
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
    return allow_rows.unionByName(deny_rows)
