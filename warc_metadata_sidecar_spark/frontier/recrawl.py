"""Adaptive recrawl scheduling from observed change history.

Reference anchor: the reference processes each WARC snapshot
independently (warc_metadata_sidecar.py has no cross-crawl state); a
production frontier must decide WHEN to refetch — pages that change
every crawl deserve short revisit intervals, static pages long ones
(the freshness-policy family of Cho & Garcia-Molina, "Effective Page
Refresh Policies for Web Crawlers", TODS 2003 — public literature, the
estimator here is the simple smoothed change-rate form, not their
Poisson MLE).

Semantics (integer-exact, so the DuckDB oracle restates them verbatim):

  per url over (round, digest) history ordered by round:
    n_obs     = observations
    n_changes = rounds whose digest differs from the PREVIOUS round's
    interval  = clamp( (n_obs + 1) // (n_changes + 1), 1, max_interval )
                -- Laplace-smoothed inverse change rate, integer division
    next_due  = last_round + interval
    overdue   = next_due <= horizon_round

Scale shape: ONE lag window + ONE aggregate, both keyed on url — the
groupBy reuses the window's hash partitioning, so the whole schedule is
a single exchange over the history table; no self-join, no collect.
History at 10^10 URLs x K crawls is the big input; everything here is
linear in it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    history: DataFrame, horizon_round: int, max_interval: int = 8
) -> DataFrame:
    """history (url, round, digest) -> one schedule row per url:
    (url, n_obs, n_changes, last_round, interval, next_due, overdue)."""
    w = Window.partitionBy("url").orderBy("round")
    changed = (
        F.col("digest") != F.lag("digest").over(w)
    ).cast("int")  # first observation has no predecessor -> null -> 0
    obs = history.select(
        "url", "round", F.coalesce(changed, F.lit(0)).alias("chg")
    )
    agg = obs.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("chg").cast("long").alias("n_changes"),
        F.max("round").cast("long").alias("last_round"),
    )
    interval = F.least(
        F.lit(max_interval),
        F.greatest(
            F.lit(1),
            F.expr("(n_obs + 1) div (n_changes + 1)"),  # integral div, no
            # double round-trip — bit-safe at any observation count
        ),
    ).cast("long")
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        "last_round",
        interval.alias("interval"),
        (F.col("last_round") + interval).alias("next_due"),
        (F.col("last_round") + interval <= F.lit(horizon_round)).alias("overdue"),
    )


def due_frontier(schedule: DataFrame, horizon_round: int) -> DataFrame:
    """Overdue URLs as a refetch frontier — closes the loop
    crawl -> change history -> recrawl_schedule -> next crawl's seeds.

    priority = staleness (horizon - next_due; the longer overdue, the
    higher) so the politeness scheduler's per-host window naturally
    refetches the most stale first; discovery_round = the horizon (the
    round that decided to refetch). Pure projection over the schedule —
    no shuffle beyond recrawl_schedule's single exchange."""
    return schedule.filter(F.col("next_due") <= F.lit(horizon_round)).select(
        "url",
        (F.lit(horizon_round) - F.col("next_due")).cast("long").alias("priority"),
        F.lit(horizon_round).cast("int").alias("discovery_round"),
        "n_changes",
        "last_round",
    )
