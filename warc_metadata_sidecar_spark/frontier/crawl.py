"""The iterative crawl driver: rounds of select -> fetch -> annotate ->
discover -> checkpoint (N5/N6/N7).

Iterative batch over table snapshots, not Structured Streaming: the north
rule demands reproducible crawl ordering, and deterministic rounds make
ordering a pure data property (SURVEY.md §1.2, §7.4). Each round is one
Spark job; the driver loop only moves tiny metric scalars — all row data
stays distributed.

Checkpoint/lineage (N6): every round writes frontier/seen/schedule parquet
snapshots under out_dir/round=R/ (parquet `_SUCCESS` markers give atomic
visibility) plus a lineage row (round, rows in/out, per-partition skew
stats). `resume_round` finds the latest complete snapshot; re-running the
loop from there reproduces the identical schedule because no state lives
outside the snapshots.

"Fetch" in the sandbox is an equi-join against the synthetic documents
corpus (N5 — no network); discovered links are a pure function of the
fetched page id, mirrored bit-for-bit by the single-threaded simulator.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.frontier.canonical import canonicalize
from warc_metadata_sidecar_spark.frontier.scheduler import DEFAULT_BUDGET, select_and_carry
from warc_metadata_sidecar_spark.frontier.seen import Bloom, build_bloom, filter_new

# deterministic link model: page p links to (p*31+17)%N, (p*57+5)%N,
# (p*91+1)%N in the same 50-host universe (simulator twin in simulator.py)
LINK_MULTS = (31, 57, 91)
LINK_ADDS = (17, 5, 1)


def extract_links(fetched: DataFrame, universe: int) -> DataFrame:
    """Discovered URLs from fetched pages — native expressions only."""
    page = F.regexp_extract(F.col("url"), r"/page/(\d+)$", 1).cast("long")
    links = F.array(
        *[
            (page * F.lit(m) + F.lit(a)) % F.lit(universe)
            for m, a in zip(LINK_MULTS, LINK_ADDS)
        ]
    )
    return (
        fetched.select(F.col("url").alias("parent_url"), F.explode(links).alias("p"))
        .select(
            F.format_string(
                "https://host%02d.example.com/page/%d", (F.col("p") % 50).cast("int"), F.col("p")
            ).alias("url"),
            "parent_url",
        )
    )


@dataclass
class RoundMetrics:
    round: int
    candidates: int
    selected: int
    fetched: int
    new_links: int
    seen_after: int
    max_partition_rows: int = 0
    min_partition_rows: int = 0


@dataclass
class CrawlResult:
    schedule: DataFrame  # (round, canonical_url, host, url, priority, rnk)
    seen: DataFrame  # (canonical_url, first_round)
    annotated: DataFrame | None
    lineage: list[RoundMetrics] = field(default_factory=list)


def _skew_stats(df: DataFrame, key: str = "host_salt") -> tuple[int, int]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
        .first()
    )
    return (rows.mx or 0, rows.mn or 0)


def _ckpt_dir(out_dir: str, rnd: int, name: str) -> str:
    return os.path.join(out_dir, f"round={rnd}", name)


def resume_round(spark: SparkSession, out_dir: str) -> int:
    """Latest round R with complete snapshots, or -1. Complete = parquet
    _SUCCESS marker present for both frontier and seen."""
    best = -1
    if not os.path.isdir(out_dir):
        return best
    for entry in os.listdir(out_dir):
        if entry.startswith("round="):
            rnd = int(entry.split("=")[1])
            if all(
                os.path.exists(os.path.join(out_dir, entry, name, "_SUCCESS"))
                for name in ("frontier", "seen")
            ):
                best = max(best, rnd)
    return best


def run_crawl(
    spark: SparkSession,
    documents: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    rounds: int = 3,
    universe: int = 1000,
    default_budget: int = DEFAULT_BUDGET,
    use_bloom: bool = True,
    annotate: bool = False,
    media: DataFrame | None = None,
    out_dir: str | None = None,
) -> CrawlResult:
    """Run `rounds` politeness rounds from `seeds` over the documents corpus.

    Every round:
      1. canonicalize frontier (N1)
      2. URL-seen filter: bloom prefilter + exact anti-join (N2)
      3. politeness selection: robots deny + per-host budget window (N3/N4)
      4. fetch = equi-join into documents on url (N5)
      5. sidecar-annotate fetched rows (the §2a stage) when annotate=True
      6. discover links -> next round's frontier appends (N7: appends are
         repartitioned on canonical-url hash via host_salt)
      7. checkpoint + lineage (N6)
    """
    empty_seen = spark.createDataFrame([], "canonical_url string, first_round int")

    start_round = 0
    if out_dir is not None:
        done = resume_round(spark, out_dir)
        if done >= 0:
            start_round = done + 1
            frontier = spark.read.parquet(_ckpt_dir(out_dir, done, "frontier"))
            seen = spark.read.parquet(_ckpt_dir(out_dir, done, "seen"))
        else:
            frontier = canonicalize(seeds)
            seen = empty_seen
    else:
        frontier = canonicalize(seeds)
        seen = empty_seen

    fetch_target = documents.select(
        "url", F.col("doc_id").alias("f_doc_id"), F.col("spans").alias("f_spans")
    )
    schedules: list[DataFrame] = []
    annotated_parts: list[DataFrame] = []
    lineage: list[RoundMetrics] = []

    for rnd in range(start_round, rounds):
        # N2: bloom built from the CURRENT seen set (refreshed per round —
        # the real deployment persists filter shards in a `filters` table)
        bloom: Bloom | None = None
        if use_bloom and seen.limit(1).count() > 0:
            bloom = build_bloom(seen)
        new_candidates = filter_new(spark, frontier, seen, bloom)

        selected, carryover = select_and_carry(
            new_candidates, robots, default_budget, round_no=rnd
        )
        selected = selected.withColumn("round", F.lit(rnd))
        # materialize: selected feeds seen, fetch, and the returned schedule;
        # carryover re-enters the next round's frontier (queue semantics)
        selected = selected.localCheckpoint(eager=True)
        carryover = carryover.localCheckpoint(eager=True)
        n_candidates = new_candidates.count()
        n_selected = selected.count()

        fetched = selected.join(fetch_target, "url", "inner")
        n_fetched = fetched.count()

        if annotate and n_fetched:
            from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows

            docs_for_round = documents.join(
                selected.select("url").distinct(), "url", "left_semi"
            )
            annotated_parts.append(sidecar_rows(docs_for_round, media))

        links = extract_links(fetched, universe)
        new_frontier = canonicalize(
            links.select(
                "url",
                F.lit(None).cast("string").alias("canonical_url"),
                F.lit(None).cast("string").alias("host"),
                F.lit(None).cast("int").alias("host_salt"),
                F.lit(None).cast("double").alias("priority"),
                F.lit(rnd + 1).alias("discovery_round"),
                F.lit(0).cast("long").alias("seq"),
                "parent_url",
            )
        )
        n_links = new_frontier.count()

        seen = seen.unionByName(
            selected.select("canonical_url", F.col("round").alias("first_round"))
        ).localCheckpoint(eager=True)
        # N7: keep the frontier partitioned on the salted url-hash key so the
        # next round's dedup groupBy reuses the partitioning; carryover rows
        # (budget overflow + crawl-delay-gated hosts) re-enter the queue
        frontier = (
            new_frontier.unionByName(
                carryover.withColumn("parent_url", F.lit(None).cast("string")),
                allowMissingColumns=True,
            )
            .repartition(max(spark.sparkContext.defaultParallelism, 4), "host_salt")
            .localCheckpoint(eager=True)
        )

        mx, mn = _skew_stats(frontier)
        lineage.append(
            RoundMetrics(
                round=rnd,
                candidates=n_candidates,
                selected=n_selected,
                fetched=n_fetched,
                new_links=n_links,
                seen_after=seen.count(),
                max_partition_rows=mx,
                min_partition_rows=mn,
            )
        )
        schedules.append(selected)

        if out_dir is not None:
            frontier.write.mode("overwrite").parquet(_ckpt_dir(out_dir, rnd, "frontier"))
            seen.write.mode("overwrite").parquet(_ckpt_dir(out_dir, rnd, "seen"))
            selected.write.mode("overwrite").parquet(_ckpt_dir(out_dir, rnd, "schedule"))
            lineage_df = spark.createDataFrame([vars(m) for m in lineage[-1:]])
            lineage_df.write.mode("append").parquet(os.path.join(out_dir, "lineage"))

    if schedules:
        schedule = schedules[0]
        for s in schedules[1:]:
            schedule = schedule.unionByName(s)
    else:
        schedule = spark.createDataFrame(
            [], "canonical_url string, url string, host string, host_salt int, "
            "priority double, discovery_round int, seq long, rnk int, round int"
        )

    annotated = None
    if annotated_parts:
        annotated = annotated_parts[0]
        for a in annotated_parts[1:]:
            annotated = annotated.unionByName(a)

    return CrawlResult(
        schedule=schedule.select(
            "round", "canonical_url", "host", "url", "priority", "rnk"
        ),
        seen=seen,
        annotated=annotated,
        lineage=lineage,
    )
