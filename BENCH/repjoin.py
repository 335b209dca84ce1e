"""Measured evidence for the r4 rep-join fix (VERDICT r3 #1): the
flagship's rep-routing semi-join carries no broadcast hint, so at the
scale regime where the rep side CANNOT be broadcast (one id per distinct
digest at 10^10 payloads — simulated here by disabling broadcast
thresholds), the digest-bucketed documents layout is what keeps payloads
out of the exchanges: plain parquet shuffles the payload column through
the semi-join, the bucketed table co-locates both sides and shuffles only
the dedup_key join-back metadata.

Writes BENCH/REPJOIN.md. Run: python BENCH/repjoin.py [n_docs]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from warc_metadata_sidecar_spark.frontier.crawl import (  # noqa: E402
    shuffle_totals as _shuffle_totals,
)
from warc_metadata_sidecar_spark.session import build_session  # noqa: E402


def shuffle_totals(spark) -> tuple[int, int]:
    """crawl.shuffle_totals, but a measurement run must fail loudly when
    the status API is unavailable instead of recording garbage deltas."""
    totals = _shuffle_totals(spark)
    if totals is None:
        raise RuntimeError("Spark UI/status API unavailable — cannot measure")
    return totals


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = build_session(
        "repjoin-evidence",
        cpus=16,
        shuffle_partitions=16,
        extra={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
            # the 10^10-distinct-payload regime: the rep side is far past
            # any broadcast threshold, so the join must run as a real
            # distributed join on both layouts
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    from pyspark.sql import functions as F

    from warc_metadata_sidecar_spark import driver_queries
    from warc_metadata_sidecar_spark.operators.sidecar import sidecar_rows
    from warc_metadata_sidecar_spark.sources.tables import write_documents_bucketed

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    driver_queries.register_views(spark, sf)
    base = driver_queries.engine_documents_from_driver_tables(spark, sf)
    reps = max(1, n_docs // 5000)
    rep_df = spark.range(reps).select(F.col("id").alias("rep"))
    big = (
        base.crossJoin(rep_df)
        .withColumn("doc_id", F.concat_ws("-", "doc_id", "rep"))
        .withColumn(
            "payload_digest",
            F.when(
                F.col("payload_digest").isNotNull(),
                F.concat_ws("-", "payload_digest", "rep"),
            ),
        )
        .withColumn("url", F.concat(F.col("url"), F.lit("?r="), F.col("rep")))
        .drop("rep")
        .repartition(32)
    )
    d = tempfile.mkdtemp(prefix="repjoin_")
    big.write.mode("overwrite").parquet(os.path.join(d, "plain"))
    plain = spark.read.parquet(os.path.join(d, "plain"))
    write_documents_bucketed(plain, "repjoin_docs", os.path.join(d, "bucketed"))
    bucketed = spark.table("repjoin_docs")

    results = {}
    for label, frame in (("plain parquet", plain), ("digest-bucketed", bucketed)):
        # warmup not needed: we want the job's own shuffle bytes, not time
        before = shuffle_totals(spark)
        n = sidecar_rows(frame, None).count()
        after = shuffle_totals(spark)
        results[label] = {
            "rows": n,
            "shuffle_read": after[0] - before[0],
            "shuffle_write": after[1] - before[1],
        }
        print(label, results[label])
    assert results["plain parquet"]["rows"] == results["digest-bucketed"]["rows"]

    pl, bu = results["plain parquet"], results["digest-bucketed"]
    ratio = pl["shuffle_write"] / max(bu["shuffle_write"], 1)
    md = f"""# BENCH/REPJOIN — flagship rep-join shuffle by layout (r4)

The rep-routing semi-join carries NO broadcast hint (VERDICT r3 #1: one
id per distinct digest is tens of GB at 10^10 payloads). This measurement
disables every broadcast threshold — the regime where the rep side cannot
be broadcast — and runs the full flagship (`sidecar_rows`) over the SAME
{pl["rows"]:,}-output-row corpus in both layouts:

| layout | shuffle read | shuffle write |
|---|---|---|
| plain parquet | {pl["shuffle_read"]:,} B | {pl["shuffle_write"]:,} B |
| digest-bucketed table | {bu["shuffle_read"]:,} B | {bu["shuffle_write"]:,} B |

**{ratio:.1f}x less shuffle in the bucketed layout.** Plain parquet pushes
the payload column through the semi-join exchange; the bucketed table
satisfies both the rep election groupBy and the (payload_digest, doc_id)
semi-join from its storage partitioning (zero exchanges — plan-pinned by
tests/test_plans.test_bucketed_sidecar_rep_join_no_broadcast_no_exchange),
leaving only the dedup_key join-back metadata. With broadcast enabled
(the realistic small-corpus case) the planner broadcasts the rep side on
either layout and neither pays a payload shuffle; at 10^10 payloads only
the bucketed layout retains that property.

Run: {dt.datetime.now(dt.timezone.utc).isoformat()} — `python BENCH/repjoin.py {n_docs}`.
"""
    with open(os.path.join(REPO, "BENCH", "REPJOIN.md"), "w") as f:
        f.write(md)
    spark.sql("DROP TABLE IF EXISTS repjoin_docs")
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"ratio": round(ratio, 1)}))


if __name__ == "__main__":
    main()
