"""Mergeable frequency sketches — the count-min sketch (Cormode &
Muthukrishnan 2005), the bounded-state companion to the exact
heavy-hitter pass (operators/quality.top_ngrams): a corpus-frequency
summary whose size is depth x width COUNTERS regardless of corpus
size, mergeable by plain addition (cross-shard, cross-batch, cross-
stream — the property exact count tables lack at 10^9 distinct keys).

Hash contract (shared verbatim with the DuckDB oracle): row d's bucket
for a token is the first 15 hex chars of md5('<d>:<token>') read as an
integer, mod width — 60 bits, engine-agnostic (Spark conv(x,16,10) ==
DuckDB ('0x'||x)::BIGINT == Python int(x,16), verified).

Scale shape:
  * build = ONE map-side-combinable groupBy over (d, bucket): each
    partition emits at most depth x width partial counters no matter
    how many tokens it holds — the shuffle is sketch-sized, not
    corpus-sized;
  * estimate = probe tokens x depth keys joined against the sketch
    (broadcast: the sketch is depth x width rows), min over rows with
    absent buckets counting 0;
  * the classic guarantee holds: est >= true always (collisions only
    ADD), est <= true + eps*N with prob 1-delta for width = e/eps,
    depth = ln(1/delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(token: F.Column, d: int, width: int) -> F.Column:
    h = F.md5(F.concat(F.lit(f"{d}:"), token))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width
    ).cast("int")


def cms_build(
    tokens: DataFrame, token_col: str = "token", depth: int = 4, width: int = 256
) -> DataFrame:
    """Token stream -> sketch rows (d, bucket, c). Input rows may carry
    duplicates (one row per occurrence)."""
    per_d = [
        tokens.select(
            F.lit(d).alias("d"),
            _bucket(F.col(token_col), d, width).alias("bucket"),
        )
        for d in range(depth)
    ]
    allrows = per_d[0]
    for p in per_d[1:]:
        allrows = allrows.unionByName(p)
    return allrows.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(token, est): the count-min estimate for each probe token —
    min over the depth rows, absent buckets counting 0."""
    keys = None
    for d in range(depth):
        k = probes.select(
            F.col(token_col).alias("token"),
            F.lit(d).alias("d"),
            _bucket(F.col(token_col), d, width).alias("bucket"),
        )
        keys = k if keys is None else keys.unionByName(k)
    joined = keys.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy("token").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est")
    )
