"""N2: URL-seen membership at 10^10 scale.

Design (SURVEY.md §2b N2): probabilistic filters are a PREFILTER, never the
source of truth — Bloom false positives must not drop URLs. The flow is:

    candidates --bloom("definitely new")--> pass through, no shuffle
               --bloom("maybe seen")-----> exact left_anti join vs seen

so the expensive anti-join shuffle only carries rows the filter could not
clear (true dups + false positives, a small fraction of the frontier at
10^10 scale with an appropriately sized filter). Exactness is restored by
the anti-join; equality with the plain anti-join is asserted in tests.

The Bloom bitmap is built distributed (one bitmap per partition via
mapInPandas, OR-reduced on the driver — each partial is a fixed-size byte
array, so driver traffic is partitions × bitmap_size regardless of row
count) and shipped back as a broadcast variable. At true 10^10 scale the
bitmap is partitioned by url-hash range (a `filters` table keyed by shard),
each executor loading only its shard; the sandbox uses one shard.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_BITS = 1 << 22  # 4 Mi bits ~ 0.5 MiB; sized for sandbox scales
DEFAULT_HASHES = 5


def _indexes(url: str, num_bits: int, num_hashes: int) -> list[int]:
    """k deterministic bit positions via double hashing over md5 halves."""
    d = hashlib.md5(url.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [((h1 + i * h2) % (1 << 64)) % num_bits for i in range(num_hashes)]


class Bloom:
    def __init__(self, bits: np.ndarray, num_hashes: int = DEFAULT_HASHES):
        self.bits = bits  # uint8 array, len = num_bits // 8
        self.num_bits = len(bits) * 8
        self.num_hashes = num_hashes

    @classmethod
    def empty(cls, num_bits: int = DEFAULT_BITS, num_hashes: int = DEFAULT_HASHES) -> "Bloom":
        return cls(np.zeros(num_bits // 8, dtype=np.uint8), num_hashes)

    def add(self, url: str) -> None:
        for ix in _indexes(url, self.num_bits, self.num_hashes):
            self.bits[ix >> 3] |= 1 << (ix & 7)

    def might_contain(self, url: str) -> bool:
        return all(
            self.bits[ix >> 3] & (1 << (ix & 7))
            for ix in _indexes(url, self.num_bits, self.num_hashes)
        )


class CuckooFilter:
    """Overflow tier for the URL-seen prefilter (north rule N2).

    When the Bloom bitmap's fill ratio passes ~50% its false-positive rate
    decays sharply; new keys then go into this cuckoo filter instead, which
    stores 16-bit fingerprints in 4-slot buckets with the classic
    two-choice + eviction insert. Deterministic (md5-derived fingerprints
    and bucket choices), fixed memory, supports might_contain like Bloom.
    Lookups consult BOTH tiers; exactness still comes from the anti-join.
    """

    def __init__(self, num_buckets: int = 1 << 16, slots: int = 4, max_kicks: int = 200):
        self.num_buckets = num_buckets
        self.slots = slots
        self.max_kicks = max_kicks
        self.table = np.zeros((num_buckets, slots), dtype=np.uint16)
        self.overflowed: set[int] = set()  # stash for keys evicted past max_kicks

    def _fp_and_buckets(self, url: str) -> tuple[int, int, int]:
        d = hashlib.md5(url.encode()).digest()
        fp = (int.from_bytes(d[:2], "big") % 65535) + 1  # never 0 (0 = empty)
        b1 = int.from_bytes(d[2:10], "big") % self.num_buckets
        b2 = (b1 ^ (fp * 0x5BD1E995)) % self.num_buckets
        return fp, b1, b2

    def add(self, url: str) -> None:
        fp, b1, b2 = self._fp_and_buckets(url)
        for b in (b1, b2):
            row = self.table[b]
            for s in range(self.slots):
                if row[s] == 0 or row[s] == fp:
                    row[s] = fp
                    return
        # evict deterministically: rotate slot 0 of b1
        b, cur = b1, fp
        for kick in range(self.max_kicks):
            row = self.table[b]
            s = kick % self.slots
            cur, row[s] = int(row[s]), cur
            b = (b ^ (cur * 0x5BD1E995)) % self.num_buckets
            row = self.table[b]
            for s2 in range(self.slots):
                if row[s2] == 0:
                    row[s2] = cur
                    return
        self.overflowed.add(cur)

    def might_contain(self, url: str) -> bool:
        fp, b1, b2 = self._fp_and_buckets(url)
        return (
            fp in self.table[b1]
            or fp in self.table[b2]
            or fp in self.overflowed
        )


class TieredSeenFilter:
    """Bloom primary + cuckoo overflow (north rule N2). Adds go to the bloom
    until its fill ratio crosses `spill_at`, then to the cuckoo tier."""

    def __init__(self, num_bits: int = DEFAULT_BITS, spill_at: float = 0.5):
        self.bloom = Bloom.empty(num_bits)
        self.cuckoo = CuckooFilter()
        self.spill_at = spill_at
        self._adds = 0
        # fill ratio estimated from adds (k hashes per add) — cheap and
        # deterministic, no popcount per insert
        self._spill_after = int(num_bits * spill_at / DEFAULT_HASHES)

    def add(self, url: str) -> None:
        if self._adds < self._spill_after:
            self.bloom.add(url)
        else:
            self.cuckoo.add(url)
        self._adds += 1

    def might_contain(self, url: str) -> bool:
        return self.bloom.might_contain(url) or self.cuckoo.might_contain(url)


def build_tiered(
    seen: DataFrame,
    key: str = "canonical_url",
    num_bits: int = DEFAULT_BITS,
    spill_at: float = 0.5,
) -> "TieredSeenFilter":
    """Driver-built tiered filter (bloom primary + cuckoo overflow) from the
    seen table. The cuckoo tier is not OR-mergeable like Bloom bitmaps, so
    the tiered build streams keys to the driver via toLocalIterator — right
    for the sandbox scales; at 10^10 the filters live sharded in a `filters`
    table, each shard built by the executor owning that url-hash range."""
    t = TieredSeenFilter(num_bits=num_bits, spill_at=spill_at)
    for row in seen.select(key).toLocalIterator():
        if row[0] is not None:
            t.add(row[0])
    return t


def build_bloom(
    seen: DataFrame,
    key: str = "canonical_url",
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
) -> Bloom:
    """Distributed build: one partial bitmap per partition, OR-reduce on the
    driver. The partials are fixed-size regardless of partition row count."""

    def per_partition(batches):
        bloom = Bloom.empty(num_bits, num_hashes)
        touched = False
        for pdf in batches:
            touched = True
            for url in pdf[key]:
                if url is not None:
                    bloom.add(url)
        if touched:
            yield pd.DataFrame({"bits": [bloom.bits.tobytes()]})

    partials = seen.select(key).mapInPandas(
        per_partition, T.StructType([T.StructField("bits", T.BinaryType())])
    )
    acc = Bloom.empty(num_bits, num_hashes)
    for row in partials.collect():
        acc.bits |= np.frombuffer(row.bits, dtype=np.uint8)
    return acc


def filter_new(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    bloom=None,
    key: str = "canonical_url",
) -> DataFrame:
    """Rows of `candidates` whose key is NOT in `seen` — exact.

    `bloom` is any picklable object with might_contain(url) -> bool — a
    Bloom, a CuckooFilter, or the TieredSeenFilter (bloom + cuckoo overflow,
    north rule N2). Only maybe-seen rows take the anti-join shuffle; rows
    the filter proves new bypass it. Without a filter, plain left_anti (the
    correctness baseline every filter path must equal).
    """
    if bloom is None:
        return candidates.join(seen.select(key), key, "left_anti")

    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(urls: pd.Series) -> pd.Series:
        b = bc.value
        return urls.map(lambda u: bool(u is not None and b.might_contain(u)))

    flagged = candidates.withColumn("_maybe", maybe_seen(F.col(key)))
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    needs_check = flagged.filter(F.col("_maybe")).drop("_maybe")
    confirmed_new = needs_check.join(seen.select(key), key, "left_anti")
    return definitely_new.unionByName(confirmed_new)
