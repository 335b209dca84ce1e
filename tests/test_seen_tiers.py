"""Cuckoo overflow tier tests (north rule N2: bloom + cuckoo)."""

from warc_metadata_sidecar_spark.frontier.seen import Bloom, CuckooFilter, TieredSeenFilter


def test_cuckoo_no_false_negatives():
    c = CuckooFilter(num_buckets=1 << 10)
    urls = [f"com,host{i % 37})/p/{i}" for i in range(2000)]
    for u in urls:
        c.add(u)
    assert all(c.might_contain(u) for u in urls)


def test_cuckoo_low_false_positive_rate():
    c = CuckooFilter(num_buckets=1 << 12)
    for i in range(2000):
        c.add(f"com,a)/{i}")
    fp = sum(1 for i in range(10000) if c.might_contain(f"org,b)/{i}"))
    assert fp / 10000 < 0.05


def test_tiered_filter_spills_and_never_drops():
    t = TieredSeenFilter(num_bits=1 << 12, spill_at=0.5)  # tiny bloom: forces spill
    urls = [f"edu,unt)/page/{i}" for i in range(5000)]
    for u in urls:
        t.add(u)
    assert t._adds > t._spill_after  # overflow tier actually engaged
    assert all(t.might_contain(u) for u in urls)


def test_tiered_filter_prefilter_semantics():
    # the tier is a PREFILTER: false positives allowed (resolved by the
    # exact anti-join), false negatives never
    t = TieredSeenFilter(num_bits=1 << 14)
    seen = [f"com,x)/{i}" for i in range(1000)]
    for u in seen:
        t.add(u)
    novel = [f"net,y)/{i}" for i in range(1000)]
    hits = sum(1 for u in novel if t.might_contain(u))
    assert hits < 500  # mostly cleared without the anti-join
