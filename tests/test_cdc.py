"""Content-defined chunking (operators/cdc.py): gear-boundary contracts,
the resynchronization property that makes CDC dedup work, and the
DataFrame chunk/stats paths against a union-find-free hand accounting."""

from __future__ import annotations

import hashlib

import pytest

from warc_metadata_sidecar_spark import gen
from warc_metadata_sidecar_spark.operators.cdc import (
    cdc_chunks,
    cdc_dedup_stats,
    gear_boundaries,
)


def test_gear_boundaries_min_max_and_cover():
    data = gen.cdc_segment(0) * 3
    ends = gear_boundaries(data, min_size=32, mask_bits=6, max_size=512)
    assert ends[-1] == len(data)
    sizes = [e - s for s, e in zip([0] + ends[:-1], ends)]
    # every chunk but the final partial respects [min, max]
    assert all(32 <= sz <= 512 for sz in sizes[:-1])
    assert sizes[-1] <= 512
    # deterministic
    assert ends == gear_boundaries(data, 32, 6, 512)


def test_insertion_resynchronizes():
    """The CDC property byte-digest dedup lacks: inserting bytes near the
    front shifts only nearby chunks — later boundaries re-align, so the
    tail chunks keep identical content hashes."""
    base = gen.cdc_segment(1)
    mutated = base[:10] + b"XYZ" + base[10:]

    def chunk_hashes(raw: bytes) -> list[str]:
        out, start = [], 0
        for end in gear_boundaries(raw):
            out.append(hashlib.md5(raw[start:end]).hexdigest())
            start = end
        return out

    h_base, h_mut = chunk_hashes(base), chunk_hashes(mutated)
    # a fixed-size chunker would share NOTHING after offset 10; gear CDC
    # must re-sync: the two tails share a long common suffix of chunks
    common_tail = 0
    for a, b in zip(reversed(h_base), reversed(h_mut)):
        if a != b:
            break
        common_tail += 1
    assert common_tail >= len(h_base) // 2
    assert h_base != h_mut  # the head did change


def test_cdc_chunks_and_stats_dataframe(spark):
    rows = gen.cdc_rows() + [
        {"media_ref": "cdc://null", "bytes": None,
         "meta": {"media_type": "binary", "width": None, "height": None,
                  "duration_ms": None}},
        {"media_ref": "cdc://empty", "bytes": b"",
         "meta": {"media_type": "binary", "width": None, "height": None,
                  "duration_ms": None}},
    ]
    from warc_metadata_sidecar_spark import schema

    media = spark.createDataFrame(rows, schema.MEDIA)
    chunks = cdc_chunks(media)
    got = chunks.collect()
    # null/empty blobs contribute no rows
    assert not [r for r in got if r["media_ref"] in ("cdc://null", "cdc://empty")]
    # offsets tile each blob exactly
    by_ref: dict[str, list] = {}
    for r in got:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref, rs in by_ref.items():
        rs.sort(key=lambda r: r["idx"])
        assert rs[0]["offset"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["offset"] + a["length"] == b["offset"]
    # hand accounting: engine stats == hashlib twin accounting
    twin: dict[str, int] = {}
    copies = 0
    for r in gen.cdc_rows():
        raw, start = r["bytes"], 0
        for end in gear_boundaries(raw):
            twin[hashlib.md5(raw[start:end]).hexdigest()] = end - start
            copies += 1
            start = end
    s = cdc_dedup_stats(chunks).first()
    assert s["n_chunks"] == copies
    assert s["n_distinct"] == len(twin)
    assert s["bytes_distinct"] == sum(twin.values())
    assert s["bytes_total"] == sum(len(r["bytes"]) for r in gen.cdc_rows())
    assert s["dedup_ratio"] == pytest.approx(s["bytes_total"] / s["bytes_distinct"])
    assert s["dedup_ratio"] > 1.3  # the planted sharing is material
