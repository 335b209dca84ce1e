"""Perceptual image hashing (operators/phash.py): decode-path hashes vs an
independent pure-Python reference over the closed-form rasters, banded
near-dup vs brute force, plan shape, and DuckDB oracle parity.

Reference anchor: the sidecar (warc_metadata_sidecar.py) has no image
similarity; these tests pin the NEW curation-side operator the way the
codec tests pin decode — everything derives from gen.phash_pixel's closed
form, never from the engine under test."""

from __future__ import annotations

import duckdb
import pytest

from warc_metadata_sidecar_spark import gen
from warc_metadata_sidecar_spark.operators.phash import (
    GRID,
    N_BANDS,
    image_hashes,
    neardup_pairs,
)


def _ref_gray(m: int) -> list[list[int]]:
    return [
        [
            299 * gen.phash_pixel(m, y, x, 0)
            + 587 * gen.phash_pixel(m, y, x, 1)
            + 114 * gen.phash_pixel(m, y, x, 2)
            for x in range(gen.PHASH_W)
        ]
        for y in range(gen.PHASH_H)
    ]


def _ref_boxes(g: list[list[int]], rows: int, cols: int):
    h, w = len(g), len(g[0])
    s = [[0] * cols for _ in range(rows)]
    n = [[0] * cols for _ in range(rows)]
    for y in range(h):
        for x in range(w):
            s[y * rows // h][x * cols // w] += g[y][x]
            n[y * rows // h][x * cols // w] += 1
    return s, n


def _ref_bands(bits: list[int]) -> list[int]:
    return [
        sum(bits[j * 16 + k] << k for k in range(16)) for j in range(N_BANDS)
    ]


def _ref_hashes(m: int) -> tuple[list[int], list[int]]:
    """Independent scalar re-derivation (loops + cross-multiplied compares,
    no numpy, no engine code)."""
    g = _ref_gray(m)
    s9, n9 = _ref_boxes(g, GRID, GRID + 1)
    dbits = [
        1 if s9[r][c + 1] * n9[r][c] > s9[r][c] * n9[r][c + 1] else 0
        for r in range(GRID)
        for c in range(GRID)
    ]
    s8, n8 = _ref_boxes(g, GRID, GRID)
    ts = sum(map(sum, s8))
    tn = gen.PHASH_W * gen.PHASH_H
    abits = [
        1 if s8[r][c] * tn > ts * n8[r][c] else 0
        for r in range(GRID)
        for c in range(GRID)
    ]
    return _ref_bands(dbits), _ref_bands(abits)


def _ham(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


@pytest.fixture(scope="module")
def hashed(spark):
    rows = image_hashes(gen.phash_media(spark)).orderBy("media_ref").collect()
    return {r["media_ref"]: r for r in rows}


def test_decode_path_hashes_equal_closed_form(hashed):
    """decode(encode(raster)) through four real encoders hashes identically
    to the scalar reference over the raw closed form — pins grayscale
    weights, floor binning, compare direction, and band packing at once."""
    assert len(hashed) == 10
    for r in gen.phash_rows():
        m = int(r["media_ref"].rsplit("/", 1)[1])
        dref, aref = _ref_hashes(m)
        row = hashed[r["media_ref"]]
        assert [row[f"d{j}"] for j in range(N_BANDS)] == dref, r["media_ref"]
        assert [row[f"a{j}"] for j in range(N_BANDS)] == aref, r["media_ref"]
        assert (row["w"], row["h"]) == (gen.PHASH_W, gen.PHASH_H)


def test_twin_and_base_distances():
    """Fixture geometry: twins within the banded-exact radius, distinct
    bases far outside it (so the near-dup set is exactly the five twins)."""
    d = {m: _ref_hashes(m)[0] for m in range(10)}
    for m in range(5):
        assert _ham(d[m], d[m + 5]) <= 3
    for i in range(10):
        for j in range(i + 1, 10):
            if j - i != 5:
                assert _ham(d[i], d[j]) >= 23


def test_neardup_pairs_match_brute_force(spark, hashed):
    got = {
        (r["ref_a"], r["ref_b"]): r["hamming"]
        for r in neardup_pairs(
            image_hashes(gen.phash_media(spark)), max_hamming=3
        ).collect()
    }
    refs = sorted(hashed)
    want = {}
    for i, ra in enumerate(refs):
        for rb in refs[i + 1 :]:
            hm = _ham(
                [hashed[ra][f"d{j}"] for j in range(N_BANDS)],
                [hashed[rb][f"d{j}"] for j in range(N_BANDS)],
            )
            if hm <= 3:
                want[(ra, rb)] = hm
    assert got == want
    assert len(got) == 5  # the five planted twins, nothing else


def test_undecodable_blob_yields_null_row_and_no_pairs(spark):
    from warc_metadata_sidecar_spark import schema

    rows = gen.phash_rows()[:2] + [
        {
            "media_ref": "phash://bad/99",
            "bytes": b"\x00\x01\x02 not an image",
            "meta": {"media_type": "image", "width": None, "height": None, "duration_ms": None},
        }
    ]
    media = spark.createDataFrame(rows, schema.MEDIA)
    h = image_hashes(media)
    bad = h.filter("media_ref = 'phash://bad/99'").collect()
    assert len(bad) == 1 and bad[0]["d0"] is None and bad[0]["w"] is None
    assert neardup_pairs(h).count() == 0  # two distinct bases + one null


def test_neardup_plan_is_equi_join(spark):
    """The banded self-join must compile to a hash equi-join on the band
    key — never a cartesian/BNLJ (the thing banding exists to avoid)."""
    plan = neardup_pairs(image_hashes(gen.phash_media(spark)))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_max_bucket_drops_degenerate_clusters(spark):
    """50 identical hashes (a solid-color-thumbnail mass): exact mode
    emits all C(50,2) pairs; max_bucket=10 drops the degenerate buckets
    entirely while an untouched small cluster survives."""
    rows = [("dup%02d" % i, 7, 7, 7, 7) for i in range(50)]
    rows += [("pair_a", 100, 200, 300, 400), ("pair_b", 100, 200, 300, 401)]
    h = spark.createDataFrame(rows, "media_ref string, d0 long, d1 long, d2 long, d3 long")
    exact = neardup_pairs(h, max_hamming=3)
    assert exact.count() == 50 * 49 // 2 + 1
    capped = {
        (r["ref_a"], r["ref_b"])
        for r in neardup_pairs(h, max_hamming=3, max_bucket=10).collect()
    }
    assert capped == {("pair_a", "pair_b")}


def test_duckdb_oracle_parity():
    from warc_metadata_sidecar_spark import driver_queries as dq

    con = duckdb.connect()
    odf = con.sql(dq.oracle_sql()["image_phash"]).df()
    assert len(odf) == 10
    for _, row in odf.iterrows():
        m = int(row["media_ref"].rsplit("/", 1)[1])
        dref, aref = _ref_hashes(m)
        assert [row[f"d{j}"] for j in range(N_BANDS)] == dref
        assert [row[f"a{j}"] for j in range(N_BANDS)] == aref
    pairs = con.sql(dq.oracle_sql()["image_neardup"]).df()
    assert len(pairs) == 5 and pairs["hamming"].max() <= 2


def test_box_resize_hand_computed_and_identity(spark):
    """resize_images: 36x32 -> 8x8 thumbnails equal a scalar SUM//COUNT
    reference over the closed form (non-integral 4.5-wide boxes mix 4-
    and 5-pixel columns); identity-size resize returns the raster
    verbatim (every box is one pixel); undecodable -> null pixels."""
    from warc_metadata_sidecar_spark import schema
    from warc_metadata_sidecar_spark.operators.phash import resize_images

    rows = {
        r["media_ref"]: r
        for r in resize_images(gen.phash_media(spark), 8, 8).collect()
    }
    assert len(rows) == 10
    for m in (0, 7):
        ref = [r for r in gen.phash_rows() if r["media_ref"].endswith(f"/{m}")][0]
        # scalar reference: box sums/counts by floor binning
        s = {}
        n = {}
        for y in range(gen.PHASH_H):
            for x in range(gen.PHASH_W):
                for c in range(3):
                    k = ((y * 8) // gen.PHASH_H, (x * 8) // gen.PHASH_W, c)
                    s[k] = s.get(k, 0) + gen.phash_pixel(m, y, x, c)
                    n[k] = n.get(k, 0) + 1
        want = [
            s[(oy, ox, c)] // n[(oy, ox, c)]
            for oy in range(8)
            for ox in range(8)
            for c in range(3)
        ]
        assert rows[ref["media_ref"]]["pixels"] == want, m

    ident = resize_images(
        gen.phash_media(spark), gen.PHASH_W, gen.PHASH_H
    ).filter("media_ref like '%/3'").collect()[0]
    raw = [
        gen.phash_pixel(3, y, x, c)
        for y in range(gen.PHASH_H)
        for x in range(gen.PHASH_W)
        for c in range(3)
    ]
    assert ident["pixels"] == raw

    bad = spark.createDataFrame(
        [{"media_ref": "bad://0", "bytes": b"nope",
          "meta": {"media_type": "image", "width": None, "height": None, "duration_ms": None}}],
        schema.MEDIA,
    )
    out = resize_images(bad).collect()[0]
    assert out["pixels"] is None
