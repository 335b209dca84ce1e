"""Audio fingerprinting (operators/afp.py): engine fingerprints vs an
independent scalar reference over the closed-form PCM, cross-codec
(WAV vs lossless FLAC) duplicate detection, banded pairs vs brute force,
8-bit quantization exactness, and DuckDB oracle parity."""

from __future__ import annotations

import struct

import duckdb
import pytest

from warc_metadata_sidecar_spark import gen
from warc_metadata_sidecar_spark.operators.afp import (
    N_BANDS,
    audio_fingerprints,
    audio_neardup_pairs,
)


def _ref_fp(m: int) -> list[int]:
    """Independent scalar re-derivation (loops, no numpy, no engine)."""
    w = gen.AFP_FRAMES // 17
    mono = [
        gen.afp_sample(m, i, 0) + gen.afp_sample(m, i, 1)
        for i in range(w * 17)
    ]
    e = [[0] * 4 for _ in range(17)]
    for i, v in enumerate(mono):
        e[i // w][i % 4] += v * v
    bits = [
        1 if e[win + 1][b] > e[win][b] else 0
        for win in range(16)
        for b in range(4)
    ]
    return [sum(bits[j * 16 + k] << k for k in range(16)) for j in range(N_BANDS)]


def _ham(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


@pytest.fixture(scope="module")
def fps(spark):
    rows = audio_fingerprints(gen.afp_media(spark)).collect()
    return {r["media_ref"]: r for r in rows}


def test_engine_fingerprints_match_closed_form_both_codecs(fps):
    """decode_wav AND decode_flac paths land on the same closed-form
    bands — the FLAC rows (m=8,9) re-encode bases 0,1 losslessly, so the
    scalar reference for m covers them too."""
    assert len(fps) == 10
    for r in gen.afp_rows():
        m = int(r["media_ref"].rsplit("/", 1)[1])
        row = fps[r["media_ref"]]
        assert [row[f"b{j}"] for j in range(N_BANDS)] == _ref_fp(m), r["media_ref"]
        assert (row["rate"], row["n_frames"]) == (gen.AFP_RATE, gen.AFP_FRAMES)


def test_fixture_distance_geometry():
    f = {m: _ref_fp(m) for m in range(10)}
    for m in range(4):
        assert _ham(f[m], f[m + 4]) == 1  # +900 perturbation = one bit
    assert _ham(f[8], f[0]) == 0 and _ham(f[9], f[1]) == 0  # cross-codec dup
    for i in range(10):
        for j in range(i + 1, 10):
            if (i % 4) != (j % 4):
                assert _ham(f[i], f[j]) >= 20


def test_neardup_pairs_match_brute_force(spark, fps):
    got = {
        (r["ref_a"], r["ref_b"]): r["hamming"]
        for r in audio_neardup_pairs(
            audio_fingerprints(gen.afp_media(spark)), max_hamming=3
        ).collect()
    }
    refs = sorted(fps)
    want = {}
    for i, ra in enumerate(refs):
        for rb in refs[i + 1 :]:
            hm = _ham(
                [fps[ra][f"b{j}"] for j in range(N_BANDS)],
                [fps[rb][f"b{j}"] for j in range(N_BANDS)],
            )
            if hm <= 3:
                want[(ra, rb)] = hm
    assert got == want
    assert len(got) == 8  # 4 twins + 2 cross-codec dups + 2 derived


def test_short_and_undecodable_blobs_yield_null_rows(spark):
    from warc_metadata_sidecar_spark import schema

    short = gen._enc_wav_pcm([[100] * 5, [200] * 5], 8000)  # 5 < 17 frames
    rows = [
        {"media_ref": "afp://short/0", "bytes": short,
         "meta": {"media_type": "audio", "width": None, "height": None, "duration_ms": 1}},
        {"media_ref": "afp://junk/1", "bytes": b"not audio at all",
         "meta": {"media_type": "audio", "width": None, "height": None, "duration_ms": 1}},
    ]
    out = audio_fingerprints(
        spark.createDataFrame(rows, schema.MEDIA)
    ).collect()
    assert len(out) == 2
    assert all(r["b0"] is None for r in out)


def test_8bit_wav_quantizes_exactly_to_16bit_twin(spark):
    """(s-128)/128 * 32768 == (s-128)*256 exactly — the 8-bit decode path
    must fingerprint identically to the 16-bit stream holding those
    values."""
    from warc_metadata_sidecar_spark import schema

    n = 34  # two frames per window
    vals8 = [(i * 29 + 7) % 256 for i in range(n)]
    pcm8 = bytes(vals8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm8)) + pcm8
    wav8 = b"RIFF" + struct.pack("<I", len(body)) + body
    wav16 = gen._enc_wav_pcm([[(v - 128) * 256 for v in vals8]], 8000)
    rows = [
        {"media_ref": "afp://8bit/0", "bytes": wav8,
         "meta": {"media_type": "audio", "width": None, "height": None, "duration_ms": 4}},
        {"media_ref": "afp://16bit/0", "bytes": wav16,
         "meta": {"media_type": "audio", "width": None, "height": None, "duration_ms": 4}},
    ]
    out = {
        r["media_ref"]: [r[f"b{j}"] for j in range(N_BANDS)]
        for r in audio_fingerprints(
            spark.createDataFrame(rows, schema.MEDIA)
        ).collect()
    }
    assert out["afp://8bit/0"] == out["afp://16bit/0"]
    assert out["afp://8bit/0"][0] is not None


def test_media_dedup_keep_transitive_closure(spark, fps):
    """wav/0 ~ wav/4, wav/0 ~ flac/8, wav/4 ~ flac/8 chain into ONE
    size-3 component with the min ref kept; pair-only deletion would
    over- or under-delete here. Expectation derived independently by
    closing the brute-force pair set in Python."""
    from pyspark.sql import functions as F

    from warc_metadata_sidecar_spark.operators.phash import media_dedup_keep

    fp = audio_fingerprints(gen.afp_media(spark)).select(
        "media_ref", *[F.col(f"b{j}").alias(f"d{j}") for j in range(N_BANDS)]
    )
    got = {
        r["media_ref"]: (r["cluster_id"], r["cluster_size"], r["keep"])
        for r in media_dedup_keep(fp, max_hamming=3).collect()
    }
    # independent closure: union-find over brute-force pairs
    refs = sorted(fps)
    parent = {r: r for r in refs}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for i, ra in enumerate(refs):
        for rb in refs[i + 1 :]:
            if _ham(
                [fps[ra][f"b{j}"] for j in range(N_BANDS)],
                [fps[rb][f"b{j}"] for j in range(N_BANDS)],
            ) <= 3:
                parent[find(rb)] = find(ra)
    comp: dict[str, list[str]] = {}
    for r in refs:
        comp.setdefault(find(r), []).append(r)
    want = {}
    for members in comp.values():
        cid = min(members)
        for r in members:
            want[r] = (cid, len(members), r == cid)
    assert got == want
    assert sorted(v[1] for v in got.values()) == [2, 2, 2, 2, 3, 3, 3, 3, 3, 3]


def test_media_dedup_keep_singletons_and_long_chain(spark):
    """A 4-link Hamming-1 chain a~b~c~d collapses to one component
    (multi-round star convergence on STRING ids) and an unrelated
    singleton keeps itself."""
    from warc_metadata_sidecar_spark.operators.phash import media_dedup_keep

    rows = [
        ("a", 0b0000, 7, 7, 7),
        ("b", 0b0001, 7, 7, 7),
        ("c", 0b0011, 7, 7, 7),
        ("d", 0b0111, 7, 7, 7),
        ("lone", 40000, 41000, 42000, 43000),
    ]
    h = spark.createDataFrame(
        rows, "media_ref string, d0 long, d1 long, d2 long, d3 long"
    )
    got = {
        r["media_ref"]: (r["cluster_id"], r["cluster_size"], r["keep"])
        for r in media_dedup_keep(h, max_hamming=1).collect()
    }
    # a~b, b~c, c~d at Hamming 1; a~c etc. at 2 — closure must chain them
    assert got == {
        "a": ("a", 4, True),
        "b": ("a", 4, False),
        "c": ("a", 4, False),
        "d": ("a", 4, False),
        "lone": ("lone", 1, True),
    }


def test_duckdb_oracle_parity():
    from warc_metadata_sidecar_spark import driver_queries as dq

    con = duckdb.connect()
    odf = con.sql(dq.oracle_sql()["audio_fp"]).df()
    assert len(odf) == 10
    for _, row in odf.iterrows():
        m = int(row["media_ref"].rsplit("/", 1)[1])
        assert [row[f"b{j}"] for j in range(N_BANDS)] == _ref_fp(m)
    pairs = con.sql(dq.oracle_sql()["audio_neardup"]).df()
    assert len(pairs) == 8 and pairs["hamming"].max() <= 1


def test_resample_audio_hand_computed_floor_and_identity(spark):
    """afp.resample_audio: 4-frame box means with FLOOR division on a
    hand-built stereo WAV (negative window sums exercise floor-vs-trunc:
    floor(-7/4) = -2), factor=1 identity round-trip, tail-window drop,
    undecodable nulls, and WAV == FLAC on identical samples."""
    from warc_metadata_sidecar_spark.operators.afp import resample_audio

    # 9 frames: one full window of +, one of - (sum -7 -> floor -2),
    # and a 1-frame tail that must drop
    ch0 = [1, 2, 3, 1, -1, -2, -3, -1, 99]
    ch1 = [4, 4, 4, 4, -5, -5, -5, -6, 99]
    wav = gen._enc_wav_pcm([ch0, ch1], 8000)
    rows = spark.createDataFrame(
        [("a://wav", bytearray(wav)), ("a://junk", bytearray(b"\x00" * 32))],
        "media_ref: string, bytes: binary",
    )
    got = {r["media_ref"]: r for r in resample_audio(rows, factor=4).collect()}
    a = got["a://wav"]
    assert (a["rate_in"], a["rate_out"], a["n_in"], a["n_out"]) == (8000, 2000, 9, 2)
    assert a["samples"] == [1, 4, -2, -6]  # floor(-7/4) = -2, floor(-21/4) = -6
    j = got["a://junk"]
    assert j["samples"] is None and j["n_out"] is None
    # identity: factor=1 returns the exact 16-bit samples, interleaved
    ident = {
        r["media_ref"]: r
        for r in resample_audio(rows, factor=1).collect()
    }["a://wav"]
    assert ident["samples"] == [v for pair in zip(ch0, ch1) for v in pair]
    # cross-codec: FLAC of the afp base PCM decimates identically to WAV
    m = gen.afp_rows()
    wav0, flac0 = m[0]["bytes"], m[8]["bytes"]
    both = spark.createDataFrame(
        [("w", bytearray(wav0)), ("f", bytearray(flac0))],
        "media_ref: string, bytes: binary",
    )
    out = {r["media_ref"]: r["samples"] for r in resample_audio(both, factor=4).collect()}
    assert out["w"] == out["f"]
