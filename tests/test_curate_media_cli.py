"""curate-media CLI: one-scan mixed-media fingerprint dedup end to end —
per-kind clustering, undecodable passthrough, decisions/kept outputs."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import cli, gen, schema


def _run(monkeypatch, capsys, argv):
    monkeypatch.setattr(sys, "argv", ["warc_metadata_sidecar_spark"] + argv)
    cli.main()
    return capsys.readouterr().out


def test_cli_curate_media_mixed_corpus(spark, tmp_path, capsys, monkeypatch):
    """phash fixtures (5 twin pairs -> 5 image keepers of 10), afp
    fixtures (components {3,3,2,2} -> 4 audio keepers of 10), one junk
    blob (kept, undecodable): 10 keepers of 21."""
    rows = gen.phash_rows() + gen.afp_rows() + [
        {
            "media_ref": "junk://0",
            "bytes": b"\x00\x01 not media",
            "meta": {"media_type": "image", "width": None, "height": None, "duration_ms": None},
        }
    ]
    src = str(tmp_path / "media")
    spark.createDataFrame(rows, schema.MEDIA).write.parquet(src)
    out_dir = str(tmp_path / "out")

    out = _run(
        monkeypatch, capsys,
        ["--cpus", "4", "curate-media", src, out_dir],
    )
    assert "kind=image blobs=10 kept=5" in out
    assert "kind=audio blobs=10 kept=4" in out
    assert "kind=undecodable blobs=1 kept=1" in out
    assert "read=21 kept=10 dropped=11" in out

    dec = spark.read.parquet(f"{out_dir}/decisions")
    assert dec.count() == 21
    # cross-codec audio chain: flac/8 keeps its wav base + twin
    row = {
        r["media_ref"]: (r["cluster_id"], r["cluster_size"], r["keep"])
        for r in dec.filter("kind = 'audio'").collect()
    }
    assert row["afp://wav/0"] == ("afp://flac/8", 3, False)
    assert row["afp://flac/8"] == ("afp://flac/8", 3, True)
    # no cross-kind contamination: every cluster is single-kind
    kinds = (
        dec.filter("kind is not null")
        .groupBy("cluster_id")
        .agg(F.countDistinct("kind").alias("nk"))
    )
    assert kinds.filter("nk > 1").count() == 0

    kept = spark.read.parquet(f"{out_dir}/kept")
    assert kept.count() == 10
    assert kept.filter("media_ref = 'junk://0'").count() == 1
