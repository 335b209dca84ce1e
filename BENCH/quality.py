"""Recall measurements for the approximate operators (ANN + near-dup).

Deterministic (hash-derived vectors and noise, no RNG state): writes
BENCH/QUALITY.md with recall of
  - centroid-IVF top-1 vs brute force, by nprobe;
  - SRP-blocked cosine dedup vs the exact all-pairs baseline, by table
    count, on PLANTED noisy near-duplicates (cos ~0.93-0.99);
so the "approximate path" claims in operators/similarity.py carry numbers.

Usage: python BENCH/quality.py [n_vectors]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 32


def _h(s: str, lo: float = -1.0, hi: float = 1.0) -> float:
    v = int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
    return lo + v * (hi - lo)


def make_vectors(n: int) -> list[tuple[int, list[float]]]:
    """n clustered unit-ish vectors: 20 hash-derived cluster centers, each
    vector = center + small deterministic perturbation."""
    centers = [
        [_h(f"c{c}:{d}") for d in range(DIM)] for c in range(20)
    ]
    rows = []
    for i in range(n):
        c = centers[i % 20]
        vec = [c[d] + 0.15 * _h(f"v{i}:{d}") for d in range(DIM)]
        rows.append((i, [float(x) for x in vec]))
    return rows


def plant_near_dups(rows, every: int = 10):
    """id+1000000 noisy copies (cos ~0.93-0.99 against the original)."""
    planted = []
    for i, vec in rows:
        if i % every == 0:
            noisy = [x + 0.08 * _h(f"n{i}:{d}") for d, x in enumerate(vec)]
            planted.append((i + 1000000, [float(x) for x in noisy]))
    return rows + planted


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from pyspark.sql import functions as F  # noqa: F401

    from warc_metadata_sidecar_spark.operators.similarity import (
        brute_force_topk,
        embedding_cosine_dedup,
        ivf_topk,
    )
    from warc_metadata_sidecar_spark.session import build_session

    spark = build_session("quality", cpus=16, shuffle_partitions=16)
    emb = spark.createDataFrame(make_vectors(n), ["vec_id", "embedding"]).cache()
    k_cent = max(4, int(math.sqrt(n)))

    exact_top1 = {(r.vec_id, r.neighbor_id) for r in brute_force_topk(emb, k=1).collect()}
    ivf_rows = []
    for nprobe in (1, 2, 4):
        approx = {
            (r.vec_id, r.neighbor_id)
            for r in ivf_topk(
                emb, k=1, n_centroids=k_cent, nprobe=nprobe, max_bucket=4 * n // k_cent
            ).collect()
        }
        recall = len(exact_top1 & approx) / len(exact_top1)
        ivf_rows.append((nprobe, recall))

    dup_emb = spark.createDataFrame(
        plant_near_dups(make_vectors(n)), ["vec_id", "embedding"]
    ).cache()
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_dedup(dup_emb, threshold=0.9, exact=True).collect()
    }
    srp_rows = []
    for tables in (2, 4, 6):
        got = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_dedup(dup_emb, threshold=0.9, tables=tables).collect()
        }
        recall = len(exact_pairs & got) / max(len(exact_pairs), 1)
        srp_rows.append((tables, recall, len(got)))

    ivf_md = "\n".join(f"| {p} | {r:.3f} |" for p, r in ivf_rows)
    srp_md = "\n".join(f"| {t} | {r:.3f} | {g} |" for t, r, g in srp_rows)
    md = f"""# BENCH/QUALITY — recall of the approximate operators

Deterministic corpus: {n} clustered {DIM}-d vectors (20 hash-derived
centers + per-vector perturbation); near-dups = every 10th vector re-added
with cos ~0.93-0.99 noise. Ground truth = the exact quadratic baselines
(brute_force_topk / embedding_cosine_dedup(exact=True)).

## Centroid IVF top-1 (k={k_cent} centroids ~ sqrt(n), max_bucket capped)

| nprobe | recall@1 vs brute force |
|---|---|
{ivf_md}

## SRP-blocked cosine dedup at threshold 0.9 (6 planes/table)

| tables | recall vs exact pairs ({len(exact_pairs)} true pairs) | pairs found |
|---|---|---|
{srp_md}

Run: {dt.datetime.now(dt.timezone.utc).isoformat()} — `python BENCH/quality.py {n}`.
"""
    with open(os.path.join(REPO, "BENCH", "QUALITY.md"), "w") as f:
        f.write(md)
    print(json.dumps({"ivf": ivf_rows, "srp": [(t, r) for t, r, _ in srp_rows]}))
    spark.stop()


if __name__ == "__main__":
    main()
