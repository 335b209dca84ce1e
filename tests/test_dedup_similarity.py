"""Engine-API tests for the dedup + similarity operator families (their
SQL twins are oracle-checked in test_oracle_parity.py; here we test the
composable DataFrame API, recall vs brute force, and edge semantics)."""

import pytest
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    shingles,
    simhash_dedup_buckets,
    simhash_signatures,
)
from warc_metadata_sidecar_spark.operators.similarity import (
    brute_force_topk,
    embedding_cosine_dedup,
    ivf_topk,
    lsh_srp_buckets,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the crawler "
    "politely fetches pages from many hosts in priority order every round"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"{BASE} variant {i} with unique suffix token{i}"))
    # exact dups
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1]))
    # near dup: drop last word
    rows.append((200, rows[2][1].rsplit(" ", 1)[0]))
    # unrelated doc
    rows.append((300, "completely different content about databases and storage engines"))
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_dedup(spark, corpus):
    groups = exact_dedup(corpus).collect()
    keys = {(g.keeper, g.n_dups) for g in groups}
    assert (0, 2) in keys and (1, 2) in keys
    assert all(g.n_dups == 2 for g in groups)


def test_minhash_finds_planted_near_dups(spark, corpus):
    pairs = minhash_dedup(corpus, threshold=0.6).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    assert (0, 100) in found  # exact dup -> jaccard 1.0
    assert (1, 101) in found
    assert (2, 200) in found  # near dup
    for p in pairs:
        if (p.id_a, p.id_b) == (0, 100):
            assert p.jaccard == 1.0
    # the unrelated doc never pairs
    assert not any(300 in (p.id_a, p.id_b) for p in pairs)


def test_lsh_prunes_pair_space(spark, corpus):
    sh = shingles(corpus)
    sigs = minhash_signatures(sh)
    cand = lsh_candidate_pairs(sigs)
    n_docs = corpus.count()
    assert cand.count() < n_docs * (n_docs - 1) / 2  # strictly sub-quadratic


def test_simhash_buckets_group_exact_dups(spark, corpus):
    buckets = simhash_dedup_buckets(corpus).collect()
    keepers = {b.keeper for b in buckets}
    assert 0 in keepers or 1 in keepers  # exact dup pairs share signatures
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(corpus).collect()}
    assert sigs[0] == sigs[100]
    assert sigs[1] == sigs[101]
    assert 0 <= sigs[0] < (1 << 16)


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(60):
        # three clusters on a circle in 8-d space
        angle = (i % 3) * 2.1 + (i / 600.0)
        vec = [math.cos(angle), math.sin(angle)] + [0.01 * ((i * 7 + d) % 5) for d in range(6)]
        rows.append((i, [float(x) for x in vec], i % 3))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).cache()


def test_brute_force_topk(spark, vectors):
    top1 = brute_force_topk(vectors, k=1).collect()
    assert len(top1) == 60
    by_id = {r.vec_id: r for r in top1}
    # nearest neighbor of i is in the same angular cluster
    assert by_id[0].neighbor_id % 3 == 0
    assert all(r.rnk == 1 for r in top1)
    assert all(-1.0 <= r.sim <= 1.0 for r in top1)


def test_ivf_recall_vs_brute_force(spark, vectors):
    exact = {(r.vec_id, r.neighbor_id) for r in brute_force_topk(vectors, k=1).collect()}
    approx = {(r.vec_id, r.neighbor_id) for r in ivf_topk(vectors, k=1, dims=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8  # bucket pruning keeps most true neighbors


def test_srp_buckets_deterministic(spark, vectors):
    b1 = {r.vec_id: r.srp_bucket for r in lsh_srp_buckets(vectors, planes=6).collect()}
    b2 = {r.vec_id: r.srp_bucket for r in lsh_srp_buckets(vectors, planes=6).collect()}
    assert b1 == b2
    assert all(0 <= v < 64 for v in b1.values())


def test_embedding_cosine_dedup(spark, vectors):
    # duplicate vector -> sim 1.0 pair
    dup = vectors.limit(1).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    pairs = embedding_cosine_dedup(vectors.unionByName(dup), threshold=0.9999).collect()
    assert any(p.id_a == 0 and p.id_b == 1000 and p.sim >= 0.9999 for p in pairs)


def test_ivf_centroid_scale_path(spark, vectors):
    """VERDICT r1 #4: centroid-based quantizer (k~sqrt(n), broadcast) with
    nprobe + bucket truncation — recall holds while the pair space is
    strictly sub-quadratic."""
    from warc_metadata_sidecar_spark.operators.similarity import (
        _assign_buckets,
        ivf_train_centroids,
    )

    cents = ivf_train_centroids(vectors, k=8)
    assert cents.count() <= 8
    e = vectors.select(
        F.col("vec_id").alias("_id"), F.col("embedding").cast("array<double>").alias("_v")
    )
    sizes = [
        r["count"]
        for r in _assign_buckets(e, cents, "_id", "_v", 1).groupBy("bucket").count().collect()
    ]
    n = vectors.count()
    assert sum(s * s for s in sizes) < n * (n - 1) / 2  # pruned pair space

    exact = {(r.vec_id, r.neighbor_id) for r in brute_force_topk(vectors, k=1).collect()}
    approx = {
        (r.vec_id, r.neighbor_id)
        for r in ivf_topk(
            vectors, k=1, centroids=cents, nprobe=2, max_bucket=30
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8


def test_ivf_bucket_truncation_caps_candidates(spark, vectors):
    # max_bucket=3: no probe can meet more than nprobe*3 candidates
    got = ivf_topk(vectors, k=5, n_centroids=4, nprobe=1, max_bucket=3).collect()
    per_probe = {}
    for r in got:
        per_probe.setdefault(r.vec_id, 0)
        per_probe[r.vec_id] += 1
    assert max(per_probe.values()) <= 3


def test_cosine_dedup_srp_default_is_blocked(spark, vectors):
    """VERDICT r1 #4: the no-block default must NOT be an all-pairs
    crossJoin — candidates come from multi-table SRP buckets, and planted
    duplicates are still found (identical vectors share every bucket)."""
    from warc_metadata_sidecar_spark.operators.similarity import srp_candidate_pairs

    dup = vectors.limit(1).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    allv = vectors.unionByName(dup)
    pairs = embedding_cosine_dedup(allv, threshold=0.9999).collect()
    assert any(p.id_a == 0 and p.id_b == 1000 and p.sim >= 0.9999 for p in pairs)
    n = allv.count()
    cand = srp_candidate_pairs(allv.withColumn("embedding", F.col("embedding").cast("array<double>")))
    assert cand.count() < n * (n - 1) / 2  # strictly sub-quadratic
    # exact=True remains the quadratic correctness baseline and agrees on
    # the planted pair
    exact_pairs = embedding_cosine_dedup(allv, threshold=0.9999, exact=True).collect()
    assert any(p.id_a == 0 and p.id_b == 1000 for p in exact_pairs)


def test_srp_literal_hyperplanes_match_md5_expression(spark, vectors):
    """VERDICT r2 #5: precomputed literal hyperplanes must produce EXACTLY
    the md5-expression buckets (same derivation, computed once driver-side
    instead of per row) — across several tables."""
    from warc_metadata_sidecar_spark.operators.similarity import lsh_srp_buckets

    dims = len(vectors.select("embedding").first().embedding)
    for table in (0, 3):
        lit_rows = {
            r.vec_id: r.srp_bucket
            for r in lsh_srp_buckets(vectors, planes=6, table=table, dims=dims).collect()
        }
        # dims=None on an empty-inference bypass is not reachable here, so
        # force the expression path via the private expr directly
        from warc_metadata_sidecar_spark.operators.similarity import (
            _as_double,
            _srp_bucket_expr,
        )

        e = _as_double(vectors, "embedding")
        expr_rows = {
            r.vec_id: r.b
            for r in e.select(
                "vec_id", _srp_bucket_expr("embedding", 6, table, dims=None).alias("b")
            ).collect()
        }
        assert lit_rows == expr_rows and lit_rows


def test_srp_mixed_width_vectors_fall_back_per_row(spark):
    """A corpus with mixed embedding widths must bucket every row exactly
    like the md5-expression form — the literal-hyperplane fast path only
    applies to rows matching the sampled width."""
    from warc_metadata_sidecar_spark.operators.similarity import (
        _as_double,
        _srp_bucket_expr,
        lsh_srp_buckets,
    )

    rows = [(i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(20)] + [
        (100 + i, [float(i % 3), 1.0]) for i in range(10)  # width-2 stragglers
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r.vec_id: r.srp_bucket for r in lsh_srp_buckets(emb, planes=6).collect()}
    e = _as_double(emb, "embedding")
    ref = {
        r.vec_id: r.b
        for r in e.select(
            "vec_id", _srp_bucket_expr("embedding", 6, 0, dims=None).alias("b")
        ).collect()
    }
    assert got == ref and len(got) == 30


# --- connected-components clustering (dup_clusters) --------------------------

def _uf_components(edges):
    """Union-find twin (independent sequential implementation)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in list(parent):
        out[n] = find(n)
    return out


def test_dup_clusters_chain_worst_case(spark):
    """A pure chain is label propagation's worst case (O(diameter) rounds);
    large/small-star must close it to one component in O(log n) rounds."""
    from warc_metadata_sidecar_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 64)], ["id_a", "id_b"])
    got = dup_clusters(pairs).collect()
    assert {r.doc_id for r in got} == set(range(1, 65))
    assert {r.cluster_id for r in got} == {1}
    assert {r.cluster_size for r in got} == {64}


def test_dup_clusters_matches_union_find_on_random_graph(spark):
    """Deterministic pseudo-random graph (hash-derived edges, multiple
    components, duplicate + reversed + self-loop edges) vs the sequential
    union-find twin."""
    import hashlib

    from warc_metadata_sidecar_spark.operators.dedup import dup_clusters

    edges = []
    for i in range(150):
        h = hashlib.md5(f"edge{i}".encode()).hexdigest()
        a = int(h[:4], 16) % 997
        b = int(h[4:8], 16) % 997
        edges.append((a, b))  # self-loops happen when a == b
        if i % 7 == 0:
            edges.append((b, a))  # reversed duplicates
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in dup_clusters(pairs).collect()}

    want_root = _uf_components([(a, b) for a, b in edges if a != b])
    sizes = {}
    for n, r in want_root.items():
        sizes[r] = sizes.get(r, 0) + 1
    want = {n: (r, sizes[r]) for n, r in want_root.items()}
    assert got == want and len(got) > 20
    # more than one component, or the test is degenerate
    assert len({r for r, _ in got.values()}) > 3


def test_dup_clusters_empty_pairs(spark):
    from warc_metadata_sidecar_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters(pairs).collect() == []


def test_minhash_dedup_clusters_end_to_end(spark):
    """Near-identical docs chain into one cluster; distinct docs stay out."""
    from warc_metadata_sidecar_spark.operators.dedup import minhash_dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, "extra " + base),
        (10, "completely different words about spark shuffles and parquet files"),
        (11, "completely different words about spark shuffles and parquet files"),
        (20, "a lone unique document with no duplicate partner anywhere at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in minhash_dedup_clusters(docs).collect()}
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[10] == (10, 2) and got[11] == (10, 2)
    assert 20 not in got


def test_semantic_dedup_removes_planted_copies(spark):
    """SemDeDup on base + planted exact duplicates: every planted copy ties
    with its source on centroid similarity, loses the id tie-break, and is
    removed; every base row survives. Cluster assignment of a copy equals
    its source's (identical vectors, identical argmax)."""
    from warc_metadata_sidecar_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    out = semantic_dedup(emb.unionByName(planted), k=8, threshold=0.9, iters=1)
    rows = {r.vec_id: r for r in out.collect()}
    n_base = emb.count()
    assert len(rows) == n_base + (n_base + 9) // 10
    for i, r in rows.items():
        if i >= 1000000:
            assert not r.keep, i
            src = rows[i - 1000000]
            assert r.cluster_id == src.cluster_id and r.csim == src.csim
        else:
            assert r.keep, i
    # pair scoring never goes cartesian: the only nested-loop join is the
    # broadcast centroid assignment; cluster pairing is a hash join on
    # cluster_id
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --- large-k coarse assignment (VERDICT r6 task 3) ---------------------------


def _clustered_vectors(spark, n=120, k=8, dims=8):
    """Rows tightly packed around k ORTHOGONAL directions (k <= dims: one
    spike dim per cluster), so both the fine assignment and the coarse
    routing are unambiguous."""
    assert k <= dims
    rows = []
    for i in range(n):
        c = i % k
        v = [0.01 * ((i * 7 + d) % 3) for d in range(dims)]
        v[c] += 10.0
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_coarse_assignment_full_probe_is_bit_exact(spark):
    """With nprobe_coarse == coarse_k (probe every cell) the two-level route
    sees every fine centroid, so it must reproduce the broadcast argmax
    BIT-exactly — same cosine folds, same lowest-id tie rule."""
    from warc_metadata_sidecar_spark.operators.similarity import (
        _assign_buckets,
        _assign_buckets_coarse,
        ivf_train_centroids,
    )

    e = _clustered_vectors(spark).select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")
    )
    cents = ivf_train_centroids(e, 8, "_id", "_v", iters=1)
    exact = {
        r["_id"]: (r["bucket"], r["csim"])
        for r in _assign_buckets(e, cents, "_id", "_v", nprobe=1).collect()
    }
    coarse = {
        r["_id"]: (r["bucket"], r["csim"])
        for r in _assign_buckets_coarse(
            e, cents, "_id", "_v", coarse_k=4, nprobe_coarse=4
        ).collect()
    }
    assert coarse == exact


def test_coarse_assignment_partial_probe_on_clustered_data(spark):
    """nprobe_coarse < coarse_k is the scale setting. On HIERARCHICAL data
    (fine clusters grouped under shared coarse directions — the structure
    real embedding corpora have and the one coarse quantization exploits)
    the partial probe recovers the broadcast assignment exactly, and always
    emits one row per input (each probed cell contains >= its seed)."""
    from warc_metadata_sidecar_spark.operators.similarity import (
        _assign_buckets,
        _assign_buckets_coarse,
        ivf_train_centroids,
    )

    rows_in = []
    for i in range(120):
        c = i % 8            # fine cluster
        g, j = divmod(c, 2)  # coarse group, sub-cluster
        v = [0.01 * ((i * 7 + d) % 3) for d in range(8)]
        v[g] += 10.0
        v[4 + g] += 3.0 if j else -3.0
        rows_in.append((i, [float(x) for x in v]))
    e = spark.createDataFrame(
        rows_in, "vec_id: long, embedding: array<double>"
    ).select(F.col("vec_id").alias("_id"), F.col("embedding").alias("_v"))
    cents = ivf_train_centroids(e, 8, "_id", "_v", iters=1)
    exact = {r["_id"]: r["bucket"] for r in _assign_buckets(e, cents, "_id", "_v").collect()}
    got = _assign_buckets_coarse(e, cents, "_id", "_v", coarse_k=4, nprobe_coarse=2)
    rows = got.collect()
    assert len(rows) == 120 and len({r["_id"] for r in rows}) == 120
    agree = sum(1 for r in rows if exact[r["_id"]] == r["bucket"])
    assert agree == 120


def test_semantic_dedup_large_k_routes_coarse_and_keeps_semantics(spark):
    """k above assign_coarse_threshold takes the coarse two-level route.
    The dedup CONTRACT is route-independent: assignment is a pure function
    of the vector, so a planted identical copy always lands in its source's
    cluster with an equal csim, loses the id tie-break, and is removed —
    while base rows (random embeddings, no near-dups below the planted
    ones) all survive."""
    from warc_metadata_sidecar_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    out = semantic_dedup(
        emb.unionByName(planted),
        k=8,
        threshold=0.9,
        iters=1,
        assign_coarse_threshold=4,  # force the large-k route at k=8
        nprobe_coarse=2,
    )
    rows = {r.vec_id: r for r in out.collect()}
    n_base = emb.count()
    assert len(rows) == n_base + (n_base + 9) // 10
    for i, r in rows.items():
        if i >= 1000000:
            assert not r.keep, i
            src = rows[i - 1000000]
            assert r.cluster_id == src.cluster_id and r.csim == src.csim
        else:
            assert r.keep, i


def test_hard_negatives_srp_path_matches_exact_on_clustered(spark):
    """The SRP-blocked scale path plans no cross join and recovers the
    exact hardest negatives on clustered data (anchors it covers); the
    exact path emits one row per anchor."""
    from warc_metadata_sidecar_spark.operators.similarity import hard_negatives
    from warc_metadata_sidecar_spark.plans.audit import formatted_plan

    emb = _clustered_vectors(spark, n=96, k=8).withColumn(
        "label", F.col("vec_id") % 3
    )
    exact = {
        r["vec_id"]: (r["negative_id"], r["sim"])
        for r in hard_negatives(emb, exact=True).collect()
    }
    assert len(exact) == 96
    srp = hard_negatives(emb, exact=False, planes=4, tables=6)
    plan = formatted_plan(srp)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    got = {r["vec_id"]: (r["negative_id"], r["sim"]) for r in srp.collect()}
    assert len(got) >= 90  # SRP recall on tight clusters
    agree = sum(1 for v in got if exact[v][1] == got[v][1])
    assert agree >= 0.9 * len(got)
