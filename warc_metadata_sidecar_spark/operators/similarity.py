"""Similarity search over embedding columns (array<float>).

Paths:
  brute_force_topk    exact cosine top-k — the correctness baseline. All
                      arithmetic native (zip_with + aggregate fold), no UDF.
  ivf_topk            IVF ANN. Two quantizers:
                        - centroid-based (the scale path, VERDICT r1 #4):
                          Lloyd-iterated centroids trained on a
                          deterministic sample, broadcast to assign every
                          vector its nearest-centroid bucket; probes visit
                          `nprobe` buckets; candidate lists truncated at
                          `max_bucket` (FAISS-style list truncation). Pair
                          count <= n * nprobe * max_bucket — linear in n.
                        - legacy argmax-over-leading-dims (<=dims buckets),
                          kept as the oracle twin of ann_ivf_top1.
  lsh_srp_buckets     sign-random-projection LSH buckets: deterministic
                      hyperplanes derived from md5(table, plane, dim) so
                      buckets are reproducible across engines and runs.

embedding_cosine_dedup: near-dup detection at a cosine threshold. The
DEFAULT blocker is multi-table SRP buckets (the scale path — candidate
pairs only ever meet inside a bucket); `block_col` uses a caller key
instead, and exact=True keeps the quadratic all-pairs baseline for small
corpora / recall measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> F.Column:
    """Dot product of two array<double> columns — native fold."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(col: F.Column) -> F.Column:
    """L2 norm — computed ONCE per vector row and carried as a column, so
    pair scoring never re-folds the norms per pair (at k candidate pairs
    per vector that re-fold tripled the per-pair lambda work)."""
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(a: str, b: str) -> F.Column:
    """Exact cosine between two array<double> columns — native fold. The
    hot paths precompute norms and use _dot/(na*nb) instead; this form
    remains for one-shot scoring (same arithmetic, identical values)."""
    return _dot(a, b) / (_norm(F.col(a)) * _norm(F.col(b)))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per vector: (vec_id, neighbor_id, sim, rnk).
    `block_col` optionally restricts pairs to a blocking key (e.g. label) —
    without it this is the all-pairs baseline, quadratic by design."""
    e = _as_double(embeddings, vec_col)
    a = e.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"), _norm(F.col(vec_col)).alias("_na"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
    b = e.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"), _norm(F.col(vec_col)).alias("_nb"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
    cond = F.col("vec_id") != F.col("neighbor_id")
    pairs = a.join(b, ["blk"] if block_col else None, "inner").filter(cond) if block_col else a.crossJoin(b).filter(cond)
    scored = pairs.withColumn("sim", F.round(_dot("va", "vb") / (F.col("_na") * F.col("_nb")), 6))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "sim", "rnk")
    )


def ivf_buckets(embeddings: DataFrame, vec_col: str = "embedding", dims: int = 8) -> DataFrame:
    """Coarse bucket = argmax over the first `dims` components (a centroid-
    free quantizer; swap in real centroids via a broadcast-join without
    changing downstream plan shape)."""
    e = _as_double(embeddings, vec_col)
    lead = F.slice(F.col(vec_col), 1, dims)
    return e.withColumn("bucket", F.array_position(lead, F.array_max(lead)).cast("int"))


def ivf_train_centroids(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    sample_mod: int | None = None,
    metric: str = "cosine",
    checkpoint_last: bool = True,
) -> DataFrame:
    """Lloyd-iterated centroids: (centroid_id, centroid:array<double>).

    Deterministic: initial centroids are the k vectors with the smallest
    md5(id) (a seedless uniform draw); training runs on a deterministic
    hash-sample (`sample_mod`: keep ids with xxhash64(id) % sample_mod == 0
    — the FAISS practice of training the quantizer on a sample, so
    training cost is independent of corpus size). sample_mod=None (the
    default) sizes the modulus ADAPTIVELY from one count() so the sample
    is <= ~512*k rows — this is also what keeps the r5 sorted-fold means'
    collect_list bounded: each (bucket, pos) list is sample-sized, never
    corpus-sized (avg ~512 doubles), where the old avg() kept O(1) state
    but was bit-unstable across runs. Small corpora (n <= 512*k, every
    in-repo caller and the oracle twins) resolve to mod=1 — no sampling.
    Pass sample_mod=1 to force full-corpus training explicitly.
    Assignment is a broadcast of k rows — no shuffle of the vectors.
    Each iteration localCheckpoints the k centroid rows (tiny), keeping the
    iterative plan flat."""
    e = _as_double(embeddings, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    n_known: int | None = None
    if sample_mod is None:
        # CEILING division (ADVICE r5): floor let corpora just under
        # 2*512*k resolve to mod=1 and train on ~double the documented
        # <= ~512*k-row bound (doubling the sorted-fold collect_list too)
        n_known = e.count()
        sample_mod = max(1, -(-n_known // (512 * k)))
    if sample_mod > 1:
        e = e.filter(F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(sample_mod)) == 0)
    # init = the k vectors with the smallest md5(id): orderBy().limit(k)
    # plans as distributed TakeOrderedAndProject (per-partition top-k then
    # merge), NOT a global single-task window sort; the row_number window
    # then runs over just k rows
    seeds = (
        e.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(k)
    )
    w_init = Window.orderBy("_h", "_id")
    centroids = seeds.withColumn("_rn", F.row_number().over(w_init)).select(
        (F.col("_rn") - 1).alias("centroid_id"), F.col("_v").alias("centroid")
    )
    # no eager checkpoint of the k-row seed table: it is read exactly once
    # (by iteration 1, whose own checkpoint bounds the lineage), so the
    # extra materialization job bought nothing (r8). iters=0 callers get
    # the lazy seed frame — k rows, evaluated once downstream.
    # Final-iteration checkpoint CADENCE (r8, the pagerank discipline):
    # intermediate iterations MUST materialize (the next iteration
    # references centroids through a broadcast — un-checkpointed lineage
    # would nest), but the LAST frame's checkpoint only bounds consumer
    # lineage. When the training sample is small (the bound the sample_mod
    # design guarantees is known), consumers re-evaluating the sorted-fold
    # agg in 1-3 parallel copies is cheaper than one more serialized
    # driver-blocking job. Unknown or large samples keep the checkpoint.
    # checkpoint_last=False is opted into by consumers whose final job
    # evaluates the centroid lineage only in parallel subtrees
    # (semantic_dedup); consumers that feed it into ANOTHER serialized
    # checkpoint job (ivf_topk's assignment pass) keep the default — there
    # the recompute measured slower, not faster.
    sample_small = n_known is not None and (n_known // max(1, sample_mod)) <= 100_000
    for _it in range(iters):
        assigned = _assign_buckets(e, centroids, "_id", "_v", nprobe=1, metric=metric)
        centroids = (
            assigned.select("bucket", F.posexplode("_v").alias("pos", "x"))
            .groupBy("bucket", "pos")
            # ORDER-INDEPENDENT mean (r5): fold the SORTED values instead of
            # avg() — avg's partial-merge order varies with task completion,
            # so trained centroids (and therefore IVF near-tie assignments)
            # would differ at the bit level BETWEEN RUNS. Bit-stable
            # training is what lets the sequential-twin VALUES oracle (and
            # any cross-run reproducibility check) hold exactly. Bounded:
            # training runs on the k seeds' corpus or a hash-sample
            # (sample_mod), so each (bucket, pos) list is training-sized,
            # not corpus-sized.
            .agg(
                (
                    F.aggregate(
                        F.array_sort(F.collect_list("x")),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .select(F.col("bucket").alias("centroid_id"), "centroid")
        )
        if _it < iters - 1 or checkpoint_last or not sample_small:
            centroids = centroids.localCheckpoint(eager=True)
    return centroids


def _assign_buckets(
    e: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
    metric: str = "cosine",
) -> DataFrame:
    """Nearest-centroid assignment via a broadcast of the k centroid rows:
    input columns + (bucket, probe_rank, csim), one row per (vector, probed
    list); csim = cosine(vector, that list's centroid) so downstream
    truncation never re-derives it.

    nprobe=1 (the bulk assignment path) aggregates max(struct(sim, ...)) —
    map-side combinable, so the exchange carries ~one row per vector, not
    the n x k window-sort input. Multi-probe keeps the window. Norms fold
    once per vector row / centroid row, never per (vector, centroid)
    pair."""
    if metric == "l2":
        # PQ sub-quantizer metric: "similarity" = negative squared L2
        # (position-order fold — the sequential twin mirrors it exactly);
        # same argmax/tie-to-lowest-id machinery downstream
        joined = e.crossJoin(F.broadcast(centroids)).withColumn(
            "_csim",
            -F.aggregate(
                F.zip_with(F.col(vec_col), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
    else:
        e_n = e.withColumn("_vn", _norm(F.col(vec_col)))
        cents_n = centroids.withColumn("_cn", _norm(F.col("centroid")))
        joined = (
            e_n.crossJoin(F.broadcast(cents_n))
            .withColumn("_csim", _dot(vec_col, "centroid") / (F.col("_vn") * F.col("_cn")))
            .drop("_vn", "_cn")
        )
    if nprobe == 1:
        # deterministic argmax: ties on sim break to the LOWEST centroid_id
        # (negated id inside the max struct), matching the window ordering
        best = joined.groupBy(id_col).agg(
            F.max(
                F.struct(
                    F.col("_csim").alias("s"),
                    (-F.col("centroid_id")).cast("long").alias("nc"),
                    F.col(vec_col).alias("v"),
                )
            ).alias("m")
        )
        return best.select(
            id_col,
            F.col("m.v").alias(vec_col),
            (-F.col("m.nc")).cast("int").alias("bucket"),
            F.lit(1).alias("probe_rank"),
            F.col("m.s").alias("csim"),
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("centroid_id"))
    return (
        joined.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .withColumnRenamed("centroid_id", "bucket")
        .withColumnRenamed("_csim", "csim")
        .drop("centroid")
    )


def _assign_buckets_coarse(
    e: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    coarse_k: int | None = None,
    nprobe_coarse: int = 4,
) -> DataFrame:
    """Two-level nearest-centroid assignment for LARGE k (VERDICT r6 task 3):
    never broadcasts the k-row centroid table. Output schema matches
    `_assign_buckets(..., nprobe=1)`: (id, vec, bucket, probe_rank=1, csim).

    Shape: coarse seeds are a deterministic ~sqrt(k) SLICE of the fine
    centroids themselves (every `step`-th centroid_id), so (a) only the
    sqrt(k)-row coarse table is ever broadcast, and (b) every coarse cell is
    non-empty — a seed's own fine centroid routes to itself at cosine 1 —
    so every row meets >= 1 fine candidate. Fine centroids route to their
    nearest coarse seed (k x sqrt(k), centroid-table-sized); rows probe
    their `nprobe_coarse` nearest seeds (n x sqrt(k) broadcast argmax, the
    bounded kind); candidates then meet through a plain shuffle EQUI-JOIN on
    the cell key — per row ~nprobe_coarse * k/sqrt(k) candidates instead of
    k, and no unbounded broadcast anywhere. The per-row argmax uses the
    exact `_assign_buckets` tie rule (max csim, ties to lowest centroid_id)
    and the same cosine folds, so with nprobe_coarse == coarse_k (probe
    everything) results are bit-identical to the broadcast path.

    Standard IVF approximation: with nprobe_coarse < coarse_k the true
    nearest fine centroid can live in an unprobed cell (recall knob, like
    ivf_topk's nprobe). SemDeDup routes here when k exceeds its broadcast
    threshold; the small-k exact path remains the oracle twin."""
    k = centroids.count()
    if coarse_k is None:
        coarse_k = max(1, int(round(k ** 0.5)))
    nprobe_coarse = min(nprobe_coarse, coarse_k)
    # deterministic seed slice: every step-th centroid by id RANK (ids may
    # have gaps from empty Lloyd clusters — ranking guarantees exactly
    # ceil(k/step) seeds, and rank 1 always exists). The window runs over
    # the k-row centroid table only, never the corpus; nothing k-sized is
    # collected to the driver or broadcast to executors.
    step = max(1, -(-k // coarse_k))
    wseed = Window.orderBy("centroid_id")
    coarse = (
        centroids.withColumn("_rk", F.row_number().over(wseed))
        .filter((F.col("_rk") - 1) % step == 0)
        .drop("_rk")
    )
    fine = centroids.select(
        F.col("centroid_id").alias("_fid"), F.col("centroid").alias("_fv")
    )
    routed = _assign_buckets(fine, coarse, "_fid", "_fv", nprobe=1).select(
        F.col("bucket").alias("_cell"),
        "_fid",
        "_fv",
        _norm(F.col("_fv")).alias("_fn"),
    )
    probes = _assign_buckets(e, coarse, id_col, vec_col, nprobe=nprobe_coarse).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("bucket").alias("_cell"),
        _norm(F.col(vec_col)).alias("_vn"),
    )
    scored = probes.join(routed, "_cell").withColumn(
        "_csim", _dot(vec_col, "_fv") / (F.col("_vn") * F.col("_fn"))
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("_csim").alias("s"),
                (-F.col("_fid")).cast("long").alias("nc"),
                F.col(vec_col).alias("v"),
            )
        ).alias("m")
    )
    return best.select(
        id_col,
        F.col("m.v").alias(vec_col),
        (-F.col("m.nc")).cast("int").alias("bucket"),
        F.lit(1).alias("probe_rank"),
        F.col("m.s").alias("csim"),
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 8,
    n_centroids: int | None = None,
    centroids: DataFrame | None = None,
    nprobe: int = 1,
    max_bucket: int | None = None,
    iters: int = 2,
) -> DataFrame:
    """ANN top-k: (vec_id, neighbor_id, sim, rnk).

    With `n_centroids`/`centroids` set this is the scale path: k~sqrt(n)
    trained centroids, probes visit `nprobe` buckets, candidate lists
    truncated to the `max_bucket` members nearest their centroid (so a
    degenerate bucket cannot re-quadratize the join; truncated members
    still probe as queries). Without them, the legacy argmax-over-leading-
    dims quantizer — the exact twin of the ann_ivf_top1 oracle query."""
    e = _as_double(embeddings, vec_col)
    if n_centroids is None and centroids is None:
        bucketed = ivf_buckets(embeddings, vec_col, dims)
        a = bucketed.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"),
            _norm(F.col(vec_col)).alias("_na"), "bucket",
        )
        b = bucketed.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"),
            _norm(F.col(vec_col)).alias("_nb"), "bucket",
        )
    else:
        if centroids is None:
            centroids = ivf_train_centroids(e, n_centroids, id_col, vec_col, iters)
        # ONE assignment pass serves both sides (VERDICT r2 #6 — it ran
        # twice): candidate lists are the probe_rank=1 slice of the nprobe
        # probes (identical tie-break: desc(csim), asc(centroid_id) at rank 1
        # == the argmax's lowest-centroid-id rule), and the truncation
        # ordering reuses the already-computed centroid cosine. The eager
        # checkpoint materializes the crossJoin exactly once (on a real
        # cluster: persist(DISK) instead of memory-checkpoint).
        assigned = _assign_buckets(
            e.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
            centroids,
            "_id",
            "_v",
            nprobe=nprobe,
        ).localCheckpoint(eager=True)
        cand = assigned.filter(F.col("probe_rank") == 1)
        if max_bucket is not None:
            # FAISS-style list truncation: keep the max_bucket members
            # nearest the centroid (deterministic tiebreak on id)
            wb = Window.partitionBy("bucket").orderBy(F.desc("csim"), F.asc("_id"))
            cand = (
                cand.withColumn("_brn", F.row_number().over(wb))
                .filter(F.col("_brn") <= max_bucket)
            )
        a = assigned.select(
            F.col("_id").alias("vec_id"), F.col("_v").alias("va"),
            _norm(F.col("_v")).alias("_na"), "bucket",
        )
        b = cand.select(
            F.col("_id").alias("neighbor_id"), F.col("_v").alias("vb"),
            _norm(F.col("_v")).alias("_nb"), "bucket",
        )
    pairs = a.join(b, "bucket").filter(F.col("vec_id") != F.col("neighbor_id"))
    if k == 1:
        # top-1 is an argmax: partial-aggregates map-side, so the (possibly
        # nprobe-duplicated) pair stream never takes a dedup shuffle NOR a
        # per-vector sort — duplicates cannot change a max. Tie-break
        # identical to the window path: desc(sim), asc(neighbor_id), via
        # min(struct(-sim, neighbor_id)); sim rides in the struct so no
        # -0.0 renegotiation on output.
        scored = pairs.withColumn(
            "sim", F.round(_dot("va", "vb") / (F.col("_na") * F.col("_nb")), 6)
        )
        best = scored.groupBy("vec_id").agg(
            F.min(
                F.struct(
                    (-F.col("sim")).alias("ns"),
                    F.col("neighbor_id").alias("n"),
                    F.col("sim").alias("s"),
                )
            ).alias("m")
        )
        return best.select(
            "vec_id",
            F.col("m.n").alias("neighbor_id"),
            F.col("m.s").alias("sim"),
            F.lit(1).alias("rnk"),
        )
    # nprobe > 1 can meet the same pair in several buckets — collapse before
    # ranking so duplicates cannot inflate the top-k
    pairs = pairs.dropDuplicates(["vec_id", "neighbor_id"])
    scored = pairs.withColumn(
        "sim", F.round(_dot("va", "vb") / (F.col("_na") * F.col("_nb")), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "sim", "rnk")
    )


def _srp_plane_component(table: int, p: int, d: int) -> float:
    """Driver-side twin of the md5-derived hyperplane component: the first
    hex nibble of md5('t:p:d') mapped exactly like the SQL form
    instr('0123456789abcdef', nibble) - 7.5 (instr is 1-based)."""
    import hashlib

    prefix = f"{table}:{p}:" if table else f"{p}:"
    nibble = hashlib.md5(f"{prefix}{d}".encode()).hexdigest()[0]
    return float("0123456789abcdef".index(nibble) + 1) - 7.5


def srp_hyperplanes(planes: int, table: int, dims: int) -> list[list[float]]:
    """The fixed SRP hyperplanes as plain Python lists — precomputed ONCE on
    the driver (VERDICT r2 #5: deriving each component per ROW cost
    tables x planes x dims md5 calls per vector; the hyperplanes are
    constants, so the scan should be pure multiply-adds)."""
    return [
        [_srp_plane_component(table, p, d) for d in range(dims)] for p in range(planes)
    ]


def _srp_bucket_expr(
    vec_col: str, planes: int, table: int = 0, dims: int | None = None
) -> F.Column:
    """The SRP bucket as a pure column expression over an array<double>
    column: bit p = sign(v . h_p), hyperplane component
    h_p[d] = (nibble of md5('t:p:d') - 7.5) — fixed, engine-reproducible.

    With `dims` known, the hyperplanes are embedded as array literals and the
    fold is multiply-add only; dims=None keeps the self-describing md5 form
    (same buckets, pinned by test) for callers that cannot know the width."""

    hyperplanes = srp_hyperplanes(planes, table, dims) if dims is not None else None

    # Built as ONE SQL expression string (r8): the Column-by-Column form made
    # ~3,500 py4j round trips per table (64 F.lit per plane literal + lambda
    # conversions for the md5 fallback) — several SECONDS of driver-side
    # construction before any job ran. One F.expr per table is ~1 round trip;
    # the parsed expression tree is operator-for-operator identical, so
    # buckets are unchanged (pinned by tests/test_dedup_similarity.py).
    v = f"`{vec_col}`"
    bits = []
    for p in range(planes):
        prefix = f"{table}:{p}:" if table else f"{p}:"
        md5_hp = (
            f"transform(sequence(0, size({v}) - 1), d -> "
            f"CAST(instr('0123456789abcdef', substring(md5(concat('{prefix}', "
            f"CAST(d AS STRING))), 1, 1)) AS DOUBLE) - 7.5D)"
        )
        if hyperplanes is not None:
            # the literal plane only applies to rows of the sampled width;
            # any other width falls back to the md5 form per row (zip_with
            # against a wrong-length literal would null-pad and silently
            # collapse those vectors toward bucket 0)
            lits = ", ".join(f"{x!r}D" for x in hyperplanes[p])
            hp = (
                f"CASE WHEN size({v}) = {dims} THEN array({lits}) "
                f"ELSE {md5_hp} END"
            )
        else:
            hp = md5_hp
        dot = (
            f"aggregate(zip_with({v}, {hp}, (x, h) -> x * h), "
            f"CAST(0 AS DOUBLE), (acc, vv) -> acc + vv)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def _infer_dims(e: DataFrame, vec_col: str) -> int | None:
    """Embedding width from one row (a single-row head scan — cheap next to
    the corpus-wide per-row md5 it replaces); None on an empty frame."""
    row = e.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row.d) if row is not None and row.d is not None and row.d > 0 else None


def lsh_srp_buckets(
    embeddings: DataFrame,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: int = 0,
    dims: int | None = None,
) -> DataFrame:
    """Sign-random-projection bucket per vector. `table` salts the planes so
    independent hash tables (LSH bands) can be unioned for recall.
    Returns (vec_id, srp_bucket). dims (inferred when omitted) switches the
    hyperplanes to precomputed literals — same buckets, no per-row md5."""
    e = _as_double(embeddings, vec_col)
    if dims is None:
        dims = _infer_dims(e, vec_col)
    return e.select(
        F.col(id_col).alias("vec_id"),
        _srp_bucket_expr(vec_col, planes, table, dims).alias("srp_bucket"),
    )


def srp_candidate_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    tables: int = 6,
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b) pairs sharing an SRP bucket in at least one of `tables`
    independent hash tables. Multi-table union gives ~95% recall at cosine
    0.9 with 6 planes x 6 tables; `max_bucket` drops degenerate buckets
    (the same boilerplate guard as dedup.lsh_candidate_pairs).

    One scan: all `tables` bucket expressions are computed per row in a
    single pass and posexploded into (vec_id, band) — not one scan of the
    corpus per table (at 100 TB the scan is the dominant cost). Hyperplanes
    are precomputed driver-side literals (VERDICT r2 #5), so the scan is
    multiply-adds only; the md5 expression form remains the fallback when
    the width cannot be inferred (empty frame)."""
    e = _as_double(embeddings, vec_col)
    dims = _infer_dims(e, vec_col)
    with_buckets = e.select(
        F.col(id_col).alias("vec_id"),
        *[
            _srp_bucket_expr(vec_col, planes, table=t, dims=dims).alias(f"b{t}")
            for t in range(tables)
        ],
    )
    stacked = with_buckets.select(
        "vec_id",
        F.posexplode(F.array(*[F.col(f"b{t}") for t in range(tables)])).alias("_t", "_b"),
    )
    bands = stacked.select(
        "vec_id",
        F.concat(F.col("_t").cast("string"), F.lit(":"), F.col("_b").cast("string")).alias(
            "band"
        ),
    )
    sized = bands.withColumn("bucket_n", F.count("*").over(Window.partitionBy("band")))
    bounded = sized.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    left = bounded.select(F.col("vec_id").alias("id_a"), "band")
    right = bounded.select(F.col("vec_id").alias("id_b"), "band")
    return (
        left.join(right, (left.band == right.band) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
    )


def embedding_cosine_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    exact: bool = False,
    planes: int = 6,
    tables: int = 6,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold: (id_a, id_b, sim).

    DEFAULT (VERDICT r1 #4 fix): candidates come from multi-table SRP
    buckets, so the join never goes quadratic in corpus size — exact cosine
    is verified only on bucket-mates. `block_col` blocks on a caller key
    instead; `exact=True` restores the all-pairs crossJoin (the correctness
    baseline for recall measurement on small corpora)."""
    e = _as_double(embeddings, vec_col)
    if block_col is None and not exact:
        cand = srp_candidate_pairs(e, id_col, vec_col, planes, tables, max_bucket)
        va = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), _norm(F.col(vec_col)).alias("_na"))
        vb = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), _norm(F.col(vec_col)).alias("_nb"))
        pairs = cand.join(va, "id_a").join(vb, "id_b")
    else:
        a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), _norm(F.col(vec_col)).alias("_na"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
        b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), _norm(F.col(vec_col)).alias("_nb"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
        pairs = a.join(b, ["blk"] if block_col else None, "inner") if block_col else a.crossJoin(b)
        pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", F.round(_dot("va", "vb") / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 1,
    max_cluster: int = 1000,
    sample_mod: int | None = None,
    assign_coarse_threshold: int = 1024,
    nprobe_coarse: int = 4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means, then
    inside each cluster drop every member that has a near-duplicate
    (cosine >= threshold) which sits FURTHER from the cluster centroid —
    i.e. per duplicate group, the survivor is the member with the lowest
    centroid similarity (the paper's keep-low-csim rule; ties break to the
    lowest id). Returns one row per input vector:
    (vec_id, cluster_id, csim, keep).

    Spark shape / 100 TB notes:
      * training: `ivf_train_centroids` — bit-stable sorted-fold Lloyd on a
        hash-sample bounded to ~512*k rows, cost independent of corpus size;
      * assignment: SemDeDup sets k ~ n / target_cluster, so k itself grows
        with the corpus and broadcasting all k centroids is unbounded
        (VERDICT r6 task 3). Small k (<= assign_coarse_threshold): broadcast
        argmax, one corpus scan, zero shuffle. Large k: the two-level
        `_assign_buckets_coarse` route — only a ~sqrt(k) coarse slice is
        broadcast, fine candidates meet rows through a shuffle equi-join on
        the coarse cell, per-row work drops from k to
        ~nprobe_coarse * sqrt(k) (standard IVF coarse quantization; recall
        knob = nprobe_coarse, and cross-cell misses only affect cluster
        MEMBERSHIP, the dedup rule inside each cluster is unchanged);
      * pair scoring: ONE shuffle on cluster_id; pairwise cost is
        sum(|c|^2) ~= n * avg_cluster, kept linear by choosing
        k ~= n / target_cluster (SemDeDup runs at ~few-thousand-member
        clusters) plus the `max_cluster` guard that skips degenerate
        clusters (pathological mass at one centroid is boilerplate signal,
        same rationale as the LSH `max_bucket` guard — skipped clusters
        keep all members, reported keep=true);
      * norms fold once per row and ride the join, never per pair.

    csim is rounded half-even to 6 (the cross-engine contract used by every
    cosine oracle); the keep decision compares UNROUNDED csims — both sides
    are computed by the same position-order folds, so the comparison is
    deterministic within and across runs (bit-stable training, r5).

    Reference parity note: the reference engine has no embedding operators
    (warc_metadata_sidecar.py is per-record metadata extraction); this is
    part of the training-data operator family layered on top (SURVEY §2c).
    """
    e = _as_double(embeddings, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    cents = ivf_train_centroids(
        e, k, id_col="_id", vec_col="_v", iters=iters, sample_mod=sample_mod,
        checkpoint_last=False,
    )
    if k > assign_coarse_threshold:
        assigned = _assign_buckets_coarse(
            e, cents, "_id", "_v", nprobe_coarse=nprobe_coarse
        )
    else:
        assigned = _assign_buckets(e, cents, "_id", "_v", nprobe=1)
    sized = assigned.withColumn(
        "_cn", F.count("*").over(Window.partitionBy("bucket"))
    )
    bounded = sized.filter(F.col("_cn") <= max_cluster)
    a = bounded.select(
        F.col("_id").alias("_ida"),
        F.col("_v").alias("_va"),
        _norm(F.col("_v")).alias("_na"),
        F.col("csim").alias("_csa"),
        F.col("bucket"),
    )
    b = bounded.select(
        F.col("_id").alias("_idb"),
        _norm(F.col("_v")).alias("_nb"),
        F.col("_v").alias("_vb"),
        F.col("csim").alias("_csb"),
        F.col("bucket"),
    )
    # a is the candidate for REMOVAL: it needs a duplicate mate b that is
    # closer to (or tied with, lower id) the centroid than a is
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("_ida") != F.col("_idb"))
        .filter(
            (F.col("_csb") < F.col("_csa"))
            | ((F.col("_csb") == F.col("_csa")) & (F.col("_idb") < F.col("_ida")))
        )
        .withColumn("_sim", F.round(_dot("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("_sim") >= threshold)
    )
    removed = pairs.select(F.col("_ida").alias("_id")).distinct()
    return (
        assigned.join(removed.withColumn("_rm", F.lit(True)), "_id", "left")
        .select(
            F.col("_id").alias("vec_id"),
            F.col("bucket").alias("cluster_id"),
            F.round(F.col("csim"), 6).alias("csim"),
            F.coalesce(~F.col("_rm"), F.lit(True)).alias("keep"),
        )
    )


def hard_negatives(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    planes: int = 6,
    tables: int = 6,
    max_bucket: int = 1000,
    round_digits: int = 4,
) -> DataFrame:
    """Hard-negative mining (r7): per anchor, the most cosine-similar
    vector with a DIFFERENT label — the pair-construction step of a
    contrastive/embedding training pipeline (hardest in-batch negatives at
    corpus scale). Returns (vec_id, negative_id, sim); ranking and ties
    use the ROUNDED sim (desc) then the lowest negative id, so the order
    is engine-stable.

    Scale shape: the DEFAULT candidate generator is the multi-table SRP
    bucketing (srp_candidate_pairs — the embedding_cosine_dedup scale
    path): each undirected candidate pair scores its cosine ONCE, emits
    two directed rows, and the per-anchor argmax is a map-side-combinable
    min(struct). No crossJoin anywhere; norms fold once per side.
    `exact=True` keeps the all-pairs baseline (the oracle twin / recall
    reference for small corpora). Anchors whose every candidate shares
    their label emit no row under the SRP path (exact path: only if the
    whole corpus shares one label).

    Dual-dialect twin: driver_queries._Q["hard_negatives"]; module==twin
    pinned in tests/test_module_oracle_parity.py."""
    e = _as_double(embeddings, vec_col)
    a = e.select(
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        _norm(F.col(vec_col)).alias("_na"),
        F.col(label_col).alias("_la"),
    )
    b = e.select(
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        _norm(F.col(vec_col)).alias("_nb"),
        F.col(label_col).alias("_lb"),
    )
    if exact:
        und = a.crossJoin(b).filter(F.col("_ida") < F.col("_idb"))
    else:
        cand = srp_candidate_pairs(e, id_col, vec_col, planes, tables, max_bucket)
        und = cand.join(a, cand["id_a"] == a["_ida"]).join(
            b, cand["id_b"] == b["_idb"]
        )
    scored = (
        und.filter(F.col("_la") != F.col("_lb"))
        .withColumn(
            "sim",
            F.round(_dot("_va", "_vb") / (F.col("_na") * F.col("_nb")), round_digits),
        )
        .select("_ida", "_idb", "sim")
    )
    directed = scored.unionByName(
        scored.select(
            F.col("_idb").alias("_ida"), F.col("_ida").alias("_idb"), "sim"
        )
    )
    best = directed.groupBy("_ida").agg(
        F.min(
            F.struct(
                (-F.col("sim")).alias("ns"),
                F.col("_idb").alias("n"),
                F.col("sim").alias("s"),
            )
        ).alias("m")
    )
    return best.select(
        F.col("_ida").alias("vec_id"),
        F.col("m.n").alias("negative_id"),
        F.col("m.s").alias("sim"),
    )
