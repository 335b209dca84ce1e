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


def _cosine(a: str, b: str) -> F.Column:
    """Exact cosine between two array<double> columns — native fold."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


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
    a = e.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
    b = e.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
    cond = F.col("vec_id") != F.col("neighbor_id")
    pairs = a.join(b, ["blk"] if block_col else None, "inner").filter(cond) if block_col else a.crossJoin(b).filter(cond)
    scored = pairs.withColumn("sim", F.round(_cosine("va", "vb"), 6))
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
) -> DataFrame:
    """Lloyd-iterated centroids: (centroid_id, centroid:array<double>).

    Deterministic: initial centroids are the k vectors with the smallest
    md5(id) (a seedless uniform draw); training optionally runs on a
    deterministic hash-sample (`sample_mod`: keep ids with
    xxhash64(id) % sample_mod == 0 — the FAISS practice of training the
    quantizer on a sample, so training cost is independent of corpus size).
    Assignment is a broadcast of k rows — no shuffle of the vectors.
    Each iteration localCheckpoints the k centroid rows (tiny), keeping the
    iterative plan flat."""
    e = _as_double(embeddings, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    if sample_mod and sample_mod > 1:
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
    centroids = (
        seeds.withColumn("_rn", F.row_number().over(w_init))
        .select((F.col("_rn") - 1).alias("centroid_id"), F.col("_v").alias("centroid"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _assign_buckets(e, centroids, "_id", "_v", nprobe=1)
        centroids = (
            assigned.select("bucket", F.posexplode("_v").alias("pos", "x"))
            .groupBy("bucket", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .select(F.col("bucket").alias("centroid_id"), "centroid")
            .localCheckpoint(eager=True)
        )
    return centroids


def _assign_buckets(
    e: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, nprobe: int = 1
) -> DataFrame:
    """Nearest-centroid assignment via a broadcast of the k centroid rows:
    input columns + (bucket, probe_rank), one row per (vector, probed list).

    nprobe=1 (the bulk assignment path) aggregates max(struct(sim, ...)) —
    map-side combinable, so the exchange carries ~one row per vector, not
    the n x k window-sort input. Multi-probe keeps the window."""
    joined = e.crossJoin(F.broadcast(centroids)).withColumn(
        "_csim", _cosine(vec_col, "centroid")
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
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("centroid_id"))
    return (
        joined.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .withColumnRenamed("centroid_id", "bucket")
        .drop("centroid", "_csim")
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
        a = bucketed.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"), "bucket")
        b = bucketed.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"), "bucket")
    else:
        if centroids is None:
            centroids = ivf_train_centroids(e, n_centroids, id_col, vec_col, iters)
        assigned = _assign_buckets(
            e.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
            centroids,
            "_id",
            "_v",
            nprobe=1,
        )
        cand = assigned.select(
            F.col("_id").alias("neighbor_id"), F.col("_v").alias("vb"), "bucket"
        )
        if max_bucket is not None:
            # FAISS-style list truncation: keep the max_bucket members
            # nearest the centroid (deterministic tiebreak on id)
            cand_sim = (
                assigned.join(
                    F.broadcast(centroids),
                    assigned["bucket"] == centroids["centroid_id"],
                )
                .withColumn("_csim", _cosine("_v", "centroid"))
                .drop("centroid", "centroid_id")
            )
            wb = Window.partitionBy("bucket").orderBy(F.desc("_csim"), F.asc("_id"))
            cand = (
                cand_sim.withColumn("_brn", F.row_number().over(wb))
                .filter(F.col("_brn") <= max_bucket)
                .select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("vb"), "bucket")
            )
        probes = _assign_buckets(
            e.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
            centroids,
            "_id",
            "_v",
            nprobe=nprobe,
        )
        a = probes.select(F.col("_id").alias("vec_id"), F.col("_v").alias("va"), "bucket")
        b = cand
    pairs = a.join(b, "bucket").filter(F.col("vec_id") != F.col("neighbor_id"))
    # nprobe > 1 can meet the same pair in several buckets — collapse before
    # ranking so duplicates cannot inflate the top-k
    pairs = pairs.dropDuplicates(["vec_id", "neighbor_id"])
    scored = pairs.withColumn("sim", F.round(_cosine("va", "vb"), 6))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "sim", "rnk")
    )


def _srp_bucket_expr(vec_col: str, planes: int, table: int = 0) -> F.Column:
    """The SRP bucket as a pure column expression over an array<double>
    column: bit p = sign(v . h_p), hyperplane component
    h_p[d] = (nibble of md5('t:p:d') - 7.5) — fixed, engine-reproducible."""

    def plane_component(p: int):
        # one-arg lambda on purpose: a second parameter would make pyspark
        # pass (element, index) and shadow the plane id
        prefix = f"{table}:{p}:" if table else f"{p}:"

        def component(d):
            return (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(F.md5(F.concat(F.lit(prefix), d.cast("string"))), 1, 1),
                ).cast("double")
                - F.lit(7.5)
            )

        return component

    bits = []
    for p in range(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(F.sequence(F.lit(0), F.size(vec_col) - 1), plane_component(p)),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for bcol in bits[1:]:
        bucket = bucket + bcol
    return bucket


def lsh_srp_buckets(
    embeddings: DataFrame,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: int = 0,
) -> DataFrame:
    """Sign-random-projection bucket per vector. `table` salts the planes so
    independent hash tables (LSH bands) can be unioned for recall.
    Returns (vec_id, srp_bucket)."""
    e = _as_double(embeddings, vec_col)
    return e.select(
        F.col(id_col).alias("vec_id"),
        _srp_bucket_expr(vec_col, planes, table).alias("srp_bucket"),
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
    corpus per table (at 100 TB the scan is the dominant cost)."""
    e = _as_double(embeddings, vec_col)
    with_buckets = e.select(
        F.col(id_col).alias("vec_id"),
        *[_srp_bucket_expr(vec_col, planes, table=t).alias(f"b{t}") for t in range(tables)],
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
        va = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        vb = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = cand.join(va, "id_a").join(vb, "id_b")
    else:
        a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
        b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
        pairs = a.join(b, ["blk"] if block_col else None, "inner") if block_col else a.crossJoin(b)
        pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", F.round(_cosine("va", "vb"), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
