"""Product quantization (IVF-PQ, Jégou et al. 2011) — the compressed-
domain ANN path for corpora whose raw vectors don't fit the cluster.

A 64-dim float vector (512 B as doubles) becomes ``m`` 4-bit codes
(m=4, ksub=16 ⇒ 2 B — 128× compression): the vector is split into ``m``
sub-vectors, each quantized to its subspace's nearest of ``ksub``
centroids. Similarity is then computed ENTIRELY from code lookups —
the symmetric-distance (SDC) tables ``T[j][c1][c2] = dot(centroid_j_c1,
centroid_j_c2)`` are m·ksub² literals (4·256 doubles here), so scoring a
candidate pair is m table hits + one divide, never a 64-element fold.

Spark-first shape:
  * training — per-subspace bit-stable Lloyd, REUSING
    similarity.ivf_train_centroids(metric='l2') (md5-seeded init,
    sorted-fold means, broadcast assignment; the r5 determinism
    machinery). The codebook collect is m·ksub rows — model-sized, the
    num-shards-collect precedent.
  * encoding — codebooks are embedded as LITERAL nested arrays (the SRP
    literal-hyperplanes trick): per-subspace argmin is a native
    transform + array_position over 16 literals, ONE projection, zero
    shuffle, no UDF. Per-vector reconstruction norms come from literal
    lookups too.
  * search — candidates meet inside a coarse bucket (the existing
    argmax quantizer from similarity.ivf_buckets), scored by SDC table
    lookups, top-1 per vector via a map-side-combinable max(struct).
    Pair count is bounded by the bucket layout exactly like ivf_topk;
    at 100 TB swap the coarse quantizer for trained centroids + nprobe
    without touching the PQ scoring (that is what IVF-PQ is).

Sequential twin: driver_queries._pq_top1_twin re-trains the codebooks in
pure Python (same seed rule, same fold orders — bit-identical doubles)
and renders the oracle as VALUES; tests/test_pq.py pins module == twin
and measures recall against the exact brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.operators.similarity import (
    _as_double,
    ivf_buckets,
    ivf_train_centroids,
)


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    iters: int = 2,
) -> list[list[list[float]]]:
    """codebooks[j][c] = the d_sub floats of subspace j's centroid c
    (c indexed by the trainer's centroid_id; subspaces with empty
    clusters simply carry fewer centroids — codes stay dense because
    encoding argmins over whatever survived)."""
    d_sub = dims // m
    e = _as_double(embeddings, vec_col).select(id_col, vec_col)
    # the m sub-quantizers are independent — overlap their training jobs
    # from a small thread pool (guide §2.6) instead of m sequential
    # count+iterate+collect chains; each training is deterministic, so the
    # books are byte-identical to the sequential loop's (pinned by
    # tests/test_pq.py). The sampling modulus depends only on the row
    # count, identical for every subspace — computed once here.
    n = e.count()
    sample_mod = max(1, -(-n // (512 * ksub)))

    def train_one(j: int) -> list[list[float]]:
        sub = e.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * d_sub + 1, d_sub).alias("sub"),
        )
        cents = ivf_train_centroids(
            sub, k=ksub, id_col=id_col, vec_col="sub", iters=iters,
            sample_mod=sample_mod, metric="l2",
        )
        rows = sorted(
            (r["centroid_id"], list(r["centroid"])) for r in cents.collect()
        )
        return [v for _, v in rows]

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(m, 4)) as pool:
        return list(pool.map(train_one, range(m)))


def _lit_book(book: list[list[float]]) -> F.Column:
    # one py4j call for the whole codebook literal (was ksub*d_sub F.lit
    # round trips); identical nested-array literal
    return F.lit([[float(x) for x in c] for c in book])


def _l2_expr(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """input + codes:array<int> + rnorm:double (the reconstruction norm
    ‖v̂‖, from literal lookups). Distances are staged as named columns
    per subspace so Catalyst CSE shares each sub-slice (the with_surt
    pattern); everything is one projection — no shuffle, no UDF."""
    m = len(books)
    d_sub = len(books[0][0])
    e = _as_double(embeddings, vec_col)
    for j in range(m):
        sub = F.slice(F.col(vec_col), j * d_sub + 1, d_sub)
        dists = F.transform(_lit_book(books[j]), lambda c: _l2_expr(c, sub))
        e = e.withColumn(f"_d{j}", dists)
    code = [
        (F.array_position(F.col(f"_d{j}"), F.array_min(F.col(f"_d{j}"))) - 1).cast("int")
        for j in range(m)
    ]
    e = e.withColumn("codes", F.array(*code)).drop(*[f"_d{j}" for j in range(m)])
    # ‖v̂‖² = Σ_j ‖centroid_j_codej‖² — literal norm tables, m lookups
    norm_tables = [
        F.lit([float(sum(x * x for x in c)) for c in books[j]]) for j in range(m)
    ]
    n2 = None
    for j in range(m):
        term = F.element_at(norm_tables[j], F.col("codes")[j] + 1)
        n2 = term if n2 is None else n2 + term
    return e.withColumn("rnorm", F.sqrt(n2))


def _dot_expr(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def pq_encode_adc(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_encode + the asymmetric-distance extras: per-vector query LUT
    ``lut[j][c] = dot(sub_j, centroid_j_c)`` (m·ksub doubles per row, one
    native projection) and the exact vector norm ``qnorm`` — so ADC
    scoring against any candidate is m lookups using the EXACT query
    side, the standard IVFADC arrangement."""
    m = len(books)
    d_sub = len(books[0][0])
    enc = pq_encode(embeddings, books, id_col, vec_col)
    luts = []
    for j in range(m):
        sub = F.slice(F.col(vec_col), j * d_sub + 1, d_sub)
        luts.append(F.transform(_lit_book(books[j]), lambda c: _dot_expr(c, sub)))
    n2 = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    return enc.withColumn("lut", F.array(*luts)).withColumn("qnorm", F.sqrt(n2))


def sdc_tables(books: list[list[list[float]]]) -> list[list[list[float]]]:
    """T[j][c1][c2] = dot(books[j][c1], books[j][c2]) — position-order
    fold, mirroring the twin."""
    out = []
    for book in books:
        t = []
        for c1 in book:
            row = []
            for c2 in book:
                acc = 0.0
                for x, y in zip(c1, c2):
                    acc += x * y
                row.append(acc)
            t.append(row)
        out.append(t)
    return out


def _safe_cos(dot: F.Column, denom: F.Column) -> F.Column:
    """Guarded cosine: an all-zero vector (or an all-zero reconstruction)
    yields denom 0 -> dot/denom = NaN, and Spark orders NaN ABOVE every
    double, so a NaN would silently win the max(struct) top-1. Undefined
    cosine ranks LAST instead (-1.0), deterministically; the sequential
    twins apply the identical rule."""
    return F.when(denom > F.lit(0.0), dot / denom).otherwise(F.lit(-1.0))


def pq_top1(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_dims: int = 8,
    mode: str = "adc",
) -> DataFrame:
    """(vec_id, neighbor_id, sim): per vector, the best same-coarse-bucket
    neighbor under PQ-approximated cosine. mode='adc' (default, IVFADC):
    the query side is EXACT — sim = Σ_j lut_a[j][code_b_j] / (‖a‖‖b̂‖);
    mode='sdc': both sides quantized — sim = Σ_j T_j[ca_j][cb_j] /
    (‖â‖‖b̂‖). Either way scoring is m table hits per pair, the join is
    bucket-co-located, and top-1 is a map-side-combinable max(struct)
    with ties to the lowest neighbor id."""
    m = len(books)
    if mode == "adc":
        enc = pq_encode_adc(embeddings, books, id_col, vec_col)
        cols = [F.col(id_col), "bucket", "codes", "rnorm", "lut", "qnorm"]
    else:
        enc = pq_encode(embeddings, books, id_col, vec_col)
        cols = [F.col(id_col), "bucket", "codes", "rnorm"]
    bucketed = ivf_buckets(enc, vec_col=vec_col, dims=coarse_dims).select(*cols)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    )
    dot = None
    if mode == "adc":
        for j in range(m):
            term = F.element_at(F.col("a.lut")[j], F.col("b.codes")[j] + 1)
            dot = term if dot is None else dot + term
        sim = _safe_cos(dot, F.col("a.qnorm") * F.col("b.rnorm"))
    else:
        lit_t = [
            F.lit([[float(v) for v in row] for row in t]) for t in sdc_tables(books)
        ]
        for j, t in enumerate(lit_t):
            term = F.element_at(
                F.element_at(t, F.col("a.codes")[j] + 1), F.col("b.codes")[j] + 1
            )
            dot = term if dot is None else dot + term
        sim = _safe_cos(dot, F.col("a.rnorm") * F.col("b.rnorm"))
    best = (
        pairs.select(
            F.col(f"a.{id_col}").alias("vec_id"),
            F.col(f"b.{id_col}").alias("nid"),
            sim.alias("sim"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("sim").alias("s"), (-F.col("nid")).cast("long").alias("nn")
                )
            ).alias("m")
        )
    )
    return best.select(
        "vec_id",
        (-F.col("m.nn")).cast("long").alias("neighbor_id"),
        F.col("m.s").alias("sim"),
    )


def pq_rerank_top1(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_dims: int = 8,
) -> DataFrame:
    """The production IVFADC pipeline: ADC table scoring builds a
    per-vector shortlist of `shortlist` candidates (cheap — m lookups per
    pair over compressed codes), then ONLY those pairs fetch raw vectors
    for an exact cosine rerank. Full-precision folds run on n·shortlist
    pairs instead of n·|bucket| — PQ's fine-ranking loss is recovered
    while the expensive arithmetic stays linear in n."""
    from warc_metadata_sidecar_spark.operators.similarity import _norm
    from pyspark.sql import Window

    m = len(books)
    enc = pq_encode_adc(embeddings, books, id_col, vec_col)
    bucketed = ivf_buckets(enc, vec_col=vec_col, dims=coarse_dims)
    light = bucketed.select(F.col(id_col), "bucket", "codes", "rnorm", "lut", "qnorm")
    a = light.alias("a")
    b = light.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    )
    dot = None
    for j in range(m):
        term = F.element_at(F.col("a.lut")[j], F.col("b.codes")[j] + 1)
        dot = term if dot is None else dot + term
    adc = _safe_cos(dot, F.col("a.qnorm") * F.col("b.rnorm"))
    w = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("nid"))
    short = (
        pairs.select(
            F.col(f"a.{id_col}").alias("qid"),
            F.col(f"b.{id_col}").alias("nid"),
            adc.alias("adc"),
        )
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .drop("_r", "adc")
    )
    raw = _as_double(embeddings, vec_col).select(
        F.col(id_col).alias("_rid"),
        F.col(vec_col).alias("_rv"),
        _norm(F.col(vec_col)).alias("_rn"),
    )
    scored = (
        short.join(raw, F.col("qid") == F.col("_rid"))
        .select("qid", "nid", F.col("_rv").alias("_qv"), F.col("_rn").alias("_qn"))
        .join(raw, F.col("nid") == F.col("_rid"))
        .withColumn(
            "sim",
            _safe_cos(
                F.aggregate(
                    F.zip_with(F.col("_qv"), F.col("_rv"), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                F.col("_qn") * F.col("_rn"),
            ),
        )
    )
    best = scored.groupBy("qid").agg(
        F.max(
            F.struct(F.col("sim").alias("s"), (-F.col("nid")).cast("long").alias("nn"))
        ).alias("m")
    )
    return best.select(
        F.col("qid").alias("vec_id"),
        (-F.col("m.nn")).cast("long").alias("neighbor_id"),
        F.col("m.s").alias("sim"),
    )


# --- scalar quantization (SQ8) ------------------------------------------------
# The other compression rung next to PQ: per-dimension affine int8 codes
# (4x memory over float32, 8x over doubles) with bounded reconstruction
# error |v - dq(q(v))| <= scale_d / 2. Standard in ANN systems (FAISS
# ScalarQuantizer) as the cheap-but-accurate tier before PQ's aggressive
# compression.


def sq_train(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) in ONE aggregate: 2*dims scalar aggs over
    a single scan, partials combined map-side — the collected row is
    2*dims doubles (model-sized, the codebook-collect precedent), never
    row-scaled."""
    e = _as_double(embeddings, vec_col)
    row = e.agg(
        *[
            F.min(F.element_at(F.col(vec_col), i + 1)).alias(f"mn{i}")
            for i in range(dims)
        ],
        *[
            F.max(F.element_at(F.col(vec_col), i + 1)).alias(f"mx{i}")
            for i in range(dims)
        ],
    ).first()
    return (
        [float(row[f"mn{i}"]) for i in range(dims)],
        [float(row[f"mx{i}"]) for i in range(dims)],
    )


def sq_scales(mins: list[float], maxs: list[float], bits: int = 8) -> list[float]:
    """Affine step per dimension; a constant dimension gets step 1.0 so
    its code is exactly 0 and dequantization returns the constant."""
    levels = (1 << bits) - 1
    return [
        (mx - mn) / levels if mx > mn else 1.0 for mn, mx in zip(mins, maxs)
    ]


def sq_encode(
    embeddings: DataFrame,
    mins: list[float],
    maxs: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """input + codes:array<int>: q_d = clamp(round((v_d - min_d) /
    scale_d), 0, 2^bits - 1) with the trained params embedded as LITERALS
    (the SRP/PQ trick) — ONE projection, zero shuffle, no UDF. The clamp
    is FP armor (v inside [min, max] lands inside the range by algebra;
    out-of-sample vectors saturate like FAISS SQ does)."""
    levels = (1 << bits) - 1
    scales = sq_scales(mins, maxs, bits)
    # SINGLE-PASS shape (an O(dims^2) trap lives here): building the codes
    # as F.array(*[expr_i(vec)]) lets CollapseProject inline the vector
    # cast — and any alias of the array — into EVERY element reference,
    # re-evaluating O(dims) work per element (measured 8x wall at 10x rows
    # before this rewrite). zip_with evaluates each array child exactly
    # once, and the per-dim params ride as CONSTANT-FOLDED literal arrays
    # with O(1) element_at.
    mins_arr = F.lit([float(m) for m in mins])
    scales_arr = F.lit([float(s) for s in scales])
    pos = F.sequence(F.lit(1), F.lit(len(mins)))
    codes = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        pos,
        lambda x, i: F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(float(levels)),
                F.round(
                    (x - F.element_at(mins_arr, i)) / F.element_at(scales_arr, i)
                ),
            ),
        ).cast("int"),
    )
    return embeddings.withColumn("codes", codes)


def sq_roundtrip(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Train + encode + per-vector reconstruction audit: (vec_id,
    sum_codes, max_abs_err) where max_abs_err = max_d |min_d + q_d *
    scale_d - v_d| — bounded by max_d(scale_d)/2, the property the unit
    test asserts. Everything after the 1-row train agg is a single
    projection; the only action is the train collect."""
    mins, maxs = sq_train(embeddings, id_col, vec_col, dims)
    scales = sq_scales(mins, maxs, bits)
    enc = sq_encode(embeddings, mins, maxs, id_col, vec_col, bits)
    # dq built by zip_with(codes, positions) — codes referenced ONCE, so
    # CollapseProject inlining its zip_with costs O(dims), never O(dims^2)
    mins_arr = F.lit([float(m) for m in mins])
    scales_arr = F.lit([float(s) for s in scales])
    pos = F.sequence(F.lit(1), F.lit(dims))
    dq = F.zip_with(
        F.col("codes"),
        pos,
        lambda q, i: F.element_at(mins_arr, i) + q * F.element_at(scales_arr, i),
    )
    return enc.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("sum_codes"),
        F.round(
            F.array_max(
                F.zip_with(
                    dq,
                    F.col(vec_col).cast("array<double>"),
                    lambda a, b: F.abs(a - b),
                )
            ),
            6,
        ).alias("max_abs_err"),
    )
