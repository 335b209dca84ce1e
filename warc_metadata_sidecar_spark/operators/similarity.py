"""Similarity search over embedding columns (array<float>).

Two paths:
  brute_force_topk    exact cosine top-k — the correctness baseline. All
                      arithmetic native (zip_with + aggregate fold), no UDF.
  ivf_topk            IVF-style ANN: coarse quantization buckets (argmax
                      over leading dims, or provided centroids) prune the
                      pair space; exact cosine within bucket. The scale
                      path: pair count drops from O(n^2) to O(n^2 / buckets)
                      with recall measured against the brute-force baseline.
  lsh_srp_buckets     sign-random-projection LSH buckets: deterministic
                      hyperplanes derived from md5(dim, plane) so buckets
                      are reproducible across engines and runs.

Also embedding_cosine_dedup: near-dup detection at a cosine threshold
(the embedding leg of the dedup family in operators/dedup.py).
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


def ivf_topk(
    embeddings: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 8,
) -> DataFrame:
    """ANN top-k within coarse buckets: (vec_id, neighbor_id, sim, rnk)."""
    bucketed = ivf_buckets(embeddings, vec_col, dims)
    a = bucketed.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"), "bucket")
    b = bucketed.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("sim", F.round(_cosine("va", "vb"), 6))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "sim", "rnk")
    )


def lsh_srp_buckets(
    embeddings: DataFrame,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket per vector: bit p = sign(v . h_p) where
    hyperplane component h_p[d] = (nibble of md5('p:d') - 7.5) — a fixed,
    engine-reproducible pseudo-random direction. Returns (vec_id, srp_bucket)."""
    e = _as_double(embeddings, vec_col)

    def plane_component(p: int):
        # one-arg lambda on purpose: a second parameter would make pyspark
        # pass (element, index) and shadow the plane id
        prefix = f"{p}:"

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
    return e.select(F.col(id_col).alias("vec_id"), bucket.alias("srp_bucket"))


def embedding_cosine_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold: (id_a, id_b, sim)."""
    e = _as_double(embeddings, vec_col)
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), *([] if block_col is None else [F.col(block_col).alias("blk")]))
    pairs = a.join(b, ["blk"] if block_col else None, "inner") if block_col else a.crossJoin(b)
    pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", F.round(_cosine("va", "vb"), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
