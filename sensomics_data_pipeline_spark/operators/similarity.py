"""Similarity search over embedding columns (north-star ops):
brute-force cosine top-k as the correctness baseline, LSH-bucketed
(random hyperplane) variant as the scale path.

The embedding column is ``array<float>``; all arithmetic is JVM-side
higher-order functions (``zip_with`` + ``aggregate``) — no Python UDF
in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per vector via self-join.

    O(n²·d) — the ground-truth baseline. At scale the right physical
    shape is block-nested-loop over repartitioned blocks with the probe
    side broadcast block-by-block; for ANN use ``lsh_topk`` below.
    Deterministic: ties broken by neighbor id.
    """
    a = df.select(
        F.col(key_col).alias("query_id"), F.col(vec_col).alias("_va")
    )
    b = df.select(
        F.col(key_col).alias("neighbor_id"), F.col(vec_col).alias("_vb")
    )
    scored = (
        a.join(b, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 6))
        .drop("_va", "_vb")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed_base: int = 1
) -> Column:
    """Random-hyperplane LSH bucket id: sign pattern of ``n_planes``
    deterministic pseudo-random hyperplanes. Plane weights are derived
    from a hash of (plane, dim-index) — deterministic across engines and
    runs, no stored model needed."""
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        # deterministic ±1 weights per (plane, position)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: v.cast("double")
                * F.when(
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"{seed_base + p}:"),
                                        i.cast("string"),
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("bigint"),
                        F.lit(2),
                    )
                    == 0,
                    1.0,
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(0)
    return bucket


def lsh_topk(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """ANN cosine top-k: bucket vectors by hyperplane sign pattern, then
    exact cosine only within buckets. Recall < 1 by construction
    (candidates limited to same-bucket); the 100-TB path — bucket join
    replaces the all-pairs cross join. Multi-probe (flip one bit) would
    raise recall; kept single-probe for determinism."""
    bucketed = df.select(
        F.col(key_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    a = bucketed.select(
        F.col("vid").alias("query_id"), F.col("vec").alias("_va"), "bucket"
    )
    b = bucketed.select(
        F.col("vid").alias("neighbor_id"), F.col("vec").alias("_vb"), "bucket"
    )
    scored = (
        a.join(b, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 6))
        .drop("_va", "_vb")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "bucket", "cos_sim", "rank")
    )
