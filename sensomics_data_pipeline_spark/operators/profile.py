"""Table profiling: per-column statistics in one pass (data-quality
staple for 100-TB ingest — nulls, cardinality, ranges — computed as a
single aggregate job, then unpivoted to long form).

One ``agg`` with 4 expressions per column = one scan + one reduce; the
unpivot is a zero-shuffle projection of the 1-row result. Distinct
counts use HyperLogLog (``approx_count_distinct``) — exact distincts
per column would be one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, approx_rsd: float = 0.05, exact: bool = False
) -> DataFrame:
    """Profile every column: (column, n, n_null, approx_distinct,
    min_value, max_value) — min/max stringified so heterogeneous column
    types fit one long schema. ``exact=True`` swaps HLL for exact
    distinct counts (oracle-comparable; one extra expand at scale)."""
    distinct_fn = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd=approx_rsd))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in df.columns:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{c}"),
            distinct_fn(c).alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stacks = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in df.columns
    )
    return one.selectExpr(
        "_n AS n",
        f"stack({len(df.columns)}, {stacks}) AS "
        "(column, n_null, approx_distinct, min_value, max_value)",
    ).select("column", "n", "n_null", "approx_distinct", "min_value", "max_value")


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column:
    ``(bucket, bucket_lo, bucket_hi, n, bucket_min, bucket_max)``.

    Bounds default to the column's min/max, computed in the same plan
    (tiny 1-row aggregate cross-joined back — the A1 two-pass scalar
    pattern, no driver round-trip). Bucket assignment is
    ``least(floor((v - lo) / width), n_buckets - 1)`` — floor on an
    identically-derived double is tie-free across engines, unlike
    fractional round(). NULLs are dropped; the top edge folds into the
    last bucket. One aggregate + one broadcast-of-one-row join + one
    groupBy: two shuffles total, independent of data size."""
    v = F.col(value_col)
    data = df.filter(v.isNotNull())
    if lo is None or hi is None:
        bounds = data.agg(
            F.min(v).cast("double").alias("_lo"),
            F.max(v).cast("double").alias("_hi"),
        )
        data = data.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("_lo"), F.col("_hi")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(n_buckets))
    bucket = F.when(hi_c == lo_c, F.lit(0)).otherwise(
        F.least(
            F.floor((v.cast("double") - lo_c) / width),
            F.lit(n_buckets - 1),
        )
    ).cast("int")
    return (
        data.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.min(lo_c + F.col("bucket") * width).alias("bucket_lo"),
            F.min(lo_c + (F.col("bucket") + 1) * width).alias("bucket_hi"),
            F.count("*").alias("n"),
            F.min(v.cast("double")).alias("bucket_min"),
            F.max(v.cast("double")).alias("bucket_max"),
        )
    )
