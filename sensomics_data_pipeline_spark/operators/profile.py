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
