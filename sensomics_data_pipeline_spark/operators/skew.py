"""Skew-mitigation utilities for hot keys (100-TB design, SURVEY.md §4.2).

AQE's skew-join handles join-side skew at runtime; these helpers cover
the cases AQE doesn't: aggregation skew (one device/user producing a
large fraction of rows) and deliberate two-stage combines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a random salt: stage 1 aggregates on
    (group_cols, salt) — splitting a hot key across ``n_salts``
    reducers — stage 2 combines the partials on group_cols alone.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}; all four have exact distributive combines.
    (avg = sum/count composed by the caller; distinct-aggs need a
    different plan.) Spark's hash aggregate already does map-side
    partial combine, so this matters when the *post-combine* per-key
    load is still skewed — thousands of map partitions all funnelling
    one key to one reducer.
    """
    combine_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[
            stage1_fn[fn](src).alias(f"_p_{out}")
            for out, (src, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            combine_fn[fn](f"_p_{out}").alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )


def with_salted_key(
    df: DataFrame, key_col: str, hot_keys: list, n_salts: int = 8,
    salted_col: str = "_salted_key",
) -> DataFrame:
    """Explicit join-salting: hot keys get ``key#salt`` variants (the
    dimension side must be exploded with ``explode_salts`` to match).
    For when AQE skew-join can't help (e.g. broadcast ineligible)."""
    is_hot = F.col(key_col).isin(hot_keys)
    salt = (F.rand(seed=42) * n_salts).cast("int")
    return df.withColumn(
        salted_col,
        F.when(
            is_hot, F.concat_ws("#", F.col(key_col).cast("string"), salt.cast("string"))
        ).otherwise(F.col(key_col).cast("string")),
    )


def explode_salts(
    dim: DataFrame, key_col: str, hot_keys: list, n_salts: int = 8,
    salted_col: str = "_salted_key",
) -> DataFrame:
    """Dimension-side counterpart of ``with_salted_key``: replicate hot
    rows once per salt so the salted equi-join finds every variant."""
    is_hot = F.col(key_col).isin(hot_keys)
    salts = F.when(
        is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(-1)))
    exploded = dim.withColumn("_s", F.explode(salts))
    return exploded.withColumn(
        salted_col,
        F.when(
            F.col("_s") >= 0,
            F.concat_ws("#", F.col(key_col).cast("string"), F.col("_s").cast("string")),
        ).otherwise(F.col(key_col).cast("string")),
    ).drop("_s")
