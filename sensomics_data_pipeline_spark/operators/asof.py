"""Generic as-of join between two DataFrames (SURVEY.md §2.4 J1's
general form; the pandas ``merge_asof`` surface).

Spark has no native as-of join; the scalable shape is the union-stream
trick: tag both inputs, union them, sort once per key group, and carry
the build side's latest values forward with ``last(ignorenulls)``.
One shuffle on (by-keys), no range join, no BroadcastNestedLoop —
linear in |left|+|right| and partitioned by the join keys.

``tolerance``: like ``pd.merge_asof(tolerance=...)``, matches further
back than ``tolerance`` seconds are nulled out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row at or before
    it (``direction='backward'``; ``'forward'`` mirrors). Right columns
    appear as ``<col><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    value_cols = value_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    l_tag = left.withColumn("_is_left", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        *by,
        on,
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_is_left", F.lit(0))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag)

    asc = direction == "backward"
    order = [F.col(on).asc() if asc else F.col(on).desc(), F.col("_is_left").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = unioned
    carried_ts = F.last(
        F.when(F.col("_is_left") == 0, F.col(on)), ignorenulls=True
    ).over(w)
    out = out.withColumn(f"{on}{suffix}", carried_ts)
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.last(
                F.when(F.col("_is_left") == 0, F.col(f"{c}{suffix}")),
                ignorenulls=True,
            ).over(w),
        )
    out = out.filter(F.col("_is_left") == 1).drop("_is_left")
    if tolerance_s is not None:
        gap = F.abs(
            F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"{on}{suffix}"))
        ) / 1_000_000.0
        keep = gap <= tolerance_s
        for c in [f"{on}{suffix}", *[f"{c}{suffix}" for c in value_cols]]:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out
