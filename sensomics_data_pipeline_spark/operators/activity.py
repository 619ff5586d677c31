"""Activity-classification operators (SURVEY.md §2.5 A2-A4, §2.6 W5):
quantile thresholds from in-sleep accelerometer data, tumbling-window
outlier-fraction categorization, and the full sleep/activity pipeline
composition lives in ``plans.pipelines``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.functions.timeops import tumbling_window_start
from sensomics_data_pipeline_spark.operators.intervals import interval_semijoin
from sensomics_data_pipeline_spark.operators.windows import merge_adjacent_categorized


def sleep_acc_thresholds(
    acc: DataFrame,
    sleep_intervals: DataFrame,
    partition_cols: list[str],
    ts_col: str = "date_time",
    g_col: str = "g_force",
    quantiles: tuple[float, float] = (0.025, 0.975),
    round_decimals: int | None = None,
) -> DataFrame:
    """A2+J3: exact quantiles of g-force inside sleep intervals
    (``sleep_acc_thresh``, ``/root/reference/activity_categorize.py:
    151-162``): baseline stillness band per subject.

    Exact ``percentile`` for oracle parity (numpy linear interpolation ≡
    SQL percentile_cont); swap to ``percentile_approx`` at 100 TB and
    document the tolerance — the thresholds feed a 5/10% cutoff so 1e-3
    relative error is immaterial.

    ``round_decimals``: optional rounding of both thresholds before
    they feed the outlier comparison — the repo-wide oracle-parity
    convention for aggregate-derived doubles (interpolated quantiles
    can differ across engines in the last ulp; the downstream 5/10%
    cutoff makes 1e-6 rounding semantically free). ``None`` keeps the
    reference's unrounded floats.
    """
    in_sleep = interval_semijoin(acc, sleep_intervals, partition_cols, ts_col)
    grouping = in_sleep.groupBy(*partition_cols) if partition_cols else in_sleep.groupBy()
    out = grouping.agg(
        F.expr(f"percentile({g_col}, {quantiles[0]})").alias("lower_threshold"),
        F.expr(f"percentile({g_col}, {quantiles[1]})").alias("upper_threshold"),
    )
    if round_decimals is not None:
        out = out.select(
            *partition_cols,
            F.round("lower_threshold", round_decimals).alias("lower_threshold"),
            F.round("upper_threshold", round_decimals).alias("upper_threshold"),
        )
    return out


def categorize_windows(
    acc: DataFrame,
    thresholds: DataFrame,
    partition_cols: list[str],
    ts_col: str = "date_time",
    g_col: str = "g_force",
    bin_minutes: int = 5,
    cutoffs: tuple[float, float] = (5.0, 10.0),
    merge: bool = True,
) -> DataFrame:
    """W5+A3+A4: tumbling-window activity categorization
    (``acc_categorize`` + ``bin_categorize``,
    ``/root/reference/activity_categorize.py:164-192``).

    Per 5-minute window: % of samples outside [lower, upper] →
    ``> 10%`` high active, ``> 5%`` low active, else rest. Thresholds
    join is broadcast (one row per subject). Adjacent same-category
    windows merge (W6) exactly like the reference's ``merge_windows``
    (which it applies twice, ``:175`` and ``:311`` — idempotent).
    """
    on = partition_cols if partition_cols else None
    if on:
        joined = acc.join(F.broadcast(thresholds), on=on)
    else:
        joined = acc.crossJoin(F.broadcast(thresholds))
    binned = joined.withColumn("start_time", tumbling_window_start(ts_col, bin_minutes))
    outlier = (
        (F.col(g_col) < F.col("lower_threshold"))
        | (F.col(g_col) > F.col("upper_threshold"))
    ).cast("double")
    per_bin = binned.groupBy(*partition_cols, "start_time").agg(
        (F.avg(outlier) * 100).alias("outlier_pct")
    )
    categorized = per_bin.select(
        *partition_cols,
        "start_time",
        (F.col("start_time") + F.expr(f"INTERVAL {bin_minutes} MINUTES")).alias(
            "end_time"
        ),
        F.when(F.col("outlier_pct") > cutoffs[1], "high active")
        .when(F.col("outlier_pct") > cutoffs[0], "low active")
        .otherwise("rest")
        .alias("category"),
    )
    if merge:
        return merge_adjacent_categorized(categorized, partition_cols)
    return categorized
