"""Window-function operators (SURVEY.md §2.6): the reference's sequential
"previous row" pandas/numpy logic re-expressed as LAG / running-sum
islands — distributed, one shuffle per partitioning.

Every operator takes explicit ``partition_cols``: the reference is
single-subject-serial; at 100 TB these windows must partition by
subject/device/user so no global ``Window.orderBy`` serializes the job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_consecutive(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str = "date_time",
    value_col: str = "data",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W1: keep rows whose value differs from the previous row's
    (change-point filter; ``extract_kind`` shift-compare,
    ``/root/reference/activity_categorize.py:68-72``). First row of each
    partition is always kept (pandas ``shift()`` yields NaN ≠ value)."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col, *(tiebreak_cols or []))
    prev = F.lag(value_col).over(w)
    return (
        df.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col(value_col) != F.col("_prev")))
        .drop("_prev")
    )


def counter_reset_delta(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str = "date_time",
    value_col: str = "data",
    reset_gap_hours: int = 12,
    out_col: str = "delta",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W2: convert a resetting cumulative counter into per-report
    increments (``preliminary_intervals`` numpy block,
    ``/root/reference/activity_categorize.py:74-90``).

    Exact reference semantics mirrored:
    - gap > ``reset_gap_hours`` since previous report ⇒ treat previous
      total as 0 (counter reset), delta = total;
    - first row ⇒ delta = total (prev is the epoch sentinel, always a
      reset);
    - total > prev ⇒ delta = total − prev;
    - total ≤ prev (no reset) ⇒ delta = total  (``:85`` keeps ``total``
      when the ``where`` mask is false — a quirk, preserved).
    """
    w = Window.partitionBy(*partition_cols).orderBy(order_col, *(tiebreak_cols or []))
    prev_t = F.lag(order_col).over(w)
    prev_v = F.lag(value_col).over(w)
    gap_s = F.unix_timestamp(order_col) - F.unix_timestamp(prev_t)
    reset = prev_t.isNull() | (gap_s > reset_gap_hours * 3600)
    delta = (
        F.when(reset, F.col(value_col))
        .when(F.col(value_col) > prev_v, F.col(value_col) - prev_v)
        .otherwise(F.col(value_col))
    )
    return df.withColumn(out_col, delta)


def sessionize(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str = "date_time",
    gap_seconds: float = 1.0,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W4: gap-based sessionization (``acc_reformat.py:122-125``): a gap
    strictly greater than ``gap_seconds`` starts a new session.

    ``session_id = running_sum(is_new)`` per partition — the standard
    lag + cumulative-sum islands encoding of the reference's sequential
    reset loop.
    """
    w = Window.partitionBy(*partition_cols).orderBy(order_col, *(tiebreak_cols or []))
    gap = (
        F.unix_micros(F.col(order_col)) - F.unix_micros(F.lag(order_col).over(w))
    ) / 1_000_000.0
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_bounds(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str = "date_time",
    session_col: str = "session_id",
) -> DataFrame:
    """Collapse sessionized rows to one row per session with bounds and
    size — the aggregate half of W4."""
    return df.groupBy(*partition_cols, session_col).agg(
        F.min(order_col).alias("session_start"),
        F.max(order_col).alias("session_end"),
        F.count("*").alias("n_rows"),
    )


def merge_adjacent_categorized(
    df: DataFrame,
    partition_cols: list[str],
    start_col: str = "start_time",
    end_col: str = "end_time",
    category_col: str = "category",
    global_row_guard: int | None = 5_000_000,
) -> DataFrame:
    """W6: merge consecutive windows with equal category and
    ``next.start == current.end`` (``merge_windows``,
    ``/root/reference/activity_categorize.py:194-207``).

    Islands: a new island starts when the category changes OR the window
    is not flush with the previous one's end.

    Scale note: with ``partition_cols=[]`` the islands window is global
    (single-task sort) — legitimate ONLY because inputs to this
    operator are post-aggregation window tables whose cardinality is
    bounded by time-range/window-size (e.g. ≤ ~105k rows/year at 5-min
    windows), independent of raw data volume. For per-entity interval
    tables always pass the entity key as ``partition_cols``. That
    cardinality argument is ENFORCED, not assumed: in the global case a
    ``global_row_guard`` raise_error fires at runtime if the input
    exceeds the bound (a count over the same single partition the sort
    already materializes, so the check is ~free; ``None`` disables).
    """
    w = Window.partitionBy(*partition_cols).orderBy(start_col)
    new_island = (
        (F.col(category_col) != F.lag(category_col).over(w))
        | (F.col(start_col) != F.lag(end_col).over(w))
    )
    flag = F.coalesce(new_island.cast("int"), F.lit(1))
    if not partition_cols and global_row_guard is not None:
        n_global = F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        flag = F.when(
            n_global > global_row_guard,
            F.raise_error(
                F.lit(
                    "merge_adjacent_categorized: global (partition_cols=[]) "
                    f"input exceeds {global_row_guard} rows — pass an entity "
                    "key as partition_cols or raise global_row_guard"
                )
            ).cast("int"),
        ).otherwise(flag)
    flagged = df.withColumn("_new", flag).withColumn(
        "_grp", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        flagged.groupBy(*partition_cols, category_col, "_grp")
        .agg(F.min(start_col).alias(start_col), F.max(end_col).alias(end_col))
        .drop("_grp")
        .select(*partition_cols, start_col, end_col, category_col)
    )


def asof_backward(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    probe_predicate: Column,
    build_predicate: Column,
    carry_cols: dict[str, str],
) -> DataFrame:
    """As-of (backward) join of two event classes within ONE stream.

    For every probe row (``probe_predicate``), attach the most recent
    preceding build row's columns (``build_predicate``), e.g. "for each
    purchase, the last prior view by the same user". Implemented as a
    single ordered window with ``last(..., ignorenulls)`` — no join, no
    second shuffle: the classic union-stream as-of technique that scales
    linearly and never builds a range join.

    ``carry_cols`` maps source column → output alias for the values
    carried forward from the build rows.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df
    for src, alias in carry_cols.items():
        carried = F.last(
            F.when(build_predicate, F.col(src)), ignorenulls=True
        ).over(w)
        out = out.withColumn(alias, carried)
    return out.filter(probe_predicate)


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-K per group via row_number (SURVEY.md §2.7 O3 generalized).
    Callers must make ``order_cols`` a total order (tie-break on a key)
    for deterministic output."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def rolling_range_agg(
    df,
    partition_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    range_us: int = 3_600_000_000,
):
    """Trailing time-RANGE frame aggregates (the hypertable "last hour
    per entity" shape): for every row, count/min/max of ``value_col``
    over rows of the same partition whose timestamp lies within
    ``range_us`` microseconds BEFORE this row's (inclusive both ends).

    RANGE, not ROWS: the frame is defined by the time axis, so
    irregular sampling and ties are handled by value, not position.
    Spark's rangeBetween needs a numeric order key — ``unix_micros``
    of the event time (same integer DuckDB's ``epoch_us`` yields, so
    the frame boundaries are engine-identical). Outputs are
    order-insensitive exact aggregates (count/min/max) on purpose:
    a windowed SUM of doubles would expose summation-order drift
    between engines.

    One shuffle (the partition exchange); the running-frame evaluation
    is linear per partition.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-int(range_us), 0)
    )
    return df.select(
        *partition_cols,
        ts_col,
        value_col,
        F.count("*").over(w).alias("n_trailing"),
        F.min(value_col).over(w).alias("min_trailing"),
        F.max(value_col).over(w).alias("max_trailing"),
    )
