"""Date/time scalar functions (SURVEY.md §2.9).

All pure column expressions — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_ms_to_timestamp(col: Column | str) -> Column:
    """Epoch-milliseconds → timestamp
    (``/root/reference/raw_data_reformat.py:58-61``; the reference goes
    through a per-row ``datetime.fromtimestamp`` + strftime round-trip,
    here a single built-in)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def adjust_clock_skew(
    df: DataFrame,
    time_col: str = "time",
    d_time_ms: int | None = None,
    ref_time_s: float | None = None,
    quantum_ms: int = 900_000,
) -> tuple[DataFrame, int]:
    """Clock-skew correction (``raw_data_reformat.py:39-56``).

    Three modes, same precedence as the reference (``d_time`` wins):
    - both None: identity;
    - ``d_time_ms`` given: add it;
    - ``ref_time_s`` given: skew = ``round((ref*1000 − min(time)) /
      900000) * 900000`` — quantized to 15-minute steps because vendor
      exports are timezone-off-by-quarter-hours
      (``raw_data_reformat.py:47``).

    The global MIN is a driver-collected scalar (one tiny agg job) —
    the alternative crossJoin(lit) keeps it lazy but re-reads the
    source; a 1-row collect is the right trade at any scale.
    Returns (adjusted df, d_time actually applied) — the scalar is the
    reference's ``timestamp_diff.txt`` sidecar artifact (S8).
    """
    if d_time_ms is None and ref_time_s is None:
        return df.withColumn("adj_time", F.col(time_col)), 0
    if d_time_ms is None:
        json_time = df.agg(F.min(time_col)).first()[0]
        d_time_ms = round((ref_time_s * 1000 - json_time) / quantum_ms) * quantum_ms
    return (
        df.withColumn("adj_time", (F.col(time_col) + F.lit(d_time_ms)).cast("long")),
        int(d_time_ms),
    )


def with_date_time_columns(df: DataFrame, ts_col: str = "date_time") -> DataFrame:
    """Derive ``date`` and time-of-day ``time`` columns
    (``raw_data_reformat.py:63-64``)."""
    return df.withColumn("date", F.to_date(ts_col)).withColumn(
        "time", F.date_format(ts_col, "HH:mm:ss.SSSSSS")
    )


def second_of_day(ts_col: Column | str) -> Column:
    """Fractional second-of-day (``acc_reformat.py:75``)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (
        F.hour(c) * 3600
        + F.minute(c) * 60
        + F.second(c)
        + (F.unix_micros(c) % 1_000_000) / 1_000_000.0
    ).cast("double")


def to_minutes(col: Column | str) -> Column:
    """Parse ``"<h>h<m>m"`` sleep-duration strings to minutes
    (``raw_data_reformat.py:183-185``) — regexp + arithmetic, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.regexp_extract(c, r"(\d+)h", 1).cast("int") * 60
        + F.regexp_extract(c, r"(\d+)m", 1).cast("int")
    )


def tumbling_window_start(ts_col: Column | str, minutes: int = 5) -> Column:
    """Floor a timestamp to an N-minute tumbling window
    (``activity_categorize.py:178-182``).

    NOTE divergence (documented in SURVEY.md §7): the reference's
    ``time_bin`` hardcodes ``* 5`` so any ``window != 5`` produces wrong
    bins; this implementation is correct for every window size.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    secs = minutes * 60
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(c) / secs) * secs
    )
