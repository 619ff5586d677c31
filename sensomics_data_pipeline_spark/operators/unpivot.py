"""Reshaping operators: unpivot / split+melt normalization (SURVEY.md §2.3).

The reference's signature move is normalizing the polymorphic ``data``
payload into scalar long rows via four per-kind pandas split+melt
functions (``/root/reference/raw_data_reformat.py:106-148``). Spark-first,
each split+melt pair fuses into a single ``stack`` generator expression —
one narrow, codegen'd projection instead of a copy + melt + concat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_COLS = ["jname", "date_time", "date", "time"]


def _parsed(df: DataFrame, n: int | None = None) -> DataFrame:
    """Parse the raw JSON ``data`` payload to array<double>."""
    return df.withColumn("arr", F.from_json("data", T.ArrayType(T.DoubleType())))


def unlist_values(df: DataFrame, kinds=("hr current", "hr", "st", "spo2")) -> DataFrame:
    """R1: scalar-like kinds carry a 1-element list (or bare scalar) —
    take element 0 (``raw_data_reformat.py:106-112``)."""
    out = _parsed(df.filter(F.col("kind").isin(list(kinds))))
    # bare scalar JSON ("71.0") parses to NULL array -> fall back to cast
    data = F.coalesce(
        F.element_at("arr", 1), F.col("data").cast("double")
    )
    return out.select(*ID_COLS, "kind", data.alias("data"))


def unlist_bp(df: DataFrame) -> DataFrame:
    """R2: ``bp`` 2-list → two long rows ``bp_sys``/``bp_dia``
    (``raw_data_reformat.py:114-123``). The reference's widen-then-melt
    is one ``stack``."""
    out = _parsed(df.filter(F.col("kind") == "bp"))
    return out.select(
        *ID_COLS,
        F.expr(
            "stack(2, 'bp_sys', arr[0], 'bp_dia', arr[1]) AS (kind, data)"
        ),
    )


def unlist_activity(df: DataFrame) -> DataFrame:
    """R3: ``activity`` 5-list → step/Calories/sleep_light/sleep_deep/awake
    (``raw_data_reformat.py:125-135``)."""
    out = _parsed(df.filter(F.col("kind") == "activity"))
    return out.select(
        *ID_COLS,
        F.expr(
            "stack(5, 'step', arr[0], 'Calories', arr[1], 'sleep_light', arr[2],"
            " 'sleep_deep', arr[3], 'awake', arr[4]) AS (kind, data)"
        ),
    )


def unlist_multi_measure(df: DataFrame) -> DataFrame:
    """R4: ``multi measure`` nested 4-list ``[hr, spo2, [sys, dia], st]``
    → 5 long rows (``raw_data_reformat.py:137-148``). The nested element
    forces a typed ``from_json`` with an array-of-arrays view: parse
    twice, once flat for scalars, once nested for the bp pair.
    """
    base = df.filter(F.col("kind") == "multi measure")
    nested = base.withColumn(
        "arr", F.from_json("data", T.ArrayType(T.StringType()))
    ).withColumn(
        "bp", F.from_json(F.element_at("arr", 3), T.ArrayType(T.DoubleType()))
    )
    return nested.select(
        *ID_COLS,
        F.expr(
            "stack(5, 'mm_hr', double(arr[0]), 'mm_spo2', double(arr[1]),"
            " 'mm_bp_sys', bp[0], 'mm_bp_dia', bp[1], 'mm_st', double(arr[3]))"
            " AS (kind, data)"
        ),
    )


def normalize_measurements(df: DataFrame) -> DataFrame:
    """The full json_data_cleanup measurement branch
    (``raw_data_reformat.py:67-88``): four stack branches unioned.

    One lazy plan: Catalyst pushes each kind-filter into the shared scan;
    at scale, cache the parsed source before this 4-way fan-out when the
    branches are consumed by separate writes.
    """
    return (
        unlist_values(df)
        .unionByName(unlist_bp(df))
        .unionByName(unlist_activity(df))
        .unionByName(unlist_multi_measure(df))
    )


def split_ppg_ac(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The ppg / accelerometer extracts of json_data_cleanup
    (``raw_data_reformat.py:76-82``): two filtered projections of the
    same scan (write-side fan-out, not a data copy)."""
    ppg = df.filter(F.col("kind") == "ppg")
    ac = df.filter(F.col("kind").isin(["acx", "acy", "acz"]))
    return ppg, ac


def melt_wide(
    df: DataFrame, id_cols: list[str], value_cols: list[str],
    kind_col: str = "kind", value_col: str = "data",
) -> DataFrame:
    """R5: generic wide→long melt (``pd.melt`` at
    ``raw_data_reformat.py:174``) — Spark ``unpivot``."""
    return df.unpivot(id_cols, value_cols, kind_col, value_col)


def melt_computed_wide(df: DataFrame) -> DataFrame:
    """Vendor-workbook normalization (S3 reshape half,
    ``raw_data_reformat.py:164-181``): rename headers, parse "<h>h<m>m"
    durations, melt to long, drop °F and empty rows.

    Expects the raw wide frame from ``sources.read_excel_measurements``
    (all-string columns, original vendor headers).
    """
    from sensomics_data_pipeline_spark.functions.scalars import FEATURE_RENAME
    from sensomics_data_pipeline_spark.functions.timeops import to_minutes

    renamed = df
    for old, new in FEATURE_RENAME.items():
        if old in df.columns:
            renamed = renamed.withColumnRenamed(old, new)
    value_cols = [
        c for c in renamed.columns
        if c not in ("Time", "_sheet", "Body temperature (F)")
    ]
    for c in ("sleep_total", "sleep_deep", "sleep_light"):
        if c in value_cols:
            renamed = renamed.withColumn(
                c,
                F.when(F.length(c) > 0, to_minutes(F.col(c)).cast("string")),
            )
    long = renamed.unpivot(["Time"], value_cols, "kind", "data")
    return (
        long.filter(F.col("data").isNotNull() & (F.col("data") != ""))
        .select(
            F.to_timestamp("Time").alias("date_time"),
            "kind",
            F.col("data").cast("double").alias("data"),
        )
    )
