"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10/§2.11): the W1 dedup-consecutive change-point filter
as a continuously-running stream — per (user, type) group, keep an
event only when its (coarse) value differs from the last value seen,
carrying the last value across micro-batches in state.

This is the streaming form of ``operators.windows.dedup_consecutive``
(the reference's ``extract_kind`` shift-compare,
``/root/reference/activity_categorize.py:68-72``): state is one scalar
per group, so memory is O(groups), and a bounded single-batch run
produces exactly the batch operator's output (oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("bucket", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_bucket", T.DoubleType())])


def _dedup_group(key, batches: Iterator, state) -> Iterator:
    """Grouped-map-with-state function: vectorized shift-compare within
    the batch (no Python row loop); state carries the last value across
    micro-batches to seed the first row's comparison."""
    import pandas as pd

    last = state.get[0] if state.exists else None
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        prev = pdf["bucket"].shift()
        if last is not None:
            prev.iloc[0] = last
        keep = prev.isna() | (pdf["bucket"].to_numpy() != prev.to_numpy())
        out = pdf.loc[keep, ["event_id", "ts", "bucket"]].copy()
        out.insert(0, "event_type", key[1])
        out.insert(0, "user_id", key[0])
        last = pdf["bucket"].iloc[-1]
        yield out
    state.update((last,))


def dedup_consecutive_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful dedup over the bounded events stream; with one
    micro-batch the result equals the batch ``dedup_consecutive``."""
    from sensomics_data_pipeline_spark.streaming.demo import (
        read_events_stream,
        run_bounded,
    )

    events = read_events_stream(spark, sf_dir).withColumn(
        "bucket", F.round("value", 0)
    )
    deduped = (
        events.select("user_id", "event_type", "event_id", "ts", "bucket")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _dedup_group,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            "NoTimeout",
        )
    )
    return run_bounded(deduped, "append").select(
        "event_id", "user_id", "event_type", "ts", "bucket"
    )
