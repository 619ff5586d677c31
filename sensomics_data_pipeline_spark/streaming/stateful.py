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


# ---------------------------------------------------------------------------
# Spark 4 arbitrary-state API (transformWithStateInPandas)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import surface depends on environment
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    # the TWS state-server protocol runs over protobuf; without the
    # python bindings the driver worker crashes at query start
    # (ImportError: cannot import name 'descriptor' from
    # 'google.protobuf'), so gate on BOTH imports
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False

HWM_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class HighWatermarkProcessor(StatefulProcessor):
    """Spark 4 ``transformWithStateInPandas`` processor: per
    (user, type) group, emit only events whose value strictly exceeds
    every previously seen value — the streaming "new record high"
    filter. ValueState holds one double per group (O(groups) memory);
    within a batch the comparison is a vectorized cummax, state carries
    the running max across micro-batches.

    This certifies the v2 arbitrary-state API (typed state handles,
    explicit time modes) alongside the v1 ``applyInPandasWithState``
    operator above; batch parity = ``value > max(previous)`` over a
    window (see tests)."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.state = handle.getValueState(
            "mx", T.StructType([T.StructField("mx", T.DoubleType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        mx = self.state.get()[0] if self.state.exists() else None
        for pdf in rows:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            run = pdf["value"].cummax().shift()
            if mx is not None:
                run = run.fillna(mx).clip(lower=mx)
            keep = run.isna() | (pdf["value"] > run)
            out = pdf.loc[keep, ["event_id", "ts", "value"]].copy()
            out.insert(0, "event_type", key[1])
            out.insert(0, "user_id", key[0])
            batch_max = float(pdf["value"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
            yield out
        if mx is not None:
            self.state.update((mx,))

    def close(self) -> None:
        pass


def high_watermark_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the v2-API record-high filter over the bounded events stream;
    one micro-batch ⇒ equals the batch window form."""
    from sensomics_data_pipeline_spark.streaming.demo import (
        read_events_stream,
        run_bounded,
    )

    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas needs Spark >= 4.0 and the "
            "google.protobuf python bindings (absent in this image)"
        )
    events = read_events_stream(spark, sf_dir).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    out = events.groupBy("user_id", "event_type").transformWithStateInPandas(
        HighWatermarkProcessor(),
        outputStructType=HWM_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    return run_bounded(out, "append").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )


# ---------------------------------------------------------------------------
# Streaming theta/KMV sketch (distinct-count state across micro-batches)
# ---------------------------------------------------------------------------

THETA_K = 64

THETA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("n_kept", T.IntegerType()),
        T.StructField("theta", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

THETA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

_THETA_FULL = 1 << 60


def _theta_group(key, batches: Iterator, state) -> Iterator:
    """Per-group KMV maintenance across micro-batches: state is the k
    smallest distinct portable hashes seen so far (k longs — O(groups)
    memory). Trimmed merge is exact: the k smallest of A ∪ B equal the
    k smallest of (k-smallest-of-A) ∪ B, so the final state is
    BIT-IDENTICAL to the batch sketch regardless of how the stream was
    micro-batched — the associativity law `theta_union` pins in batch
    tests, exercised here as stream-vs-batch equality. Emits the
    current sketch after the batch (update semantics); `n_seen` is a
    monotone row counter so a bounded run can select each group's
    final emission."""
    import pandas as pd

    if state.exists:
        kept = list(state.get[0])
        n_seen = int(state.get[1])
    else:
        kept, n_seen = [], 0
    merged = set(kept)
    for pdf in batches:
        n_seen += len(pdf)
        merged.update(int(h) for h in pdf["_h"])
    kept = sorted(merged)[:THETA_K]
    state.update((kept, n_seen))
    theta = _THETA_FULL if len(kept) < THETA_K else kept[-1]
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "hashes": [kept],
            "n_kept": [len(kept)],
            "theta": [theta],
            "n_seen": [n_seen],
        }
    )


def theta_sketch_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
) -> DataFrame:
    """Continuously maintained per-event-type distinct-user theta
    sketch over the bounded events stream; returns each group's FINAL
    sketch state in long form (label, pos, h, theta, n_kept) — the
    exact rows the batch ``profile.theta_sketch_table`` produces, which
    is what the driver oracle certifies."""
    from pyspark.sql import Window

    from sensomics_data_pipeline_spark.functions.scalars import (
        portable_hash64,
    )
    from sensomics_data_pipeline_spark.streaming.demo import (
        read_events_stream,
        run_bounded,
    )

    events = read_events_stream(
        spark, sf_dir, max_files_per_trigger=max_files_per_trigger, glob=glob
    ).filter(F.col("user_id").isNotNull())
    hashed = events.select(
        "event_type",
        portable_hash64(F.col("user_id").cast("string")).alias("_h"),
    )
    sketches = hashed.groupBy("event_type").applyInPandasWithState(
        _theta_group,
        THETA_OUT_SCHEMA,
        THETA_STATE_SCHEMA,
        "update",
        "NoTimeout",
    )
    emitted = run_bounded(sketches, "update")
    w = Window.partitionBy("event_type").orderBy(F.desc("n_seen"))
    final = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return final.select(
        F.col("event_type").alias("label"),
        F.posexplode("hashes").alias("pos", "h"),
        "theta",
        "n_kept",
    ).withColumn("pos", F.col("pos") + 1)
