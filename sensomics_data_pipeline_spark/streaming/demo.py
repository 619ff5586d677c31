"""Structured Streaming surface (SURVEY.md §2.10): the reference is
batch-only, but its windowed ops are streaming-shaped — this module
certifies the streaming analogs on the driver's ``events`` table:

- tumbling-window aggregation with watermark (the 5-min activity bins,
  ``activity_categorize.py:164-182``);
- ``session_window`` gap sessionization (the 1-s accel gap reset,
  ``acc_reformat.py:122-125``);
- watermark late-data discard (the greedy drop of stragglers,
  ``acc_reformat.py:181-203``).

Local runs drive a bounded parquet stream to completion with
``processAllAvailable`` + a memory sink; on a cluster the same plans
run against Kafka with checkpointed exactly-once sinks.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
) -> DataFrame:
    """Bounded events stream with the same ts normalization as the batch
    loader (``sources.readers.load_table``).

    ``readStream`` needs an explicit schema, but the events parquet has
    shipped with ``ts`` as both TIMESTAMP(NANOS) (scans as bigint under
    ``nanosAsLong``) and TIMESTAMP(MICROS) (scans as timestamp) across
    driver revisions — so the read schema is inferred from a one-file
    batch scan of the footer (metadata only, no data read) instead of
    being hardcoded, and the nanos→µs conversion is applied only when
    the scan type is bigint.
    """
    from sensomics_data_pipeline_spark.sources.readers import ensure_session_confs

    ensure_session_confs(spark)
    batch_schema = (
        spark.read.option("pathGlobFilter", glob)
        .parquet(sf_dir)
        .schema
    )
    reader = spark.readStream.schema(batch_schema).option(
        "pathGlobFilter", glob
    )
    if max_files_per_trigger is not None:
        # test/rehearsal knob: force the bounded backlog to split into
        # several micro-batches so cross-batch state paths execute
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(sf_dir)
    ts_kind = dict((f.name, f.dataType.simpleString()) for f in batch_schema.fields)
    if ts_kind.get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_kind.get("ts") == "timestamp_ntz":
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on NTZ); with the UTC session timezone the cast is wall-clock
        # preserving and matches what timestamp_micros() produced before.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _has_event_time_watermark(agg: DataFrame) -> bool:
    """True iff the analyzed logical plan contains an
    ``EventTimeWatermark`` node — walked as actual tree nodes (class
    name match), not a substring probe over ``str(plan)``, which could
    false-positive on a literal or column name containing the text.
    Private-API access is fenced: any reflection failure (Spark version
    drift, Connect-style sessions without ``_jdf``) falls back to the
    CONSERVATIVE answer True, whose only cost is the bounded no-data-
    batch wait — never a skipped flush."""
    try:
        stack = [agg._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() == "EventTimeWatermark":
                return True
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return False
    except Exception:
        return True


def run_bounded(
    agg: DataFrame, mode: str = "complete", available_now: bool = False
) -> DataFrame:
    """Drive a streaming aggregate over the bounded source to completion
    via a memory sink; returns the result as a batch DataFrame.

    ``processAllAvailable`` only waits for batches with source offsets;
    the trailing *no-data* micro-batch (which advances the watermark and,
    in append mode, flushes the now-closed windows) is not awaited and a
    prompt ``stop()`` can kill it before anything reaches the sink. For
    stateful append/update queries we therefore poll ``lastProgress``
    until a zero-input batch has run (bounded wait), then drain again.

    ``available_now=True`` switches to ``Trigger.AvailableNow``: the
    engine plans the whole bounded backlog up front, coalesces it into
    the fewest micro-batches the source limits allow, and STOPS ITSELF
    — so completion is one ``awaitTermination`` with no progress
    polling and no stop-races. This is the right mode for the
    UN-watermarked ingest certification (streaming/ingest.py), whose
    wall-clock was dominated by micro-batch scheduling variance;
    watermarked append queries keep the default path, where the
    no-data-batch drain below is load-bearing.
    """
    name = f"stream_{uuid.uuid4().hex[:12]}"
    # Only watermarked queries can owe a no-data batch (it exists to
    # advance the watermark and flush closed state); for un-watermarked
    # append streams the wait would be pure dead time.
    watermarked = _has_event_time_watermark(agg)
    writer = agg.writeStream.outputMode(mode).format("memory").queryName(name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        try:
            q.awaitTermination()
        finally:
            q.stop()
        return agg.sparkSession.table(name)
    try:
        q.processAllAvailable()
        if watermarked and mode in ("append", "update"):
            deadline = time.time() + 30.0
            last_batch, stable = -1, 0
            while time.time() < deadline:
                lp = q.lastProgress
                if lp is not None and lp.get("numInputRows", -1) == 0:
                    break
                bid = -1 if lp is None else lp.get("batchId", -1)
                stable = stable + 1 if bid == last_batch else 0
                last_batch = bid
                # ~1.5s with no new batch ⇒ the engine has decided no
                # no-data batch is needed (watermark unchanged); don't
                # burn the full deadline waiting for one.
                if stable >= 15:
                    break
                time.sleep(0.1)
            q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.table(name)


def tumbling_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    mode: str = "complete",
) -> DataFrame:
    """Tumbling-window count/sum per event_type as a stream. ``complete``
    mode reproduces the batch GROUP BY exactly (oracle-checkable);
    ``append`` demonstrates watermark holdback (the open window stays
    unemitted — pytest-covered)."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    out = run_bounded(agg, mode)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n",
        "sum_value",
    )


def session_windows(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Native streaming sessionization: ``session_window`` with a gap —
    the streaming analog of operators.windows.sessionize."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_rows"))
    )
    out = run_bounded(agg, "complete")
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_rows",
    )




def corpus_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateless text stages of the corpus pipeline (PII scrub +
    repetition signals) run as a Structured Stream: both operators are
    pure per-row projections, so the same code composes over
    ``readStream`` unchanged and emits in append mode with no state
    store and no watermark — the streaming-ingest shape of a
    training-data pipeline (per-doc signals at arrival time; the
    corpus-global stages — quality percentiles, dedup, packing — stay
    batch over the accumulated store)."""
    from sensomics_data_pipeline_spark.operators.text import (
        repetition_signals,
        scrub_pii,
    )
    from sensomics_data_pipeline_spark.sources.readers import (
        ensure_session_confs,
    )

    ensure_session_confs(spark)
    docs_schema = (
        spark.read.option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .schema
    )
    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    scrubbed = scrub_pii(stream).withColumn("text", F.col("scrubbed_text"))
    # engine_exact=False: the bit-identical Arrow counts kernel (same
    # stream-stateless mapInPandas shape as the ingest flow)
    sigs = repetition_signals(scrubbed, "text", engine_exact=False)
    out = sigs.select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "n_tokens", "repetitious"
    )
    return run_bounded(out, "append")


def stream_mad_anomalies(
    spark: SparkSession,
    sf_dir: str,
    k: float = 3.0,
) -> DataFrame:
    """Stream-static robust anomaly detection: per-type median/MAD
    thresholds are computed in a batch prepass (tiny — one row per
    event_type), then the event STREAM joins them as a broadcast
    static side and emits only the rows that breach ``k``×MAD — the
    arrival-time shape of ``operators.profile.mad_outliers``, with the
    same static-side-refresh pattern as ``streaming.ingest`` (re-run
    the prepass periodically; restart the query).

    Append mode, no state store, no watermark: the stream side is a
    pure filter after a broadcast join, so throughput is scan-bound.
    """
    from pyspark.sql import functions as F  # noqa: F811

    from sensomics_data_pipeline_spark.sources.readers import (
        ensure_session_confs,
        load_table,
    )

    ensure_session_confs(spark)
    batch = load_table(spark, sf_dir, "events")
    med = batch.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("_med")
    )
    mad = (
        batch.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - _med), 0.5)").alias("_mad"))
    )
    thresholds = med.join(mad, "event_type")

    stream = read_events_stream(spark, sf_dir)
    flagged = (
        stream.join(F.broadcast(thresholds), "event_type")
        .filter(
            F.abs(F.col("value") - F.col("_med"))
            > F.lit(float(k)) * F.col("_mad")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("_med"), 6).alias("group_median"),
            F.round(F.col("_mad"), 6).alias("group_mad"),
        )
    )
    return run_bounded(flagged, "append")
