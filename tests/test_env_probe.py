"""Startup probes for the two environment-gated fast paths.

Both paths keep working fallbacks (applyInPandasWithState for custom
streaming state; anti-join+union MERGE emulation for upserts), so the
suite is green either way — but if the image ever gains the missing
dependency, these tests run the REAL path end-to-end instead of
silently staying on the fallback forever. They are the suite's only
permitted skips, and each skip names exactly which dependency is
absent so a green-with-skips run is self-explaining.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _tws_available() -> bool:
    from sensomics_data_pipeline_spark.streaming import stateful

    return bool(stateful.HAS_TWS)


def _delta_available(spark) -> bool:
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    # python bindings alone are not enough — the JVM needs the jars
    try:
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
    except Exception:
        return False
    return True


def test_tws_high_watermark_matches_batch_when_available(spark):
    """If google.protobuf ever appears in the image, the
    transformWithStateInPandas record-high path must run and agree
    with the batch window form (value strictly above the running max
    of all PRIOR values per (user, event_type))."""
    if not _tws_available():
        pytest.skip(
            "env-absent: google.protobuf python bindings are not in "
            "this image, so Spark's transformWithStateInPandas state-"
            "server protocol cannot start (streaming/stateful.py "
            "HAS_TWS gate). The applyInPandasWithState fallback is "
            "certified instead (streaming_stateful_dedup)."
        )
    from sensomics_data_pipeline_spark.sources.readers import load_table
    from sensomics_data_pipeline_spark.streaming.stateful import (
        high_watermark_stream,
    )

    got = {
        (r["user_id"], r["event_type"], r["event_id"])
        for r in high_watermark_stream(spark, SF0001).collect()
    }
    ev = load_table(spark, SF0001, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        (r["user_id"], r["event_type"], r["event_id"])
        for r in ev.withColumn("_prior_max", F.max("value").over(w))
        .filter(
            F.col("_prior_max").isNull()
            | (F.col("value") > F.col("_prior_max"))
        )
        .collect()
    }
    assert got == want


def test_delta_merge_matches_emulation_when_available(spark, tmp_path):
    """If Delta Lake (python bindings + jars) ever appears on the
    classpath, run a real MERGE INTO and assert it produces exactly
    what ``resample.merge_upsert``'s anti-join+union emulation
    computes for the same (target, source)."""
    if not _delta_available(spark):
        pytest.skip(
            "env-absent: Delta Lake is not on the classpath (no "
            "python `delta` package / io.delta jars in the pyspark "
            "image), so transactional MERGE INTO cannot run; the "
            "anti-join+union emulation is certified instead "
            "(merge_upsert / merge_idempotency driver rows)."
        )
    from delta.tables import DeltaTable

    from sensomics_data_pipeline_spark.operators.resample import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k int, tag string, v double",
    )
    source = spark.createDataFrame(
        [(2, "B", 20.0), (4, "d", 4.0)], "k int, tag string, v double"
    )
    path = str(tmp_path / "tgt")
    target.write.format("delta").save(path)
    dt = DeltaTable.forPath(spark, path)
    (
        dt.alias("t")
        .merge(source.alias("s"), "t.k = s.k")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = sorted(
        tuple(r) for r in spark.read.format("delta").load(path).collect()
    )
    want = sorted(
        tuple(r) for r in merge_upsert(target, source, ["k"]).collect()
    )
    assert got == want
