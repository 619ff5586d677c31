"""Tests for sinks (S7/S8) and skew-mitigation utilities."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.operators import skew
from sensomics_data_pipeline_spark.sources import writers


def _raw_df(spark):
    base_ms = 1_709_280_000_000
    rows = [
        (base_ms, "hr", "[72.0]"),
        (base_ms + 1000, "bp", "[120.0, 80.0]"),
        (base_ms + 2000, "ppg", "[1.0, 2.0]"),
        (base_ms + 3000, "acx", "[0.1, 0.2, 0.3, 0.4, 0.5]"),
    ]
    df = spark.createDataFrame(
        [(t, k, d, "jn") for t, k, d in rows],
        "time long, kind string, data string, jname string",
    )
    from sensomics_data_pipeline_spark.functions.timeops import (
        epoch_ms_to_timestamp,
        with_date_time_columns,
    )

    return with_date_time_columns(
        df.withColumn("date_time", epoch_ms_to_timestamp("time")).drop("time")
    )


def test_three_way_split_parquet(spark, tmp_path):
    paths = writers.write_three_way_split(_raw_df(spark), str(tmp_path))
    meas = spark.read.parquet(paths["measurements"])
    ppg = spark.read.parquet(paths["ppg"])
    ac = spark.read.parquet(paths["ac"])
    kinds = {r["kind"] for r in meas.select("kind").distinct().collect()}
    assert kinds == {"hr", "bp_sys", "bp_dia"}
    assert ppg.count() == 1 and ac.count() == 1


def test_three_way_split_csv_export(spark, tmp_path):
    paths = writers.write_three_way_split(
        _raw_df(spark), str(tmp_path), fmt="csv"
    )
    back = spark.read.option("header", "true").csv(paths["measurements"])
    assert back.count() == 3


def test_scalar_sidecar_roundtrip(spark, tmp_path):
    p = str(tmp_path / "d_time")
    writers.write_scalar_sidecar(spark, 900000.0, p)
    assert writers.read_scalar_sidecar(spark, p) == 900000.0


def test_salted_agg_matches_plain(spark, sf_dir):
    from sensomics_data_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    salted = (
        skew.salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("value", "count"),
                "s": ("value", "sum"),
                "mn": ("value", "min"),
                "mx": ("value", "max"),
            },
            n_salts=8,
        )
        .withColumn("s", F.round("s", 2))
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    pd.testing.assert_frame_equal(plain, salted, check_like=True)


def test_salted_join_matches_plain(spark, sf_dir):
    from sensomics_data_pipeline_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    hot = [1, 2, 3]
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .set_index("p_brand")
        .sort_index()
    )
    fact = skew.with_salted_key(li, "l_partkey", hot, n_salts=4)
    dim = skew.explode_salts(part, "p_partkey", hot, n_salts=4)
    salted = (
        fact.join(dim, "_salted_key")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .set_index("p_brand")
        .sort_index()
    )
    pd.testing.assert_frame_equal(plain, salted, check_like=True)


def test_measurements_csv_roundtrip(spark, tmp_path):
    """S4/S5 typed CSV scan reads back the engine's own CSV export."""
    from sensomics_data_pipeline_spark.sources.readers import read_measurements_csv

    paths = writers.write_three_way_split(_raw_df(spark), str(tmp_path), fmt="csv")
    back = read_measurements_csv(spark, paths["measurements"] + "/*.csv")
    rows = {(r["kind"], r["data"]) for r in back.collect()}
    assert rows == {("hr", 72.0), ("bp_sys", 120.0), ("bp_dia", 80.0)}
    assert back.schema["date_time"].dataType.simpleString() == "timestamp"


def test_acc_csv_list_revival(spark, tmp_path):
    """S6: the stringified 5-sample burst revives as array<double> via
    from_json (vs the reference's per-row literal_eval)."""
    from sensomics_data_pipeline_spark.sources.readers import read_acc_csv

    paths = writers.write_three_way_split(_raw_df(spark), str(tmp_path), fmt="csv")
    back = read_acc_csv(spark, paths["ac"] + "/*.csv")
    row = back.first()
    assert row["kind"] == "acx"
    assert list(row["data"]) == [0.1, 0.2, 0.3, 0.4, 0.5]
