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


# ---------------------------------------------------------------------------
# Round-4: generic dataset sink, bucketed tables, HLL sketch rollups
# ---------------------------------------------------------------------------


def test_write_dataset_roundtrip_all_formats(spark, tmp_path):
    import pytest

    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "b", [3.0])],
        "id long, name string, vec array<double>",
    )
    for fmt in writers.DATASET_FORMATS:
        path = writers.write_dataset(df, str(tmp_path / fmt), fmt=fmt)
        back = writers.read_dataset(spark, path, fmt=fmt)
        assert back.count() == 2
        if fmt in ("parquet", "orc", "json"):
            got = {
                (r.id, r.name, tuple(r.vec))
                for r in back.select("id", "name", "vec").collect()
            }
            assert got == {(1, "a", (1.0, 2.0)), (2, "b", (3.0,))}
        else:  # csv stringifies arrays
            assert back.filter("name = 'a'").first().vec == "[1.0,2.0]"
    with pytest.raises(ValueError):
        writers.write_dataset(df, str(tmp_path / "x"), fmt="avro")


def test_write_dataset_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(20)],
        "id long, par string",
    )
    path = writers.write_dataset(
        df, str(tmp_path / "p"), fmt="orc", partition_cols=["par"]
    )
    back = writers.read_dataset(spark, path, fmt="orc").filter(
        F.col("par") == "even"
    )
    assert back.count() == 10
    # partition pruning: the physical scan must carry the partition filter
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Two tables co-bucketed on the join key: the sort-merge join must
    read buckets in place — NO Exchange on either side."""
    import uuid

    a = spark.range(0, 1000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") * 3)
    ta, tb = (f"t{uuid.uuid4().hex[:8]}_{s}" for s in ("a", "b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test size the planner would broadcast (which also skips the
        # shuffle, but trivially); force the sort-merge path the layout
        # is designed for, as a big-fact x big-fact join would plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        writers.write_bucketed_table(a, ta, ["id"], n_buckets=8, sort_cols=["id"])
        writers.write_bucketed_table(b, tb, ["id"], n_buckets=8, sort_cols=["id"])
        joined = spark.table(ta).join(spark.table(tb), "id")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_hll_sketch_rollup_matches_exact_within_error(spark):
    from sensomics_data_pipeline_spark.operators.profile import (
        distinct_sketches,
        rollup_sketches,
    )

    df = spark.range(0, 20000).selectExpr(
        "id % 10 AS day", "id % 4 AS src", "cast(id % 3777 AS string) AS user"
    )
    fine = distinct_sketches(df, ["day", "src"], "user", lgk=12)
    assert fine.count() == 20  # (id%10, id%4) has lcm(10,4)=20 combos
    # roll the 20 stored sketches up to per-src and global WITHOUT
    # touching df again
    per_src = rollup_sketches(fine, ["src"])
    glob = rollup_sketches(fine, [])
    exact = df.select("user").distinct().count()
    est = glob.first().estimate
    assert abs(est - exact) / exact < 0.05
    for r in per_src.collect():
        ex = df.filter(F.col("src") == r.src).select("user").distinct().count()
        assert abs(r.estimate - ex) / ex < 0.05


def test_bitmap_distinct_exact_vs_count_distinct(spark):
    """Bitmap partials rolled up at several grains must equal exact
    COUNT DISTINCT — including negative ids and NULLs."""
    from sensomics_data_pipeline_spark.operators.profile import (
        distinct_bitmaps,
        rollup_bitmaps,
    )

    df = spark.range(0, 50000).selectExpr(
        "id % 4 AS src",
        "id % 10 AS day",
        "CASE WHEN id % 97 = 0 THEN NULL ELSE (id * 7919) % 5003 - 1000 END AS uid",
    )
    fine = distinct_bitmaps(df, ["src", "day"], "uid")
    for grain in (["src"], ["day"], []):
        got = {
            tuple(r[c] for c in grain): r.n_distinct
            for r in rollup_bitmaps(fine, grain).collect()
        }
        want = {
            tuple(r[c] for c in grain): r.n
            for r in df.groupBy(*grain)
            .agg(F.count_distinct("uid").alias("n"))
            .collect()
        }
        assert got == want, grain
