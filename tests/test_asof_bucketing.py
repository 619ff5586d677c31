"""Tests: generic as-of join operator; bucketed co-located joins."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.operators.asof import asof_join

TS0 = pd.Timestamp("2024-03-01 08:00:00")


def ts(minutes: float) -> pd.Timestamp:
    return TS0 + pd.Timedelta(minutes=minutes)


def test_asof_join_backward_matches_merge_asof(spark):
    left = pd.DataFrame(
        {
            "user": [1, 1, 1, 2, 2],
            "t": [ts(5), ts(10), ts(30), ts(7), ts(8)],
            "x": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    right = pd.DataFrame(
        {
            "user": [1, 1, 2],
            "t": [ts(4), ts(9), ts(7.5)],
            "y": [100.0, 200.0, 300.0],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by=["user"],
        )
        .toPandas()
        .sort_values(["user", "t"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="user",
        direction="backward",
    ).sort_values(["user", "t"]).reset_index(drop=True)
    assert list(got["y_right"].fillna(-1)) == list(want["y"].fillna(-1))


def test_asof_join_tolerance_and_forward(spark):
    left = pd.DataFrame({"user": [1, 1], "t": [ts(10), ts(60)], "x": [1.0, 2.0]})
    right = pd.DataFrame({"user": [1], "t": [ts(9)], "y": [42.0]})
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by=["user"],
            tolerance_s=600,
        )
        .toPandas()
        .set_index("x")
    )
    assert out.loc[1.0, "y_right"] == 42.0
    assert pd.isna(out.loc[2.0, "y_right"])  # 51 min back > 10 min tolerance

    fwd = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.assign(t=[ts(30)])),
            on="t",
            by=["user"],
            direction="forward",
        )
        .toPandas()
        .set_index("x")
    )
    assert fwd.loc[1.0, "y_right"] == 42.0  # next right at 30 ≥ 10
    assert pd.isna(fwd.loc[2.0, "y_right"])  # nothing after 60


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """bucketBy co-location: a join of two tables bucketed on the same
    key plans as SortMergeJoin with NO Exchange on either side."""
    import contextlib
    import io
    import uuid

    from sensomics_data_pipeline_spark.sources.readers import load_table

    # spark.sql.warehouse.dir is static — bucketed tables land in the
    # session's default warehouse and are dropped in the finally block
    suffix = uuid.uuid4().hex[:8]
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"orders_b_{suffix}")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"lineitem_b_{suffix}")
    )
    ob = spark.table(f"orders_b_{suffix}")
    lb = spark.table(f"lineitem_b_{suffix}")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    # disable broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import re

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Bucketed: true" in plan
        join_steps = [int(m) for m in re.findall(r"\((\d+)\) SortMergeJoin", plan)]
        exch_steps = [int(m) for m in re.findall(r"\((\d+)\) Exchange", plan)]
        assert join_steps, "no SortMergeJoin in plan"
        # plan steps number leaves-first: every Exchange (only the final
        # groupBy's) must come AFTER the join — no shuffle feeds the join
        assert all(e > max(join_steps) for e in exch_steps), plan
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql(f"DROP TABLE IF EXISTS orders_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS lineitem_b_{suffix}")


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """At-scale swaps: approx_count_distinct / percentile_approx stay
    within documented tolerance of the exact forms."""
    from sensomics_data_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact_d"),
        F.approx_count_distinct("user_id").alias("approx_d"),
        F.expr("percentile(value, 0.975)").alias("exact_q"),
        F.expr("percentile_approx(value, 0.975, 1000)").alias("approx_q"),
    ).first()
    assert abs(row["approx_d"] - row["exact_d"]) / row["exact_d"] < 0.05
    assert abs(row["approx_q"] - row["exact_q"]) / abs(row["exact_q"]) < 0.05


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_ts=st.lists(st.integers(0, 500), min_size=1, max_size=25),
    right_ts=st.lists(st.integers(0, 500), min_size=1, max_size=25),
)
def test_asof_join_property_vs_merge_asof(spark, left_ts, right_ts):
    """Randomized as-of parity: Spark union-stream as-of == pandas
    merge_asof on single-key data with duplicate timestamps allowed."""
    left = pd.DataFrame(
        {
            "user": 1,
            "t": [ts(m) for m in sorted(left_ts)],
            "x": range(len(left_ts)),
        }
    )
    right = (
        pd.DataFrame(
            {
                "user": 1,
                "t": [ts(m) for m in sorted(set(right_ts))],
            }
        )
        .assign(y=lambda d: d.index.astype(float))
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by=["user"],
        )
        .toPandas()
        .sort_values(["t", "x"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="user"
    ).sort_values(["t", "x"]).reset_index(drop=True)
    assert list(got["y_right"].fillna(-1)) == list(want["y"].fillna(-1))
