"""Z-order layout laws (sources/layout.py): content is untouched, the
Morton interleave is bit-correct, and the pruning win is MEASURED —
a box predicate must skip strictly more z-ordered files than
natural-order files of the same rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.sources import layout


def _grid_df(spark, n=20_000, seed=7):
    # two independent uniform dimensions — the z-order showcase shape
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1000))).alias("y"),
        )
    )


def test_zorder_morton_bit_interleave_exact(spark):
    # bits=2, ranks computed over [0,3]x[0,3]: closed-form Morton codes
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    z, zc = layout.zorder_value(df, ["x", "y"], bits=2)
    got = {(r["x"], r["y"]): r[zc] for r in z.collect()}

    def morton(x, y):
        v = 0
        for b in range(2):
            v |= ((x >> b) & 1) << (2 * b)
            v |= ((y >> b) & 1) << (2 * b + 1)
        return v

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_write_preserves_content(spark, tmp_path):
    df = _grid_df(spark, n=5_000)
    path = str(tmp_path / "z")
    layout.zorder_write(df, path, ["x", "y"], bits=8, n_files=8)
    back = spark.read.parquet(path)
    assert back.columns == df.columns
    assert (
        back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    )


def test_zorder_prunes_more_than_natural_order(spark, tmp_path):
    df = _grid_df(spark)
    zpath = str(tmp_path / "zord")
    npath = str(tmp_path / "nat")
    layout.zorder_write(df, zpath, ["x", "y"], bits=10, n_files=16)
    # natural order: same rows, same file count, id order
    (
        df.repartitionByRange(16, "id")
        .write.mode("overwrite")
        .parquet(npath)
    )
    box = {"x": (100.0, 199.0), "y": (300.0, 399.0)}
    skip_z = layout.file_skip_fraction(zpath, box)
    skip_n = layout.file_skip_fraction(npath, box)
    # a 10% x 10% box: z-order must skip most files; id-order (x and y
    # are hash-random per id) can prove nothing and skips ~none
    assert skip_z > skip_n
    assert skip_z >= 0.5
    assert skip_n <= 0.25


def test_zorder_single_column_sort_prunes_one_dim_only(spark, tmp_path):
    # the motivating comparison: sorting by x alone leaves y unpruned
    df = _grid_df(spark)
    xpath = str(tmp_path / "xsort")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    x_only = layout.file_skip_fraction(xpath, {"x": (100.0, 199.0)})
    y_only = layout.file_skip_fraction(xpath, {"y": (300.0, 399.0)})
    assert x_only >= 0.5  # sorted dim prunes
    assert y_only == 0.0  # the other dim cannot


def test_zorder_null_and_constant_columns_safe(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 5), (1, 5), (2, 5)], "x int, y int"
    )
    z, zc = layout.zorder_value(df, ["x", "y"], bits=4)
    vals = [r[zc] for r in z.collect()]
    assert all(v is not None and v >= 0 for v in vals)


def test_zorder_all_null_column_safe(spark, tmp_path):
    # an entirely-NULL clustered column yields None min/max stats;
    # it must degrade to a constant dimension, not crash on float(None)
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3)], "x int, y int"
    )
    z, zc = layout.zorder_value(df, ["x", "y"], bits=4)
    vals = [r[zc] for r in z.collect()]
    assert all(v is not None and v >= 0 for v in vals)
    out = str(tmp_path / "all_null")
    layout.zorder_write(df, out, ["x", "y"], bits=4, n_files=2)
    assert spark.read.parquet(out).count() == 3


def test_zorder_validates_args(spark):
    df = _grid_df(spark, n=10)
    with pytest.raises(ValueError):
        layout.zorder_value(df, ["x"], bits=4)
    with pytest.raises(ValueError):
        layout.zorder_value(df, ["x", "y"], bits=40)
