"""Sinks (SURVEY.md §2.1 S7-S8, S10).

The reference writes three CSV extracts per stage plus tiny scalar
sidecars (``raw_data_reformat.py:90-103``, ``:51-55``). Here:
- Parquet is the default inter-stage format (typed, splittable,
  column-pruned); CSV writers exist for export parity.
- The 3-way split is three filtered writes of ONE cached DataFrame —
  the source scan runs once, not three times.
- Partitioned layout (per-date directories, ``organize_raw_files``) is
  a sink property: ``partitionBy``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_three_way_split(
    df: DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    partition_cols: list[str] | None = None,
) -> dict[str, str]:
    """S7: the measurements / ppg / accelerometer 3-way split
    (``json_data_cleanup`` sinks, ``raw_data_reformat.py:90-103``).

    One cache, three filtered writes — the filters (`kind`) are applied
    to the cached plan, so the upstream scan+normalize executes once.
    Returns {name: path}.
    """
    from sensomics_data_pipeline_spark.operators.unpivot import (
        normalize_measurements,
        split_ppg_ac,
    )

    from sensomics_data_pipeline_spark import schemas

    cached = df.persist()
    try:
        # canonical column order (schemas.MEASUREMENTS_SCHEMA /
        # AC_RAW_SCHEMA): CSV readers apply schemas positionally
        meas_order = [f.name for f in schemas.MEASUREMENTS_SCHEMA.fields]
        ac_order = [f.name for f in schemas.AC_RAW_SCHEMA.fields]
        measurements = normalize_measurements(cached).select(*meas_order)
        ppg, ac = split_ppg_ac(cached)
        ppg = ppg.select(*[c for c in ac_order if c in ppg.columns])
        ac = ac.select(*[c for c in ac_order if c in ac.columns])
        out = {}
        for name, part in (
            ("measurements", measurements),
            ("ppg", ppg),
            ("ac", ac),
        ):
            path = f"{out_dir}/{name}"
            if fmt == "csv":
                # arrays don't survive CSV — stringify for export parity
                for f_ in part.schema.fields:
                    if f_.dataType.simpleString().startswith("array"):
                        part = part.withColumn(f_.name, F.to_json(f_.name))
            writer = part.write.mode("overwrite")
            if partition_cols:
                writer = writer.partitionBy(*partition_cols)
            if fmt == "csv":
                writer.option("header", "true").csv(path)
            else:
                writer.parquet(path)
            out[name] = path
        return out
    finally:
        cached.unpersist()


#: formats with a first-class Spark datasource in this build (avro and
#: delta/iceberg need jars absent from the runtime — gated, not listed)
DATASET_FORMATS = ("parquet", "orc", "json", "csv")


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_cols: list[str] | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Generic format-parametric sink: parquet (default inter-stage),
    ORC (columnar alternative, same pushdown/pruning story), JSON and
    CSV (interchange). Arrays/structs are stringified for the flat
    text formats, mirroring ``write_three_way_split``'s CSV rule, so
    every engine-producible table round-trips through every format.

    ``partition_cols`` → hive-style directory layout (partition
    pruning on read); ``compression`` defaults to the format's Spark
    default (snappy/zstd for columnar) when None."""
    if fmt not in DATASET_FORMATS:
        raise ValueError(f"fmt must be one of {DATASET_FORMATS}, got {fmt!r}")
    if fmt == "csv":
        for f_ in df.schema.fields:
            kind = f_.dataType.simpleString()
            if kind.startswith(("array", "struct", "map")):
                df = df.withColumn(f_.name, F.to_json(f_.name))
    writer = df.write.mode(mode).format(fmt)
    if compression:
        writer = writer.option("compression", compression)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    return path


def read_dataset(
    spark,
    path: str,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Read back a :func:`write_dataset` output. For csv/json pass the
    target schema to avoid inference scans (and to restore types the
    text formats erase)."""
    if fmt not in DATASET_FORMATS:
        raise ValueError(f"fmt must be one of {DATASET_FORMATS}, got {fmt!r}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_sorted_dataset(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    fmt: str = "parquet",
) -> str:
    """Range-clustered layout: ``repartitionByRange`` on ``sort_cols``
    (each output file owns a disjoint key range) + ``sortWithinPartitions``
    (rows ordered inside each file). For columnar formats this makes
    min/max footer statistics TIGHT, so point/range predicates on the
    sort key skip whole files and row groups at scan time — the poor
    man's z-order, and the single highest-leverage layout move for a
    100-TB table that is mostly filtered on one dimension (time,
    tenant, key prefix). Unlike ``write_bucketed_table`` this needs no
    metastore — the pruning lives in the parquet footers.

    ``n_files`` bounds output file count (defaults to Spark's range
    partitioning of ``spark.sql.shuffle.partitions``).
    """
    parted = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode("overwrite").format(
        fmt
    ).save(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> str:
    """Bucketed managed table (``bucketBy`` + ``saveAsTable``): rows are
    hash-partitioned into ``n_buckets`` files per partition ON WRITE,
    so later equi-joins and aggregations on ``bucket_cols`` read the
    co-located buckets and skip the shuffle entirely — THE layout move
    for a 100-TB fact table that is repeatedly joined on the same key
    (pay the shuffle once at ingest, never again). ``sort_cols`` adds
    in-bucket ordering, upgrading those joins to zero-sort sort-merge.

    Plan contract (asserted in tests): joining two tables bucketed the
    same way on the join key plans NO Exchange on either side.
    """
    writer = df.write.mode("overwrite").format(fmt).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return table


def write_scalar_sidecar(spark, value, path: str) -> None:
    """S8: persist a scalar artifact (clock-skew ``d_time``, thresholds)
    as a 1-row single-file dataset — readable by any engine, no
    driver-local file I/O assumptions."""
    spark.createDataFrame([(value,)], "value string" if isinstance(value, str) else "value double").coalesce(
        1
    ).write.mode("overwrite").json(path)


def read_scalar_sidecar(spark, path: str):
    return spark.read.json(path).first()["value"]
