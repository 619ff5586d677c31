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


def write_scalar_sidecar(spark, value, path: str) -> None:
    """S8: persist a scalar artifact (clock-skew ``d_time``, thresholds)
    as a 1-row single-file dataset — readable by any engine, no
    driver-local file I/O assumptions."""
    spark.createDataFrame([(value,)], "value string" if isinstance(value, str) else "value double").coalesce(
        1
    ).write.mode("overwrite").json(path)


def read_scalar_sidecar(spark, path: str):
    return spark.read.json(path).first()["value"]
