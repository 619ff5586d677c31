"""Small cross-cutting helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure a compute-heavy map stage downstream of ``df`` runs with at
    least ``min_parts`` tasks (default: the cluster's default
    parallelism).

    Why: a small parquet file scans as ONE input split, so a hash-heavy
    projection chained onto it (md5 shingling, simhash votes,
    fingerprinting) serializes on a single core no matter how many are
    available — at sf0.1 this single-partition effect, not the hashing
    itself, dominated the dedup-family bench times. At 100-TB scale the
    scan already has thousands of splits and this is a NO-OP: the
    partition-count check makes the repartition conditional, so no
    shuffle of the full corpus is ever forced on big inputs.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
