"""Small cross-cutting helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def materialize(df: DataFrame, **exprs: Column) -> DataFrame:
    """Force the named expressions to be computed ONCE per row as real
    attributes, via a one-element ``explode(array(struct(...)))``
    generator barrier.

    Why: Catalyst's CollapseProject + filter pushdown substitute a
    plain aliased expression into EVERY downstream consumer — for a
    heavy higher-order expression (tokenize, shingle+hash) referenced
    by k features, that re-evaluates it k times per row (measured 2-8×
    end-to-end on the text operators). A Generate node is a real
    barrier: its arguments are evaluated once per input row, and field
    extraction from the resulting struct attribute is O(1) per
    consumer."""
    payload = F.explode(
        F.array(F.struct(*[e.alias(k) for k, e in exprs.items()]))
    )
    out = df.withColumn("_mz", payload)
    for k in exprs:
        out = out.withColumn(k, F.col(f"_mz.{k}"))
    return out.drop("_mz")


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
    if df.isStreaming:
        # partitioning of a stream is the source's concern (maxFilesPer
        # Trigger / kafka partitions); df.rdd is not defined here anyway
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
