"""Data-layout clustering for scan pruning (100-TB design): Z-order
(Morton-curve) multi-column clustering, the layout move behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` — re-expressed as plain Spark
(no table-format jars in this image).

Why: parquet readers skip whole files/row-groups via min/max
statistics. Sorting by ONE column makes its ranges tight but leaves
every other column's ranges full-width; interleaving the bits of k
normalized column ranks makes ALL k columns' per-file ranges shrink
like N^(1/k) of the domain, so selective predicates on ANY clustered
column prune most of a 100-TB table's files instead of none.

All JVM-side expressions (shift/mask/or folds inside codegen), one
bounded min/max collect per write, `repartitionByRange` +
`sortWithinPartitions` for the physical order — the standard sampled
range-exchange, no global sort on the driver. The pruning win is
MEASURED, not claimed: tests read back per-file parquet stats with
pyarrow and assert a box predicate skips strictly more files than the
natural-order layout of the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    stats_row=None,
) -> tuple[DataFrame, str]:
    """Attach the Morton code ``_zvalue`` interleaving ``bits``-bit
    normalized ranks of each (numeric/date/timestamp-castable) column.

    Rank = value-range scaling via the table min/max (ONE bounded
    aggregate, 2k scalars to the driver — pass ``stats_row`` to reuse
    a precomputed one). NULLs rank 0 (cluster together at the curve
    origin). Value-range scaling is skew-sensitive by design: for
    heavily skewed columns pre-transform (log, bucketize) before
    z-ordering, the same advice every table format gives.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 columns (1 column = plain sort)")
    if bits * k > 63:
        raise ValueError(f"bits*cols must fit a long, got {bits}*{k}")
    num = [F.col(c).cast("double") for c in cols]
    if stats_row is None:
        stats_row = df.agg(
            *[F.min(n).alias(f"_mn_{i}") for i, n in enumerate(num)],
            *[F.max(n).alias(f"_mx_{i}") for i, n in enumerate(num)],
        ).first()
    top = (1 << bits) - 1
    ranks: list[Column] = []
    for i, n in enumerate(num):
        # an all-NULL (or zero-row) column has None min/max stats —
        # treat it as constant (every row ranks 0 via the NULL
        # coalesce below) rather than crash on float(None)
        mn_raw, mx_raw = stats_row[f"_mn_{i}"], stats_row[f"_mx_{i}"]
        mn = float(mn_raw) if mn_raw is not None else 0.0
        mx = float(mx_raw) if mx_raw is not None else 0.0
        span = (mx - mn) or 1.0
        r = F.floor((n - F.lit(mn)) / F.lit(span) * F.lit(float(top)))
        r = F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), r.cast("long")))
        ranks.append(F.coalesce(r, F.lit(0).cast("long")))
    zv: Column = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            zv = zv.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, b).bitwiseAND(F.lit(1).cast("long")),
                    b * k + i,
                )
            )
    return df.withColumn("_zvalue", zv), "_zvalue"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int | None = None,
    fmt: str = "parquet",
) -> str:
    """Write ``df`` clustered on the Z-order curve of ``cols``:
    ``repartitionByRange(_zvalue)`` (sampled range exchange — each
    output file owns a contiguous curve segment) +
    ``sortWithinPartitions`` (tight row-group stats inside each file).
    Row content is untouched — layout only (content-equality pinned in
    tests). ``n_files`` defaults to the session shuffle parallelism.
    """
    z, zcol = zorder_value(df, cols, bits=bits)
    n = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    (
        z.repartitionByRange(n, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
    return path


def file_skip_fraction(
    path: str, predicates: dict[str, tuple[float, float]]
) -> float:
    """Measured pruning: the fraction of parquet files under ``path``
    whose min/max statistics PROVE they contain no row matching the
    conjunctive box ``predicates`` ({col: (lo, hi)}) — i.e. what a
    stats-aware scan skips without reading data. Driver-side pyarrow
    over file footers (metadata only); used by tests and layout
    audits, not by query plans (Spark's own reader applies the same
    skipping internally)."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{path}/*.parquet"))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in predicates and col.statistics is not None:
                    st = col.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
        # file is skippable if ANY predicate interval misses its range
        for c, (lo, hi) in predicates.items():
            if c in mins and (maxs[c] < lo or mins[c] > hi):
                skipped += 1
                break
    return skipped / len(files)
