"""Feature engineering: per-group scaling and binning for
model-training pipelines (north-star ops, no reference analog).

All three are single-shuffle plans on the group key and produce
engine-reproducible outputs: min-max uses only exact extrema and one
IEEE division (bit-exact everywhere, no rounding needed), z-scores
round to 6 (mean/stddev are unordered float sums — the repo-wide
rounding convention), and quantile bins are ``ntile`` over a fully
tie-broken ordering (identical assignment on any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency binning: ``ntile(n_bins)`` per group ordered by
    ``(value, tiebreaks...)``. The ordering MUST be total — pass
    ``tiebreak_cols`` covering a unique key, or equal values straddling
    a bin boundary would be assigned nondeterministically. NULL values
    get bin NULL (excluded from the tiles) rather than polluting the
    first bin."""
    order = [F.col(value_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*(group_cols or [])).orderBy(*order)
    data = df.filter(F.col(value_col).isNotNull())
    binned = data.withColumn(out_col, F.ntile(n_bins).over(w))
    nulls = df.filter(F.col(value_col).isNull()).withColumn(
        out_col, F.lit(None).cast("int")
    )
    return binned.unionByName(nulls)


def minmax_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "minmax",
) -> DataFrame:
    """Min-max scaling to [0, 1] per group: ``(v - min) / (max - min)``.
    Exact extrema + one correctly-rounded IEEE division — bit-exact on
    any engine, no rounding needed. Constant groups (max == min) and
    NULL values scale to NULL. The extrema table is one row per group,
    broadcast back (global case: the whitelisted 1-row cross join)."""
    group_cols = group_cols or []
    ext = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    if group_cols:
        joined = df.join(F.broadcast(ext), group_cols, "left")
    else:
        joined = df.crossJoin(F.broadcast(ext))
    v = F.col(value_col)
    return joined.withColumn(
        out_col,
        F.when(
            F.col("_hi") > F.col("_lo"),
            (v - F.col("_lo")) / (F.col("_hi") - F.col("_lo")),
        ),
    ).drop("_lo", "_hi")


def standardize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "zscore",
    decimals: int = 6,
) -> DataFrame:
    """Z-score per group: ``(v - mean) / stddev_samp``, rounded to
    ``decimals`` (the mean/stddev sums are float-order-dependent in
    the last bits). Zero-variance groups and NULLs yield NULL
    (``try_divide`` semantics, ANSI-safe)."""
    group_cols = group_cols or []
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sd"),
    )
    if group_cols:
        joined = df.join(F.broadcast(stats), group_cols, "left")
    else:
        joined = df.crossJoin(F.broadcast(stats))
    z = F.expr(f"try_divide({value_col} - _mu, _sd)")
    return joined.withColumn(
        out_col,
        F.when(F.col("_sd") > 0, F.round(z, decimals)),
    ).drop("_mu", "_sd")
