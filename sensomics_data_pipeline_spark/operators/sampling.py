"""Deterministic sampling for training-data curation (north-star op,
no reference analog).

``spark.sample`` / ``sampleBy`` are Bernoulli: per-row coin flips give
only EXPECTED counts, vary with partitioning, and can't be reproduced
by an independent engine. Curation pipelines want exact per-stratum
quotas and byte-reproducible selections — so sampling here is a
*rank-by-portable-hash* plan: order rows inside each stratum by the
60-bit md5 hash of (seed, key), keep the first ``k`` (or
``ceil(fraction·n)``). One shuffle on the strata keys; deterministic
across cluster layouts, restarts, AND engines (DuckDB can reproduce
the exact selection, since md5 is md5 everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_hash(key_col: str, seed: int):
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key_col))), 1, 15),
        16,
        10,
    ).cast("bigint")


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    fraction: float | None = None,
    n_per_stratum: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keep exactly ``n_per_stratum`` rows per stratum, or exactly
    ``ceil(fraction · stratum_size)`` when ``fraction`` is given —
    selected by portable-hash rank so the sample is a pure function of
    (data, seed). Exactly one of ``fraction`` / ``n_per_stratum``.

    Plan: one window over the strata keys ordered by the hash rank
    (+key tiebreak), a windowed count for the fraction quota — a single
    shuffle, no driver involvement, any scale."""
    if (fraction is None) == (n_per_stratum is None):
        raise ValueError("pass exactly one of fraction / n_per_stratum")
    w = Window.partitionBy(*strata_cols).orderBy(
        _rank_hash(key_col, seed), F.col(key_col)
    )
    ranked = df.withColumn("_rn", F.row_number().over(w))
    if n_per_stratum is not None:
        quota = F.lit(n_per_stratum)
    else:
        cnt = F.count("*").over(Window.partitionBy(*strata_cols))
        quota = F.ceil(F.lit(float(fraction)) * cnt)
    # window exprs can't live in a WHERE — materialize the quota column
    return (
        ranked.withColumn("_quota", quota)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def weighted_sample_priority(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    weight_col: str,
    fraction: float | None = None,
    n_per_stratum: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement (priority
    sampling, Duffield-Lund-Thorup style): inside each stratum keep the
    ``k`` rows with the smallest priority ``q_i = h_i / w_i``, where
    ``h_i`` is the portable 48-bit md5 hash of (seed, key) playing the
    role of the uniform draw and ``w_i`` the row weight — heavier rows
    get proportionally smaller priorities, so inclusion probability
    grows with weight, yet the selection is a pure function of
    (data, seed), byte-reproducible across cluster layouts AND engines.

    Engine-exactness of the ordering key: ``h`` (< 2^48) and ``w``
    (integer-valued weights) are both exactly representable doubles, so
    ``h / w`` is ONE correctly-rounded IEEE-754 division — bit-identical
    in any engine — and ties (possible only for equal (h, w)) break on
    ``key_col``. No transcendental (``-ln(u)/w`` of classic A-Res) ever
    enters the comparison, which is what makes a SQL oracle able to
    reproduce the exact row set.

    Rows with NULL, zero, or negative weight are excluded (a weight of
    0 means "never sample"; negatives are undefined). Same single
    window shuffle as :func:`stratified_sample_exact`.
    """
    if (fraction is None) == (n_per_stratum is None):
        raise ValueError("pass exactly one of fraction / n_per_stratum")
    h48 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key_col))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    pri = h48.cast("double") / F.col(weight_col).cast("double")
    pos = df.filter(F.col(weight_col) > 0)
    w = Window.partitionBy(*strata_cols).orderBy(pri.asc(), F.col(key_col))
    ranked = pos.withColumn("_rn", F.row_number().over(w))
    if n_per_stratum is not None:
        quota = F.lit(n_per_stratum)
    else:
        cnt = F.count("*").over(Window.partitionBy(*strata_cols))
        quota = F.ceil(F.lit(float(fraction)) * cnt)
    return (
        ranked.withColumn("_quota", quota)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def rebalance_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic domain-mix rebalancing (north-star op): subsample
    each source so the kept corpus matches the target mix ``weights``
    as closely as exact integer quotas allow, keeping the maximum total
    volume — the data-mixing step of a training-data pipeline (e.g.
    up-weighting curated sources vs raw web crawl).

    Quota math: with per-source counts ``c_s`` and target weights
    ``w_s``, the binding source fixes the scale ``m = min_s(c_s/w_s)``
    and each source keeps ``floor(m · w_s)`` rows (its full count for
    the binding source). Selection within a source is the same
    rank-by-portable-hash as ``stratified_sample_exact`` — a pure
    function of (data, weights, seed), byte-reproducible on any engine.

    Plan: tiny per-source count agg → scalar min → broadcast quota map
    joined onto one rank window per source. One data-sized shuffle (the
    window); unknown sources (absent from ``weights``) are dropped.

    A source named in ``weights`` but ABSENT from the data contributes
    no scale constraint (its count is not zero-filled): the mix is
    computed over available sources only. Callers needing a strict
    guarantee that every weighted source is represented should check
    counts first — a zero-filled constraint would force m=0 and drop
    the whole corpus, which is never what a pipeline wants.

    If NO weighted source exists in the data at all, the scale is
    undefined and the job FAILS at execution time (``raise_error`` on
    the NULL min) instead of silently returning an empty corpus — an
    all-rows-vanish outcome always means mis-keyed weights, and lazy
    in-plan raising costs no extra scan.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())],
        f"{source_col} string, _wt double",
    )
    counts = df.groupBy(source_col).count()
    scale = (
        counts.join(wdf, source_col)
        .select(F.min(F.col("count") / F.col("_wt")).alias("_m"))
        .select(
            F.when(F.col("_m").isNotNull(), F.col("_m"))
            .otherwise(
                F.raise_error(
                    F.lit(
                        "rebalance_sources: no source named in `weights` "
                        "is present in the data — the whole corpus would "
                        "be dropped (check the weight keys)"
                    )
                )
            )
            .alias("_m")
        )
    )
    quotas = (
        wdf.crossJoin(scale)
        .select(
            source_col,
            F.floor(F.col("_m") * F.col("_wt")).cast("bigint").alias("_quota"),
        )
    )
    w = Window.partitionBy(source_col).orderBy(
        _rank_hash(key_col, seed), F.col(key_col)
    )
    ranked = df.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), source_col)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def assign_splits(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a split
    label from ``fractions`` (label → fraction, summing to 1) as a pure
    function of (key, seed) — no quota windows, no shuffle, no
    coordination.

    The portable 60-bit hash is scaled to [0, 1) and cut at the
    cumulative fraction boundaries (labels in sorted order for
    determinism; the last label absorbs any float residue). Per-row
    projection only — the assignment survives repartitioning,
    incremental appends (a new row never moves an old row's split),
    and re-runs on any engine. This is the property quota-exact splits
    (``stratified_sample_exact``) cannot give you on a growing corpus;
    use this for train/holdout hygiene and the quota variant for
    fixed-size evaluation sets.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    labels = sorted(fractions)
    # u in [0, 1): 60-bit hash / 2^60
    u = _rank_hash(key_col, seed) / F.lit(float(1 << 60))
    expr, cum = None, 0.0
    for lab in labels[:-1]:
        cum += fractions[lab]
        cond = u < F.lit(cum)
        expr = (
            F.when(cond, F.lit(lab))
            if expr is None
            else expr.when(cond, F.lit(lab))
        )
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
