"""Table reconciliation and distribution drift (north-star data-
quality ops, no reference analog): the checks a pipeline runs when a
source is re-delivered, a backfill lands, or a new batch may have
shifted.

Both are single-shuffle plans: ``table_diff`` is one full-outer
equi-join on the key (co-partitioned on both sides); ``distribution_
drift`` is one aggregate over binned counts. Outputs are exact
integers or single IEEE divisions of exact integers — engine-
reproducible without rounding tricks (the drift scores round at 6
like every float aggregate in the repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level symmetric diff of two tables on a key: returns
    ``(key_cols..., change_type)`` with change_type in
    ``added`` (key only in ``b``), ``removed`` (only in ``a``),
    ``changed`` (both, any compare column differs — NULL-safe), and
    unchanged rows omitted.

    Comparison hashes the compared columns into one 64-bit value per
    side, so the join carries two longs instead of the full row
    payloads — at 100 TB the shuffle moves keys + 8 bytes, not wide
    rows.

    Hashing is NATIVE-TYPED, two-level: each column is ``xxhash64``-ed
    individually (NULL hashes to the bare seed, distinct from every
    value hash up to the 2^-64 collision), then the per-column longs
    are ``xxhash64``-ed together. The two levels matter: a single flat
    ``xxhash64(c1, c2)`` folds NULL as a seed NO-OP, so ``(NULL, x)``
    and ``(x, NULL)`` would collide — hashing columns first makes NULL
    position-distinguishable. No string casts, so there is no sentinel
    value a real string could forge and no dependence on cast
    formatting. Map columns are canonicalized via ``array_sort(
    map_entries(...))`` before hashing (map entry order is physical,
    not logical). Remaining caveats, documented: the 2^-64 per-row
    false-negative of any hash diff, and float comparison is BITWISE
    (``-0.0`` vs ``0.0`` and differing NaN payloads hash as changed —
    the right default for a re-delivery diff).
    """
    compare_cols = compare_cols or [
        c for c in a.columns if c not in key_cols
    ]

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        dtypes = dict(df.dtypes)
        per_col = []
        for c in compare_cols:
            if dtypes.get(c, "").startswith("map<"):
                per_col.append(
                    F.xxhash64(F.array_sort(F.map_entries(F.col(c))))
                )
            else:
                per_col.append(F.xxhash64(F.col(c)))
        return df.select(
            *key_cols, F.xxhash64(*per_col).alias(f"_h_{tag}")
        )

    ha, hb = hashed(a, "a"), hashed(b, "b")
    joined = ha.join(hb, key_cols, "full_outer")
    change = (
        F.when(F.col("_h_a").isNull(), F.lit("added"))
        .when(F.col("_h_b").isNull(), F.lit("removed"))
        .when(F.col("_h_a") != F.col("_h_b"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def distribution_drift(
    df: DataFrame,
    value_col: str,
    split_col,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distribution-shift scores between two slices of one table
    (baseline = ``split_col`` false, candidate = true): equi-width bins
    over the COMBINED min/max, then per group the total-variation
    distance ``0.5 * Σ |p_i - q_i|`` and Pearson chi-square statistic
    ``Σ (o_i - e_i)² / e_i`` over candidate counts vs baseline-rate
    expectations. Rational functions of exact bin counts — no logs (a
    PSI's ``ln`` is not reproducible across engines' libm), rounded at
    6 only to absorb the ≤``n_bins``-term float sum order.

    ``split_col`` is a boolean Column; NULL values drop. Output: one
    row per group — ``(group_cols..., n_base, n_cand, tv_distance,
    chi_square)``; groups with an empty side emit NULL scores.

    Convention: ``chi_square`` uses the textbook ``e_i > 0`` rule —
    candidate mass landing in a bin the BASELINE never occupied has an
    undefined expectation and contributes NOTHING to the statistic (no
    epsilon smoothing: an arbitrary epsilon would dominate the sum and
    is not engine-reproducible). Such novel-bin mass IS fully counted
    by ``tv_distance`` (|p - q| = q there), which is the robust
    headline signal; read chi_square as a shape test over the shared
    support only.
    """
    group_cols = group_cols or []
    v = F.col(value_col)
    data = df.filter(v.isNotNull()).withColumn(
        "_cand", split_col.cast("boolean")
    ).filter(F.col("_cand").isNotNull())
    ext = data.groupBy(*group_cols).agg(
        F.min(v).cast("double").alias("_lo"),
        F.max(v).cast("double").alias("_hi"),
    )
    if group_cols:
        binnable = data.join(F.broadcast(ext), group_cols, "left")
    else:
        binnable = data.crossJoin(F.broadcast(ext))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((v.cast("double") - F.col("_lo")) / width),
            F.lit(n_bins - 1),
        )
    ).cast("int")
    counts = (
        binnable.withColumn("_b", bucket)
        .groupBy(*group_cols, "_b")
        .agg(
            F.sum(F.when(~F.col("_cand"), 1).otherwise(0)).alias("_o_base"),
            F.sum(F.when(F.col("_cand"), 1).otherwise(0)).alias("_o_cand"),
        )
    )
    tot = counts.groupBy(*group_cols).agg(
        F.sum("_o_base").alias("_n_base"), F.sum("_o_cand").alias("_n_cand")
    )
    if group_cols:
        per_bin = counts.join(F.broadcast(tot), group_cols)
    else:
        per_bin = counts.crossJoin(F.broadcast(tot))
    # try_divide: a group can lack one side entirely (n = 0) and ANSI
    # mode raises on double/0 — NULL degrades to the masked output
    p = F.try_divide(
        F.col("_o_base").cast("double"), F.col("_n_base").cast("double")
    )
    q = F.try_divide(
        F.col("_o_cand").cast("double"), F.col("_n_cand").cast("double")
    )
    expected = p * F.col("_n_cand").cast("double")
    chi_term = F.when(
        F.col("_o_base") > 0,
        F.try_divide((F.col("_o_cand").cast("double") - expected) ** 2, expected),
    )
    return (
        per_bin.groupBy(*group_cols)
        .agg(
            F.min("_n_base").alias("n_base"),
            F.min("_n_cand").alias("n_cand"),
            F.round(0.5 * F.sum(F.abs(p - q)), 6).alias("tv_distance"),
            F.round(F.sum(chi_term), 6).alias("chi_square"),
        )
        .withColumn(
            "tv_distance",
            F.when(
                (F.col("n_base") > 0) & (F.col("n_cand") > 0),
                F.col("tv_distance"),
            ),
        )
        .withColumn(
            "chi_square",
            F.when(
                (F.col("n_base") > 0) & (F.col("n_cand") > 0),
                F.col("chi_square"),
            ),
        )
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from an
    update/event stream: per key, consecutive runs of identical
    ``attr_cols`` collapse into one effective-dated row —
    ``(key..., attr..., effective_from, effective_to, version,
    is_current)`` with ``effective_to = next run's effective_from``
    (NULL on the current run) and ``version`` counting runs from 1.

    Complements :func:`table_diff` (what changed between two
    snapshots) and ``resample.merge_upsert`` (apply a change set):
    this is the WAREHOUSE-HISTORY shape — "what was this dimension's
    state at time t" answered by ``effective_from <= t <
    effective_to``.

    Scale shape: SCD2 rows ARE the run starts, so no groupBy is
    needed — one window pass flags rows whose attributes differ from
    the previous row (NULL-safe), a filter keeps the starts, and a
    second window derives effective_to/version by ``lead``/
    ``row_number``. Both windows partition by the SAME keys, so
    Catalyst plans ONE hash exchange for the whole operator; cost is
    one shuffle of the input, output is bounded by the number of
    genuine attribute changes.

    Determinism: ordering is ``(ts_col, *tiebreak_cols)`` — pass a
    unique tiebreak (an event id) whenever timestamps can collide
    within a key, per the repo-wide tie-break rule. The first row per
    key always opens a run (``row_number() == 1``), which also covers
    all-NULL attributes that a NULL-safe lag-compare alone would
    miss.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    starts = df.withColumn("_run_start", changed).filter("_run_start")
    return (
        starts.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("effective_from"),
            F.lead(F.col(ts_col)).over(w).alias("effective_to"),
            F.row_number().over(w).alias("version"),
        )
        .withColumn(
            "is_current", F.col("effective_to").isNull().cast("int")
        )
    )
