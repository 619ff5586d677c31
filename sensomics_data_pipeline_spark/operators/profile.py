"""Table profiling: per-column statistics in one pass (data-quality
staple for 100-TB ingest — nulls, cardinality, ranges — computed as a
single aggregate job, then unpivoted to long form).

One ``agg`` with 4 expressions per column = one scan + one reduce; the
unpivot is a zero-shuffle projection of the 1-row result. Distinct
counts use HyperLogLog (``approx_count_distinct``) — exact distincts
per column would be one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, approx_rsd: float = 0.05, exact: bool = False
) -> DataFrame:
    """Profile every column: (column, n, n_null, approx_distinct,
    min_value, max_value) — min/max stringified so heterogeneous column
    types fit one long schema. ``exact=True`` swaps HLL for exact
    distinct counts (oracle-comparable; one extra expand at scale)."""
    distinct_fn = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd=approx_rsd))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in df.columns:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{c}"),
            distinct_fn(c).alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stacks = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in df.columns
    )
    return one.selectExpr(
        "_n AS n",
        f"stack({len(df.columns)}, {stacks}) AS "
        "(column, n_null, approx_distinct, min_value, max_value)",
    ).select("column", "n", "n_null", "approx_distinct", "min_value", "max_value")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier detection per group: flag rows whose value
    deviates from the group MEDIAN by more than ``k`` × MAD (median
    absolute deviation) — the classic robust z-score, immune to the
    outliers themselves inflating the threshold the way mean/stddev
    rules are.

    Plan: two grouped exact-percentile aggregates (median, then MAD of
    the residuals) — the per-group tables are tiny (one row per group),
    so both join back as BROADCASTs and the big table is scanned twice
    but never shuffled on its own rows. Exact interpolated percentile
    (same semantics both engines, pinned by the `quantiles` query).
    ``is_outlier`` marks POSITIVELY identified outliers and is never
    NULL: a row whose value is NULL, or whose group stats are NULL
    (e.g. a NULL group key under standard join equality), flags
    ``false`` — the column stays filter-safe and engine-reproducible
    (NULL booleans round-trip differently across drivers). Degenerate
    groups where MAD = 0 (a majority of identical values) flag any row
    off the median, matching the textbook rule.
    """
    group_cols = group_cols or []
    v = F.col(value_col)

    def attach(base: DataFrame, one: DataFrame) -> DataFrame:
        # global (no-group) case: the aggregate is a single row —
        # crossJoin(broadcast) is the whitelisted attach-scalars shape
        if group_cols:
            return base.join(F.broadcast(one), on=group_cols, how="left")
        return base.crossJoin(F.broadcast(one))

    med_df = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = attach(df, med_df)
    mad_df = (
        with_med.groupBy(*group_cols)
        .agg(
            F.expr(f"percentile(abs({value_col} - _med), 0.5)").alias("_mad")
        )
    )
    out = attach(with_med, mad_df)
    return out.select(
        *df.columns,
        F.round(F.col("_med"), 6).alias("group_median"),
        F.round(F.col("_mad"), 6).alias("group_mad"),
        F.coalesce(
            F.abs(v - F.col("_med")) > F.lit(float(k)) * F.col("_mad"),
            F.lit(False),
        ).alias("is_outlier"),
    )


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog sketches (Apache DataSketches via Spark's
    ``hll_sketch_agg``): returns ``(group_cols..., sketch, estimate)``
    where ``sketch`` is the MERGEABLE binary state, not just the
    number.

    The mergeable sketch is the 100-TB point: compute per-partition
    (e.g. per-day, per-source) sketches ONCE in the ingest pass, store
    them (kilobytes each), then answer any coarser rollup — distinct
    users per week / month / global — by :func:`rollup_sketches` over
    the stored sketches, never rescanning the raw data. Error is
    ~1.04/√2^lgk (≈1.6% at lgk=12).
    """
    out = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )
    return out.withColumn("estimate", F.hll_sketch_estimate("sketch"))


def rollup_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge stored HLL sketches up to a coarser grouping — the rollup
    half of :func:`distinct_sketches`. Input rows are (finer keys...,
    sketch); output is ``(group_cols..., sketch, estimate)`` at the
    coarser grain. Cost scales with the NUMBER OF SKETCHES (tiny), not
    the raw data they summarize."""
    merged = F.hll_union_agg(sketch_col)
    return sketches.groupBy(*group_cols).agg(
        merged.alias("sketch"),
        F.hll_sketch_estimate(merged).alias("estimate"),
    )


def distinct_bitmaps(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """EXACT mergeable distinct-count state: per group, RoaringBitmap-
    style partials (Spark's ``bitmap_construct_agg`` — one bitmap per
    32k-wide value bucket) for an integral ``value_col``. The exact
    sibling of :func:`distinct_sketches`: same store-once/roll-up-
    anywhere shape, zero error, state linear in the distinct-value
    range instead of constant — the right tool when ids are dense
    (user/device ids) and exactness matters (billing, dedup ledgers).

    Output: ``(group_cols..., bucket, bitmap)`` — feed to
    :func:`rollup_bitmaps` for any coarser exact count without
    rescanning raw data. NULL values are ignored (as COUNT DISTINCT
    does).
    """
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *group_cols, F.bitmap_bucket_number(value_col).alias("bucket")
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(value_col)
            ).alias("bitmap")
        )
    )


def rollup_bitmaps(
    bitmaps: DataFrame,
    group_cols: list[str],
    bucket_col: str = "bucket",
    bitmap_col: str = "bitmap",
) -> DataFrame:
    """Merge stored bitmap partials to a coarser grouping and emit the
    EXACT distinct count: OR the bitmaps within each (group, bucket),
    popcount, then sum the buckets. Two tiny aggregates over KB-scale
    state; bit-exact equal to ``COUNT(DISTINCT ...)`` over the raw
    data (property-tested)."""
    merged = bitmaps.groupBy(*group_cols, bucket_col).agg(
        F.bitmap_or_agg(bitmap_col).alias("_bm")
    )
    return (
        merged.select(
            *group_cols, F.bitmap_count("_bm").alias("_c")
        )
        .groupBy(*group_cols)
        .agg(F.sum("_c").alias("n_distinct"))
    )


def hll_register_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """PORTABLE HyperLogLog register state as a relational table:
    ``(group_cols..., bucket, register)`` with ``bucket ∈ [0, 2^p)``
    and ``register = leading-zero rank of the hashed value's suffix``
    (Flajolet et al. 2007, the public HLL construction).

    Unlike :func:`distinct_sketches` (Spark's DataSketches binary,
    opaque to any other engine), every register here is a pure
    function of the repo's engine-portable 60-bit hash — bucket is the
    hash's low ``p`` bits, the rank is ``(60−p) − bit_length(suffix)
    + 1`` (suffix = hash >> p; all-zero suffix → max rank) — so an
    independent SQL engine recomputes the ENTIRE sketch state
    bit-for-bit (``length(bin(x))`` is the shared bit_length idiom).

    Scale shape: one map-side projection + one groupBy-max per group —
    the register table is ≤ 2^p rows per group (KBs) at ANY input
    size, and registers merge under per-bucket MAX, so per-partition
    (per-day, per-source) register tables stored once answer any
    coarser distinct-count rollup without rescanning raw data —
    the same store-once pattern as :func:`distinct_bitmaps`, at
    fixed-size state instead of exact-but-growing bitmaps. Duplicate
    values need no pre-distinct: they hash to the same (bucket, rank)
    and MAX absorbs them."""
    from sensomics_data_pipeline_spark.functions.scalars import (
        portable_hash64,
    )

    m = 1 << p
    width = 60 - p
    h = portable_hash64(F.col(value_col).cast("string"))
    suffix = F.shiftright(h, p)
    rank = (
        F.when(suffix == 0, F.lit(width + 1))
        .otherwise(F.lit(width) - F.length(F.bin(suffix)) + 1)
        .cast("int")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            (h % m).cast("int").alias("bucket"),
            rank.alias("_rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rank").alias("register"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Fold a :func:`hll_register_table` into the raw HLL estimate per
    group: ``E = α_m · m² / (Σ_b 2^(−register_b))`` with absent buckets
    contributing ``2^0 = 1``. Returns ``(group_cols...,
    hll_estimate, n_zero_registers)``.

    The arithmetic is engine-reproducible by construction: every
    ``2^(−register)`` term is an exact dyadic double and α_m is a
    rational constant, so the oracle states the identical value —
    which is why the LINEAR-COUNTING small-range correction
    (``m·ln(m/V)``) is deliberately NOT applied: libm logs are the one
    non-portable step (the ``distribution_drift`` precedent), so the
    raw estimate ships with ``n_zero_registers`` alongside, letting
    callers apply any correction downstream."""
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213)
    return regs.groupBy(*group_cols).agg(
        F.round(
            F.lit(alpha * m * m)
            / (
                F.lit(float(m))
                - F.count("*")
                + F.sum(F.pow(F.lit(2.0), -F.col("register")))
            ),
            6,
        ).alias("hll_estimate"),
        (F.lit(m) - F.count("*")).cast("long").alias("n_zero_registers"),
    )


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column:
    ``(bucket, bucket_lo, bucket_hi, n, bucket_min, bucket_max)``.

    Bounds default to the column's min/max, computed in the same plan
    (tiny 1-row aggregate cross-joined back — the A1 two-pass scalar
    pattern, no driver round-trip). Bucket assignment is
    ``least(floor((v - lo) / width), n_buckets - 1)`` — floor on an
    identically-derived double is tie-free across engines, unlike
    fractional round(). NULLs are dropped; the top edge folds into the
    last bucket. One aggregate + one broadcast-of-one-row join + one
    groupBy: two shuffles total, independent of data size."""
    v = F.col(value_col)
    data = df.filter(v.isNotNull())
    if lo is None or hi is None:
        bounds = data.agg(
            F.min(v).cast("double").alias("_lo"),
            F.max(v).cast("double").alias("_hi"),
        )
        data = data.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("_lo"), F.col("_hi")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(n_buckets))
    bucket = F.when(hi_c == lo_c, F.lit(0)).otherwise(
        F.least(
            F.floor((v.cast("double") - lo_c) / width),
            F.lit(n_buckets - 1),
        )
    ).cast("int")
    return (
        data.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.min(lo_c + F.col("bucket") * width).alias("bucket_lo"),
            F.min(lo_c + (F.col("bucket") + 1) * width).alias("bucket_hi"),
            F.count("*").alias("n"),
            F.min(v.cast("double")).alias("bucket_min"),
            F.max(v.cast("double")).alias("bucket_max"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    capacity: int | None = None,
) -> DataFrame:
    """Deterministic-error heavy hitters via a MERGEABLE Misra-Gries
    sketch: the top-``k`` frequent values with per-item count
    estimates and a hard undercount bound, computed WITHOUT the full
    ``groupBy(value).count()`` shuffle.

    The 100-TB point: an exact frequency table over a high-cardinality
    column (tokens, URLs, user agents) shuffles one row per DISTINCT
    value — at corpus scale that is billions of rows moved to find the
    top handful. Misra-Gries keeps a bounded ``capacity``-entry
    summary per partition (one streaming pass, Arrow-batched), ships
    ``partitions × capacity`` tiny rows to the driver, and merges them
    with the Agarwal et al. (PODS 2012, "Mergeable Summaries")
    truncation — total data moved is KBs regardless of input size.

    Guarantees (deterministic, worst-case — not probabilistic):

    - ``est_count`` NEVER overcounts: ``est ≤ true``;
    - undercount is bounded: ``true − est ≤ max_undercount`` (the
      summed decrement mass of the per-partition passes + merge
      truncations, reported per run), and ``max_undercount ≤
      n / (capacity+1)`` by the MG bound;
    - COMPLETE for heavy items: any value whose true count exceeds
      ``est_count(k-th row) + max_undercount`` is guaranteed to be in
      the reported top-``k`` — a value missing from the summary has
      true count ≤ the decrement mass, and one ranked below the k-th
      row has true count ≤ its own est + mass ≤ the k-th est + mass.

    The reported estimates depend on partition boundaries (like any
    mergeable-summary reduction), so this is a rows-only driver
    contract; the guarantees above are certified by the full-hash
    ``hh_invariants`` twin (violations vs the exact counts pinned at
    zero on both engines).

    ``capacity`` defaults to ``8·k`` — comfortably above k so the
    final truncation is dominated by genuinely light items.

    Returns ``k`` rows: ``(value, est_count, max_undercount, n_total)``
    ordered by (est_count desc, value asc).
    """
    import pandas as pd

    cap = int(capacity or 8 * k)

    def partial(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counts: dict = {}
        decr = 0
        n = 0
        for pdf in batches:
            vc = pdf.iloc[:, 0].dropna().value_counts()  # C-speed
            n += int(vc.sum())
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > cap:
                # mergeable-summaries truncation (Agarwal et al.):
                # subtract the (cap+1)-th largest count from all,
                # drop the non-positive — the subtraction joins the
                # undercount mass, same bound as per-item MG
                cut = sorted(counts.values(), reverse=True)[cap]
                decr += cut
                counts = {v: c - cut for v, c in counts.items() if c > cut}
        if counts:
            yield pd.DataFrame(
                {
                    "value": list(counts.keys()),
                    "est": list(counts.values()),
                    "pid": pid,
                    "decr": decr,
                    "n": n,
                }
            )
        else:
            yield pd.DataFrame(
                {"value": [None], "est": [0], "pid": pid, "decr": decr,
                 "n": n}
            )

    vt = df.schema[value_col].dataType.simpleString()
    partials = (
        df.select(value_col)
        .mapInPandas(partial, f"value {vt}, est long, pid int, decr long, n long")
        .toPandas()
    )
    # driver merge (bounded: partitions x capacity rows, KBs at any
    # scale): counts for one value ADD across summaries, each
    # partition's decrement mass and row count enter ONCE, then one
    # final truncation back to `cap` (subtracting the (cap+1)-th
    # largest count preserves the MG undercount invariant per the
    # mergeable-summaries construction)
    merged: dict = {}
    for value, est in zip(partials["value"], partials["est"]):
        if value is None or est == 0:
            continue
        merged[value] = merged.get(value, 0) + int(est)
    per_pid = partials.drop_duplicates("pid")
    total_decr = int(per_pid["decr"].sum())
    total_n = int(per_pid["n"].sum())
    if len(merged) > cap:
        cut = sorted(merged.values(), reverse=True)[cap]
        total_decr += cut
        merged = {v: c - cut for v, c in merged.items() if c > cut}
    top = sorted(merged.items(), key=lambda t: (-t[1], t[0]))[:k]
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (v, int(c), total_decr, total_n)
            for v, c in top
        ],
        f"value {vt}, est_count long, max_undercount long, n_total long",
    )
    return out


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
    buffer_size: int = 4096,
    driver_cap: int = 1 << 18,
) -> DataFrame:
    """Deterministic-error quantiles via a MERGEABLE one-pass sketch:
    each partition sorts its (non-null) values once and keeps
    ``buffer_size`` evenly-spaced weighted samples; the driver merges
    the bounded summaries and reads the quantiles off the weighted
    CDF. No global sort, no shuffle — the only data moved is
    ``partitions x buffer_size`` (value, weight) pairs, KBs-per-task
    at any input scale.

    The 100-TB point: exact quantiles need a full sort (range
    shuffle of every row) or repeated scans; Spark's built-in
    ``approx_percentile`` is the same family of mergeable summary.
    This operator exists so the engine can certify a DETERMINISTIC
    worst-case rank bound (probabilistic sketches can't be pinned at
    zero violations by an oracle) and expose the summary for reuse.

    Guarantee (worst-case, not probabilistic): per partition the
    B-point uniform compression of a sorted run distorts any value's
    rank by at most ``n_p/(2B)`` (the weighted CDF is a B-step
    staircase within half a step of the true one); errors ADD across
    the merge, so the returned estimate ``est(q)`` always satisfies

        [count(x < est), count(x <= est)]  intersects
        [q*n - max_rank_err, q*n + max_rank_err]

    with ``max_rank_err = sum_p(n_p/B + 1)`` (double the proven
    half-step bound, absorbing empty-partition edges). Partitions
    holding <= B values are kept EXACT (error 0 for that partition).

    Estimates depend on partition boundaries (like every mergeable
    summary), so the sketch itself is a rows-only driver contract;
    the bound above is what the full-hash ``qsketch_invariants`` twin
    certifies (violations vs exact ranks pinned at zero on both
    engines).

    At extreme partition counts the driver-side union (P x B rows)
    is itself compressed back to ``driver_cap`` samples (adds one
    more ``W/driver_cap`` term to the error mass); a multi-level
    ``treeAggregate``-style merge is the same construction one level
    deeper and is not needed below ~10k partitions.

    Returns one row per requested quantile:
    ``(q, est, max_rank_err, n_total)`` ordered by q.
    """
    import numpy as np
    import pandas as pd

    B = int(buffer_size)

    def partial(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = []
        for pdf in batches:
            v = pdf.iloc[:, 0].to_numpy(dtype="float64", na_value=np.nan)
            v = v[~np.isnan(v)]
            if v.size:
                chunks.append(v)
        if not chunks:
            yield pd.DataFrame(
                {"value": [0.0], "weight": [0.0], "pid": pid, "err": [0.0],
                 "n": [0]}
            )
            return
        vals = np.sort(np.concatenate(chunks))
        n_p = vals.size
        if n_p <= B:
            samples, weights, err = vals, np.ones(n_p), 0.0
        else:
            w = n_p / B
            idx = np.minimum(
                ((np.arange(B) + 0.5) * w).astype("int64"), n_p - 1
            )
            samples, weights, err = vals[idx], np.full(B, w), n_p / B + 1.0
        yield pd.DataFrame(
            {"value": samples, "weight": weights, "pid": pid, "err": err,
             "n": n_p}
        )

    partials = (
        df.select(F.col(value_col).cast("double"))
        .mapInPandas(
            partial, "value double, weight double, pid int, err double, n long"
        )
        .toPandas()
    )
    per_pid = partials.drop_duplicates("pid")
    total_err = float(per_pid["err"].sum())
    n_total = int(per_pid["n"].sum())
    spark = df.sparkSession
    out_schema = "q double, est double, max_rank_err long, n_total long"
    if n_total == 0:
        return spark.createDataFrame([], out_schema)
    live = partials[partials["weight"] > 0]
    order = np.argsort(live["value"].to_numpy(), kind="stable")
    vals = live["value"].to_numpy()[order]
    wts = live["weight"].to_numpy()[order]
    if vals.size > driver_cap:
        W = wts.sum()
        cum = np.cumsum(wts)
        targets = (np.arange(driver_cap) + 0.5) * (W / driver_cap)
        idx = np.minimum(np.searchsorted(cum, targets), vals.size - 1)
        vals = vals[idx]
        wts = np.full(driver_cap, W / driver_cap)
        total_err += W / driver_cap + 1.0
    cum = np.cumsum(wts)
    bound = int(np.ceil(total_err)) + 1
    rows = []
    for q in quantiles:
        i = int(np.searchsorted(cum, q * n_total))
        i = min(i, vals.size - 1)
        rows.append((float(q), float(vals[i]), bound, n_total))
    return spark.createDataFrame(rows, out_schema)


def count_min_build(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
):
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) over
    ``value_col`` and return ``(matrix, n_total)`` — a ``depth×width``
    int64 numpy matrix plus the non-null row count.

    The 100-TB point: CMS is a LINEAR sketch — the sketch of a union
    is the elementwise SUM of the sketches — so per-partition
    matrices reduce with a cell-wise Spark ``groupBy(cell).sum``, the
    result is BIT-IDENTICAL regardless of partitioning (unlike
    Misra-Gries, whose estimates depend on partition boundaries), and
    the driver receives exactly ``depth × width + 1`` rows no matter
    the input size or partition count (the shuffle itself moves only
    ``partitions × depth × width`` int64 cells — KBs per task).
    Point queries then answer "how many
    times did X occur" within ``+(n/width)``-expected error without
    the one-row-per-distinct-value shuffle an exact count needs.

    Hashing: values are hashed JVM-side with ``xxhash64`` (one
    deterministic 64-bit base hash per row, no Python string
    hashing), then the ``depth`` row indices derive by double
    hashing ``(h1 + r·h2) mod width`` with ``h1 = h mod width`` and
    ``h2 = (h >> 32) | 1`` (odd, so the probe sequence cycles the
    full power-of-two table). NULLs are dropped before hashing.

    Deterministic guarantees (what ``cms_invariants`` pins at zero):
    estimates NEVER undercount (every true occurrence increments
    every probed cell); every row of the matrix sums to exactly
    ``n_total`` (mass conservation); rebuilding under any other
    partitioning yields the identical matrix (linearity).
    """
    import numpy as np
    import pandas as pd

    w, d = int(width), int(depth)

    def partial(batches):
        m = np.zeros((d, w), dtype=np.int64)
        n = 0
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            if not h.size:
                continue
            n += h.size
            h1 = h % np.uint64(w)
            h2 = (h >> np.uint64(32)) | np.uint64(1)
            for r in range(d):
                idx = (h1 + np.uint64(r) * h2) % np.uint64(w)
                m[r] += np.bincount(idx.astype(np.int64), minlength=w)
        # cell -1 carries the partition's row count so ONE reduce
        # covers both the matrix and n_total
        yield pd.DataFrame(
            {
                "cell": np.concatenate(
                    [np.asarray([-1], dtype=np.int64),
                     np.arange(d * w, dtype=np.int64)]
                ),
                "cnt": np.concatenate(
                    [np.asarray([n], dtype=np.int64), m.ravel()]
                ),
            }
        )

    # reduce the per-partition matrices IN SPARK (CMS is linear, so a
    # cell-wise SUM of partials IS the global sketch, bit-identical to
    # a single pass) — the driver receives exactly d·w+1 rows no
    # matter the partition count; collecting raw partials instead
    # would pull partitions × d·w cells (≈10 GB at 100k partitions
    # and the default table size) through the driver
    reduced = (
        df.select(F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .select(F.xxhash64(F.col("v")).alias("h"))
        .mapInPandas(partial, "cell long, cnt long")
        .groupBy("cell")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
    )
    mat = np.zeros(d * w, dtype=np.int64)
    body = reduced[reduced["cell"] >= 0]
    mat[body["cell"].to_numpy()] = body["cnt"].to_numpy()
    n_row = reduced.loc[reduced["cell"] < 0, "cnt"]
    n_total = int(n_row.iloc[0]) if len(n_row) else 0
    return mat.reshape(d, w), n_total


def count_min_estimate(
    df: DataFrame,
    value_col: str,
    matrix,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Point-query a count-min sketch for every row of ``df``: returns
    ``(*keep_cols, value, est)`` where ``est = min over rows r of
    matrix[r, (h1 + r·h2) mod width]`` — the classic CMS estimate,
    ``true ≤ est ≤ true + collision mass``.

    The matrix (``depth×width`` int64 — KBs) ships in the task
    closure; estimation is one Arrow-batched numpy pass with the same
    JVM-side ``xxhash64`` base hash the builder used, so build and
    probe can never disagree on hashing. No shuffle, no join.
    """
    import numpy as np
    import pandas as pd

    mat = np.ascontiguousarray(matrix, dtype=np.int64)
    d, w = mat.shape
    vt = df.schema[value_col].dataType.simpleString()
    keep_types = {c: df.schema[c].dataType.simpleString() for c in keep_cols}

    def probe(batches):
        for pdf in batches:
            h = pdf["_h"].to_numpy(dtype=np.int64).view(np.uint64)
            if not h.size:
                continue
            h1 = h % np.uint64(w)
            h2 = (h >> np.uint64(32)) | np.uint64(1)
            est = np.full(h.size, np.iinfo(np.int64).max, dtype=np.int64)
            for r in range(d):
                idx = ((h1 + np.uint64(r) * h2) % np.uint64(w)).astype(
                    np.int64
                )
                np.minimum(est, mat[r, idx], out=est)
            out = {c: pdf[c] for c in keep_cols}
            out["value"] = pdf["value"]
            out["est"] = est
            yield pd.DataFrame(out)

    keep_schema = "".join(f"{c} {t}, " for c, t in keep_types.items())
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *keep_cols,
            F.col(value_col).alias("value"),
            F.xxhash64(F.col(value_col)).alias("_h"),
        )
        .mapInPandas(probe, f"{keep_schema}value {vt}, est long")
    )


#: theta/KMV sentinel: one past the largest possible 60-bit portable
#: hash — a sketch holding FEWER than k hashes has seen its whole
#: domain, so its threshold is the full hash range (exact mode).
_THETA_FULL = 1 << 60


def theta_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV/theta distinct-count sketch per group (Bar-Yossef et al.
    2002; the Apache DataSketches theta family): the ``k`` SMALLEST
    engine-portable 60-bit hash values of the group's distinct items.
    Unlike HLL registers, theta sketches support set INTERSECTION and
    difference — "users who did A and B" — which no union-only sketch
    can answer.

    State: ``group_cols..., hashes (sorted array<bigint>), n_kept,
    theta`` where theta = the k-th smallest hash (or 2^60 when the
    group has fewer than k distinct values — exact mode). Fully
    deterministic (md5-based hash, exact top-k with no RNG), so an
    independent engine rebuilds the state bit-for-bit.

    Plan: hash projection → (group, hash) distinct (one shuffle,
    dedup absorbs duplicates) → per-group k-smallest via a
    row_number window on the same key → sorted-array pack. State per
    group is k longs at ANY input size; sketches for fine partitions
    (per-day, per-source) union to any coarser rollup without
    rescanning raw data."""
    from pyspark.sql import Window

    from sensomics_data_pipeline_spark.functions.scalars import (
        portable_hash64,
    )

    h = portable_hash64(F.col(value_col).cast("string"))
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    top = distinct.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    packed = top.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("hashes"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )
    theta = F.when(
        F.col("n_kept") < k, F.lit(_THETA_FULL).cast("bigint")
    ).otherwise(F.element_at("hashes", k))
    return packed.withColumn("theta", theta)


def theta_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a theta sketch row: exact
    ``n_kept`` below capacity, else the KMV estimator
    ``(k-1) * 2^60 / theta`` (rounded 6). Adds ``estimate``.

    theta is clamped to ≥1: a theta of 0 (the k-th smallest 60-bit
    hash being 0 — the md5 15-hex prefix of some value being all
    zeros, probability k/2^60 per group) would otherwise divide to
    NULL/Infinity instead of a number."""
    est = F.when(
        F.col("theta") == _THETA_FULL, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(_THETA_FULL))
            / F.greatest(F.col("theta"), F.lit(1).cast("bigint")),
            6,
        )
    )
    return sketch.withColumn("estimate", est)


def theta_union(
    sk_a: DataFrame,
    sk_b: DataFrame,
    on: list[str],
    k: int = 64,
) -> DataFrame:
    """Union of two theta sketch tables on ``on`` (inner-matched
    groups): merged distinct hashes re-trimmed to the k smallest —
    exactly the sketch the union stream would have produced, so
    unions are lossless w.r.t. sketch semantics and associative."""
    a = sk_a.select(*on, F.col("hashes").alias("_ha"))
    b = sk_b.select(*on, F.col("hashes").alias("_hb"))
    merged = a.join(b, on=on, how="inner").select(
        *on,
        F.array_sort(
            F.array_distinct(F.concat(F.col("_ha"), F.col("_hb")))
        ).alias("_m"),
    )
    packed = merged.select(
        *on,
        F.slice("_m", 1, k).alias("hashes"),
        F.least(F.size("_m"), F.lit(k)).cast("int").alias("n_kept"),
    )
    theta = F.when(
        F.col("n_kept") < k, F.lit(_THETA_FULL).cast("bigint")
    ).otherwise(F.element_at("hashes", k))
    return packed.withColumn("theta", theta)


def theta_intersect_estimate(
    sk_a: DataFrame,
    sk_b: DataFrame,
    on: list[str],
    k: int = 64,
) -> DataFrame:
    """Intersection cardinality estimate (the theta-family capability
    HLL lacks): with threshold ``θ = min(θ_a, θ_b)``, the hashes below
    θ present in BOTH sketches form a uniform sample of the
    intersection at sampling rate θ/2^60, so
    ``estimate = |sample| * 2^60 / θ`` (exact when both sketches are
    below capacity). Output: ``on..., n_sample, estimate``."""
    a = sk_a.select(
        *on, F.col("hashes").alias("_ha"), F.col("theta").alias("_ta")
    )
    b = sk_b.select(
        *on, F.col("hashes").alias("_hb"), F.col("theta").alias("_tb")
    )
    j = a.join(b, on=on, how="inner").withColumn(
        "_theta", F.least("_ta", "_tb")
    )
    sample = F.size(
        F.filter(
            F.array_intersect("_ha", "_hb"),
            lambda x: x < F.col("_theta"),
        )
    )
    # same theta≥1 clamp as theta_estimate: a 0 threshold (all-zero
    # 15-hex md5 prefix reaching the k-th slot) must not divide to
    # NULL/Infinity
    est = F.when(
        F.col("_theta") == _THETA_FULL, F.col("_n").cast("double")
    ).otherwise(
        F.round(
            F.col("_n") * F.lit(float(_THETA_FULL))
            / F.greatest(F.col("_theta"), F.lit(1).cast("bigint")),
            6,
        )
    )
    return (
        j.withColumn("_n", sample)
        .withColumn("estimate", est)
        .select(*on, F.col("_n").alias("n_sample"), "estimate")
    )
