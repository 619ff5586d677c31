"""Shuffle-economy utilities (100-TB design, SURVEY.md §4.2): hot-key
salting and semi-join shuffle reduction.

AQE's skew-join handles join-side skew at runtime; these helpers cover
the cases AQE doesn't: aggregation skew (one device/user producing a
large fraction of rows), deliberate two-stage combines, explicit
join salting when broadcast is ineligible, and Bloom-style fact
prefiltering ahead of a big-big join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a random salt: stage 1 aggregates on
    (group_cols, salt) — splitting a hot key across ``n_salts``
    reducers — stage 2 combines the partials on group_cols alone.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}; all four have exact distributive combines.
    (avg = sum/count composed by the caller; distinct-aggs need a
    different plan.) Spark's hash aggregate already does map-side
    partial combine, so this matters when the *post-combine* per-key
    load is still skewed — thousands of map partitions all funnelling
    one key to one reducer.
    """
    combine_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[
            stage1_fn[fn](src).alias(f"_p_{out}")
            for out, (src, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            combine_fn[fn](f"_p_{out}").alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )


def _salted_struct(key_col: str, salt: Column) -> Column:
    # the salted join key is a STRUCT (key, salt), not a string concat:
    # no separator exists for a hostile key value to collide with
    # ("a" + sep + "1" vs a literal key "a<sep>1"), and the original
    # key type survives (no lossy string cast in the join condition).
    # A NULL key must produce a NULL struct, not struct(NULL, s):
    # Spark's struct equality compares fields null-safely, so
    # struct(NULL, -1) == struct(NULL, -1) is TRUE and a plain
    # equi-join's NULL-never-matches semantics would be violated.
    return F.when(F.col(key_col).isNull(), F.lit(None)).otherwise(
        F.struct(F.col(key_col).alias("k"), salt.cast("int").alias("s"))
    )


def with_salted_key(
    df: DataFrame, key_col: str, hot_keys: list, n_salts: int = 8,
    salted_col: str = "_salted_key",
) -> DataFrame:
    """Explicit join-salting: hot keys get ``(key, salt)`` struct
    variants with salt in [0, n_salts); cold keys carry ``(key, -1)``
    (the dimension side must be exploded with ``explode_salts`` to
    match). For when AQE skew-join can't help (e.g. broadcast
    ineligible)."""
    is_hot = F.col(key_col).isin(hot_keys)
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    return df.withColumn(
        salted_col,
        _salted_struct(key_col, F.when(is_hot, salt).otherwise(F.lit(-1))),
    )


def explode_salts(
    dim: DataFrame, key_col: str, hot_keys: list, n_salts: int = 8,
    salted_col: str = "_salted_key",
) -> DataFrame:
    """Dimension-side counterpart of ``with_salted_key``: replicate hot
    rows once per salt so the salted equi-join finds every variant."""
    is_hot = F.col(key_col).isin(hot_keys)
    salts = F.when(
        is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(-1)))
    exploded = dim.withColumn("_s", F.explode(salts))
    return exploded.withColumn(
        salted_col, _salted_struct(key_col, F.col("_s"))
    ).drop("_s")


def top_hot_keys(df: DataFrame, key_col: str, n: int = 8) -> list:
    """Find the ``n`` heaviest keys — the inputs ``with_salted_key``
    needs. One distributed count + a bounded n-row collect (the same
    bounded-scalar pattern as the threshold derivations); at 100 TB
    this is a partial-agg count whose result is n values on the
    driver. Ties break on the key itself so the list is deterministic.
    """
    rows = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), F.col(key_col))
        .limit(int(n))
        .collect()
    )
    return [r[key_col] for r in rows]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    hot_keys: list,
    n_salts: int = 8,
    how: str = "inner",
    force_shuffle: bool = True,
) -> DataFrame:
    """Composed hot-key-salted equi-join: rows of ``fact`` whose key is
    in ``hot_keys`` scatter across ``n_salts`` shuffle partitions while
    ``dim`` replicates ONLY its hot rows ``n_salts`` times (cold rows
    ship once — replication cost is |hot ∩ dim| × n_salts, not
    |dim| × n_salts). The join result is bit-identical to the plain
    equi-join for every ``hot_keys`` / ``n_salts`` choice — salting
    only re-routes rows — which is the law the driver oracle pins.

    ``force_shuffle`` pins a SHUFFLE_HASH hint on the dim side so the
    certified plan is the plan salting exists for (a too-big-to-
    broadcast dim); without it Catalyst would broadcast any small test
    dim and the salt would route nothing. At 100 TB the hint is also
    the right default: the exploded dim is smaller than the fact but
    above the broadcast threshold.

    Output: fact columns + dim columns minus the (duplicate) key.
    ``how`` supports inner / left outer semantics of the plain join.
    """
    f = with_salted_key(fact, key_col, hot_keys, n_salts)
    d = explode_salts(dim, key_col, hot_keys, n_salts).drop(key_col)
    if force_shuffle:
        d = d.hint("shuffle_hash")
    return f.join(d, on="_salted_key", how=how).drop("_salted_key")


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    n_buckets: int = 1 << 20,
    how: str = "inner",
) -> DataFrame:
    """Big-big join with a Bloom-style semi-join reduction: before the
    fact table shuffles for the real equi-join, it is prefiltered by a
    broadcast table of the dim side's OCCUPIED HASH BUCKETS —
    ``distinct(pmod(xxhash64(key), n_buckets))``, at most ``n_buckets``
    rows no matter how large the dim is (a k=1 Bloom filter expressed
    relationally; false-positive rate ≈ the bucket load factor).

    Why: when the dim is join-selective (most fact keys have no
    match), the dominant cost of the shuffle join is shipping fact
    rows that will be dropped anyway. The bucket table removes them
    BEFORE the exchange for the price of one broadcast ≤ n_buckets
    longs; bucket collisions only let extra rows through to the exact
    join, never change its result — the law the driver oracle pins.
    (Spark's own runtime row-level filtering does this adaptively
    when enabled; this operator is the explicit, engine-portable
    form.) The dim is scanned twice (bucket build + join) — the right
    trade whenever fact ≫ dim, the usual reason the join shuffles.

    Keys are canonicalized to string before hashing so fact/dim key
    type mismatches (int vs bigint) cannot silently hash differently.
    ``how`` must be inner/left_semi — semantics that only ever DROP
    unmatched fact rows (outer joins would need the filtered rows
    back).
    """
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi, got {how!r}"
        )
    bucket = lambda c: F.pmod(  # noqa: E731
        F.xxhash64(F.col(c).cast("string")), F.lit(n_buckets)
    )
    buckets = dim.select(bucket(key_col).alias("_bkt")).distinct()
    pre = fact.join(
        F.broadcast(buckets),
        bucket(key_col) == F.col("_bkt"),
        "left_semi",
    )
    return pre.join(dim, on=key_col, how=how)
