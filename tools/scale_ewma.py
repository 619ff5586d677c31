#!/usr/bin/env python3
"""Series-length slope measurement for the two EWMA plans (r11 verdict
ask #3): the exact fold (`analytics.ewma_smooth`) does O(n²) element
copies per entity (`concat(acc, array(y))` inside `F.aggregate`), the
blocked plan (`analytics.ewma_smooth_blocked`) O(n·B). This rehearsal
holds entity COUNT fixed (4 entities, the fold parallelizes across
them) and scales POINTS-PER-ENTITY — the axis the exact fold's
quadratic term lives on — then prints the per-step time ratios so the
slope is read directly: quadratic ⇒ time ratio ≈ (n ratio)², linear ⇒
≈ n ratio.

Usage: python tools/scale_ewma.py [max_exact_n] [max_blocked_n]
Writes a markdown table to stdout; the round doc wraps it.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

N_ENTITIES = 4
EXACT_NS = [2_500, 10_000, 40_000, 160_000]
BLOCKED_NS = [2_500, 10_000, 40_000, 160_000, 640_000, 2_560_000]
TIME_CAP_S = 600.0  # skip the next size once a plan exceeds this


def series(spark, n_per_entity: int):
    """Deterministic synthetic series: 4 entities × n points, value a
    cheap aperiodic function of the index (no RNG, engine-independent)."""
    return spark.range(N_ENTITIES * n_per_entity).select(
        (F.col("id") % N_ENTITIES).alias("u"),
        (F.col("id") / N_ENTITIES).cast("long").alias("t"),
        ((F.col("id") * 2654435761) % 10_000 / 100.0).alias("v"),
    )


def run(fn, df) -> float:
    t0 = time.time()
    fn(df).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    from sensomics_data_pipeline_spark.operators.analytics import (
        ewma_smooth,
        ewma_smooth_blocked,
    )
    from sensomics_data_pipeline_spark.session import get_spark

    max_exact = int(sys.argv[1]) if len(sys.argv) > 1 else EXACT_NS[-1]
    max_blocked = int(sys.argv[2]) if len(sys.argv) > 2 else BLOCKED_NS[-1]
    spark = get_spark("scale-ewma")

    def exact(df):
        return ewma_smooth(df, ["u"], ts_col="t", value_col="v",
                           round_decimals=None)

    def blocked(df):
        return ewma_smooth_blocked(df, ["u"], ts_col="t", value_col="v",
                                   block_size=256, round_decimals=None)

    # JIT warm both kernels once, unmeasured
    warm = series(spark, 2_000)
    exact(warm).write.format("noop").mode("overwrite").save()
    blocked(warm).write.format("noop").mode("overwrite").save()

    rows = []
    exact_dead = False
    blocked_dead = False
    for n in BLOCKED_NS:
        if n > max_blocked:
            break
        df = series(spark, n)
        te = None
        if n <= max_exact and n in EXACT_NS and not exact_dead:
            te = run(exact, df)
            if te > TIME_CAP_S:
                exact_dead = True
        tb = None
        if not blocked_dead:
            tb = run(blocked, df)
            if tb > TIME_CAP_S:
                blocked_dead = True
        rows.append((n, te, tb))
        print(f"# n/entity={n}: exact={te} blocked={tb}", file=sys.stderr)

    print("| points per entity | exact fold (s) | blocked B=256 (s) |")
    print("|---|---|---|")
    prev = None
    for n, te, tb in rows:
        fmt = lambda x: "—" if x is None else f"{x:.2f}"
        print(f"| {n:,} | {fmt(te)} | {fmt(tb)} |")
    print()
    print("step ratios (4× points per step → quadratic ≈16×, linear ≈4×):")
    for (n0, te0, tb0), (n1, te1, tb1) in zip(rows, rows[1:]):
        if n1 // n0 != 4:
            continue
        re_ = f"{te1/te0:.1f}×" if te0 and te1 else "—"
        rb = f"{tb1/tb0:.1f}×" if tb0 and tb1 else "—"
        print(f"  {n0:,} → {n1:,}: exact {re_}, blocked {rb}")


if __name__ == "__main__":
    main()
