#!/usr/bin/env python3
"""Series-length slope measurement for the EWMA plans (r11 verdict ask
#3, extended to the distributed plan for the r12 verdict ask #2): the
exact fold (`analytics.ewma_smooth`) does O(n²) element copies per
entity (`concat(acc, array(y))` inside `F.aggregate`), the blocked
plan (`analytics.ewma_smooth_blocked`) O(n·B) with the whole entity in
ONE collect_list row, the distributed plan
(`analytics.ewma_smooth_distributed`) O(n·B) with NO whole-series row
anywhere (window-spill + per-segment folds + carry join — two extra
shuffles). This rehearsal holds entity COUNT fixed (4 entities, the
folds parallelize across them) and scales POINTS-PER-ENTITY — the axis
the exact fold's quadratic term lives on — then prints the per-step
time ratios so the slope is read directly: quadratic ⇒ time ratio ≈
(n ratio)², linear ⇒ ≈ n ratio.

A second MANY-ENTITIES cell (``--cell E N``) measures blocked vs
distributed at E entities × N points each — the regime where the
distributed plan's extra shuffles amortize across a wide key space.

Usage: python tools/scale_ewma.py [max_exact_n] [max_blocked_n]
           [max_dist_n] [--cell E N]
Writes a markdown table to stdout; the round doc wraps it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

N_ENTITIES = 4
EXACT_NS = [2_500, 10_000, 40_000, 160_000]
LADDER_NS = [2_500, 10_000, 40_000, 160_000, 640_000, 2_560_000,
             10_240_000]
TIME_CAP_S = 600.0  # skip the next size once a plan exceeds this


def series(spark, n_per_entity: int, n_entities: int = N_ENTITIES):
    """Deterministic synthetic series: entities × n points, value a
    cheap aperiodic function of the index (no RNG, engine-independent)."""
    return spark.range(n_entities * n_per_entity).select(
        (F.col("id") % n_entities).alias("u"),
        (F.col("id") / n_entities).cast("long").alias("t"),
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
        ewma_smooth_distributed,
    )
    from sensomics_data_pipeline_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--cell"]
    cell = None
    if "--cell" in sys.argv:
        i = sys.argv.index("--cell")
        cell = (int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        args = [a for a in sys.argv[1:i] if a != "--cell"]
    max_exact = int(args[0]) if len(args) > 0 else EXACT_NS[-1]
    max_blocked = int(args[1]) if len(args) > 1 else 2_560_000
    max_dist = int(args[2]) if len(args) > 2 else LADDER_NS[-1]
    spark = get_spark("scale-ewma")

    def exact(df):
        return ewma_smooth(df, ["u"], ts_col="t", value_col="v",
                           round_decimals=None)

    def blocked(df):
        return ewma_smooth_blocked(df, ["u"], ts_col="t", value_col="v",
                                   block_size=256, round_decimals=None)

    dist_b = int(os.environ.get("SCALE_EWMA_DIST_B", "256"))

    def dist(df):
        return ewma_smooth_distributed(df, ["u"], ts_col="t",
                                       value_col="v", block_size=dist_b,
                                       round_decimals=None)

    # JIT warm all kernels once, unmeasured
    warm = series(spark, 2_000)
    for fn in (exact, blocked, dist):
        fn(warm).write.format("noop").mode("overwrite").save()

    rows = []
    dead = {"exact": False, "blocked": False, "dist": False}
    for n in LADDER_NS:
        if n > max(max_blocked, max_dist):
            break
        df = series(spark, n)
        te = tb = td = None
        if n <= max_exact and n in EXACT_NS and not dead["exact"]:
            te = run(exact, df)
            dead["exact"] = te > TIME_CAP_S
        if n <= max_blocked and not dead["blocked"]:
            tb = run(blocked, df)
            dead["blocked"] = tb > TIME_CAP_S
        if n <= max_dist and not dead["dist"]:
            td = run(dist, df)
            dead["dist"] = td > TIME_CAP_S
        rows.append((n, te, tb, td))
        print(f"# n/entity={n}: exact={te} blocked={tb} dist={td}",
              file=sys.stderr)

    print("| points per entity | exact fold (s) | blocked B=256 (s) |"
          f" distributed B={dist_b} (s) |")
    print("|---|---|---|---|")
    fmt = lambda x: "—" if x is None else f"{x:.2f}"
    for n, te, tb, td in rows:
        print(f"| {n:,} | {fmt(te)} | {fmt(tb)} | {fmt(td)} |")
    print()
    print("step ratios (4× points per step → quadratic ≈16×, linear ≈4×):")
    for (n0, te0, tb0, td0), (n1, te1, tb1, td1) in zip(rows, rows[1:]):
        if n1 // n0 != 4:
            continue
        r = lambda a, b: f"{b/a:.1f}×" if a and b else "—"
        print(f"  {n0:,} → {n1:,}: exact {r(te0, te1)},"
              f" blocked {r(tb0, tb1)}, dist {r(td0, td1)}")
    if cell:
        e, n = cell
        df = series(spark, n, e)
        tb = run(blocked, df)
        td = run(dist, df)
        print()
        print(f"many-entities cell ({e} entities × {n:,} points = "
              f"{e*n:,} rows): blocked {tb:.2f}s, distributed {td:.2f}s")


if __name__ == "__main__":
    main()
