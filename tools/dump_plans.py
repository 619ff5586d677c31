#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for declared queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> [query ...]

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (round dir
defaults to r14) for each named query (default: all of
``__spark_entry__.queries()``). Building a query's DataFrame can
itself run Spark jobs (streaming run_bounded, BPE training, k-means
fits) — that is the declared surface, so those queries' "plan" files
capture the FINAL returned DataFrame's plan plus a header noting the
eager construction. Failures are recorded, not fatal; unknown query
names are reported and skipped up front (they cannot be dumped).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")

    import __spark_entry__ as entrymod
    from sensomics_data_pipeline_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    if names:
        unknown = sorted(set(names) - qs.keys())
        if unknown:
            print(f"skipping unknown queries: {unknown}", file=sys.stderr)
        qs = {k: qs[k] for k in names if k in qs}
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(outdir, exist_ok=True)
    for name, fn in qs.items():
        t0 = time.time()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            # public API: explain() prints to stdout — capture it
            # (df._jdf/PythonSQLUtils are classic-session-only internals)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            hdr = (
                f"# query: {name}  sf_dir: {sf_dir}\n"
                f"# construction wall: {time.time() - t0:.2f}s "
                f"(includes any eager jobs the query runs while building)\n"
            )
            with open(path, "w") as fh:
                fh.write(hdr + plan)
            print(f"{name}: ok ({time.time() - t0:.1f}s)", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            with open(path, "w") as fh:
                fh.write(f"# query: {name} FAILED during plan dump\n# {exc}\n")
            print(f"{name}: FAIL {exc}", file=sys.stderr)
        finally:
            try:
                spark.catalog.clearCache()
            except Exception:
                pass


if __name__ == "__main__":
    main()
