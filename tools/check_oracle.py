#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry against its ``oracle_sql()`` DuckDB
equivalent and compare row-count + schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _dtype_kind(s):
    """Canonical schema kind, mirroring the driver's strictness:
    tz-aware vs naive timestamps are DIFFERENT kinds (the driver rejects
    that as schema_match=false); integer width and datetime resolution
    are not significant."""
    import pandas as pd

    if isinstance(s.dtype, pd.DatetimeTZDtype):
        return "timestamp_tz"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def normalize(pdf):
    """Sort columns by name and rows by all columns. Unlike round-1's
    version this does NOT strip timezones and does NOT round floats —
    the driver hashes exact values, so the local gate must too."""
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s) and not isinstance(
            s.dtype, pd.DatetimeTZDtype
        ):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            pdf[c] = s.astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    import numpy as np
    import pandas as pd

    # Strict schema gate (the driver's schema_match): tz-aware vs naive
    # or numeric-kind mismatches are failures, not warnings.
    for c in sc:
        ka, kb = _dtype_kind(spark_pdf[c]), _dtype_kind(duck_pdf[c])
        if ka != kb:
            problems.append(
                f"SCHEMA col {c}: spark={spark_pdf[c].dtype} ({ka}) "
                f"duck={duck_pdf[c].dtype} ({kb})"
            )
    if problems:
        return problems

    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    for c in s.columns:
        a, b = s[c], d[c]
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            # TRUE bitwise float equality — matches the driver's
            # byte-level value hashing. `av == bv` is NOT enough:
            # IEEE -0.0 == 0.0 is True but the bytes differ, and that
            # exact gap let stats_suite pass locally while the driver
            # hash failed (rounds 1-2 meta-bug). Canonicalize NaNs to a
            # single payload, then compare raw bit patterns.
            av, bv = a.to_numpy(dtype="float64"), b.to_numpy(dtype="float64")
            av, bv = av.copy(), bv.copy()
            av[np.isnan(av)] = np.nan
            bv[np.isnan(bv)] = np.nan
            eq = av.view(np.int64) == bv.view(np.int64)
        else:
            eq = (a.astype(str) == b.astype(str)).to_numpy()
        if not eq.all():
            i = int(np.argmin(eq))
            problems.append(
                f"col {c}: {int((~eq).sum())} mismatches; first at row {i}: "
                f"spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
            )
    return problems


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import duckdb

    import __spark_entry__ as entrymod
    from sensomics_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY"
            print(f"{status} {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
