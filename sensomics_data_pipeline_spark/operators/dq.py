"""Data-quality gate (dbt-tests / Great-Expectations staple): declared
checks over a table — not-null, value range, accepted values, key
uniqueness, referential integrity — reported as one violations table a
pipeline can gate on before writing downstream.

Scale design: every ROW-LEVEL check (not_null / range /
accepted_values) fuses into ONE aggregate pass over the table — one
scan, one partial-agg reduce, no matter how many checks — then
``stack``s to long form. Structural checks are their own minimal
plans: ``unique`` is a group-count (shuffles once on the key),
``fk`` is a LEFT ANTI join against the (usually broadcastable)
distinct reference keys. Results are a handful of rows at any input
size; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_COLS = ["check", "target", "n_checked", "n_violations"]


def dq_report(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run ``checks`` against ``df`` → DataFrame(check, target,
    n_checked, n_violations), one row per check, ordered by (check,
    target) for determinism.

    Check specs (dicts):
      {"type": "not_null", "column": c}
      {"type": "range", "column": c, "lo": x, "hi": y}   # inclusive
      {"type": "accepted_values", "column": c, "values": [...]}
      {"type": "unique", "columns": [c, ...]}
      {"type": "fk", "column": c, "ref": DataFrame, "ref_column": r}

    NULL semantics follow the dbt convention: range / accepted_values
    SKIP nulls (pair with not_null to forbid them); fk counts null
    keys as violations only if they fail the anti-join (they do —
    null never equi-joins), matching 'orphan row' semantics.
    """
    row_level = []
    structural = []
    for spec in checks:
        (row_level if spec["type"] in
         ("not_null", "range", "accepted_values") else structural
         ).append(spec)

    parts: list[DataFrame] = []
    if row_level:
        aggs = [F.count(F.lit(1)).alias("_n")]
        labels: list[tuple[str, str, str]] = []
        for i, spec in enumerate(row_level):
            c = spec["column"]
            if spec["type"] == "not_null":
                bad = F.col(c).isNull()
                label = ("not_null", c)
            elif spec["type"] == "range":
                bad = F.col(c).isNotNull() & (
                    (F.col(c) < F.lit(spec["lo"]))
                    | (F.col(c) > F.lit(spec["hi"]))
                )
                label = (f"range[{spec['lo']},{spec['hi']}]", c)
            else:
                bad = F.col(c).isNotNull() & (
                    ~F.col(c).isin(spec["values"])
                )
                label = ("accepted_values", c)
            # coalesce: F.sum over ZERO rows is NULL, and an empty
            # upstream table must read as 0 violations, not crash the
            # gate's `> 0` comparison
            aggs.append(
                F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias(f"_v{i}")
            )
            labels.append((f"_v{i}", *label))
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{chk}', '{col}', {v}" for v, chk, col in labels
        )
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(labels)}, {stack_args}) "
                    "AS (check, target, n_violations)"
                ),
                F.col("_n").alias("n_checked"),
            ).select(*_OUT_COLS)
        )

    for spec in structural:
        if spec["type"] == "unique":
            cols = spec["columns"]
            grouped = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
            parts.append(
                grouped.agg(
                    F.count(F.lit(1)).alias("n_checked"),
                    F.coalesce(
                        F.sum(
                            F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)
                        ),
                        F.lit(0),
                    ).cast("long").alias("n_violations"),
                ).select(
                    F.lit("unique").alias("check"),
                    F.lit(",".join(cols)).alias("target"),
                    "n_checked",
                    "n_violations",
                )
            )
        elif spec["type"] == "fk":
            c, ref, rc = spec["column"], spec["ref"], spec["ref_column"]
            ref_keys = ref.select(F.col(rc).alias(c)).distinct()
            orphans = df.join(F.broadcast(ref_keys), on=c, how="left_anti")
            parts.append(
                df.agg(F.count(F.lit(1)).alias("n_checked")).crossJoin(
                    orphans.agg(
                        F.count(F.lit(1)).alias("n_violations")
                    )
                ).select(
                    F.lit("fk").alias("check"),
                    F.lit(f"{c}->{rc}").alias("target"),
                    "n_checked",
                    "n_violations",
                )
            )
        else:
            raise ValueError(f"unknown check type {spec['type']!r}")

    if not parts:
        raise ValueError("no checks given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check", "target")


def dq_gate(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Gate form: return ``df`` unchanged if every check passes, raise
    with the violation report otherwise (the write-blocking pattern —
    call before the downstream sink). The report is a handful of rows,
    so the collect is bounded by the check count."""
    report = dq_report(df, checks).collect()
    bad = [r for r in report if r["n_violations"] > 0]
    if bad:
        lines = ", ".join(
            f"{r['check']}({r['target']})={r['n_violations']}" for r in bad
        )
        raise ValueError(f"dq_gate failed: {lines}")
    return df
