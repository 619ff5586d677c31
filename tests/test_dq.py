"""Data-quality gate laws (operators/dq.py): every check type counted
against hand-built fixtures, null conventions pinned, the fused
row-level pass verified single-scan, and the gate's raise/pass
behavior tested.
"""

from __future__ import annotations

import pytest

from sensomics_data_pipeline_spark.operators import dq


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, 200.0, "A"),     # range violation
            (3, None, "B"),      # accepted_values violation; null range SKIPPED
            (None, 30.0, "A"),   # not_null violation; fk orphan (null key)
            (5, 40.0, None),     # null accepted SKIPPED
            (5, 50.0, "A"),      # duplicate key with previous row
            (99, 60.0, "A"),     # fk orphan (key not in ref)
        ],
        "k int, v double, flag string",
    )


def _ref(spark):
    return spark.createDataFrame(
        [(1,), (2,), (3,), (5,)], "rk int"
    )


def _report(spark):
    out = dq.dq_report(
        _df(spark),
        [
            {"type": "not_null", "column": "k"},
            {"type": "range", "column": "v", "lo": 0.0, "hi": 100.0},
            {"type": "accepted_values", "column": "flag", "values": ["A"]},
            {"type": "unique", "columns": ["k"]},
            {"type": "fk", "column": "k", "ref": _ref(spark),
             "ref_column": "rk"},
        ],
    )
    return {
        (r["check"], r["target"]): (r["n_checked"], r["n_violations"])
        for r in out.collect()
    }


def test_dq_all_check_types_counted(spark):
    got = _report(spark)
    assert got[("not_null", "k")] == (7, 1)
    assert got[("range[0.0,100.0]", "v")] == (7, 1)  # null v skipped
    assert got[("accepted_values", "flag")] == (7, 1)  # null flag skipped
    # distinct keys: 1,2,3,None,5,99 -> 6; dup group k=5 has 2 rows
    assert got[("unique", "k")] == (6, 2)
    # orphans: the null key + 99
    assert got[("fk", "k->rk")] == (7, 2)


def test_dq_row_level_checks_fuse_into_one_scan(spark):
    out = dq.dq_report(
        _df(spark),
        [
            {"type": "not_null", "column": "k"},
            {"type": "range", "column": "v", "lo": 0.0, "hi": 100.0},
            {"type": "accepted_values", "column": "flag", "values": ["A"]},
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one LocalRelation/scan reference, not three unioned scans
    assert plan.count("LocalRelation") <= 1


def test_dq_gate_raises_with_named_checks(spark):
    with pytest.raises(ValueError, match="not_null"):
        dq.dq_gate(_df(spark), [{"type": "not_null", "column": "k"}])


def test_dq_gate_passes_clean_table(spark):
    df = _df(spark).filter("k IS NOT NULL")
    got = dq.dq_gate(df, [{"type": "not_null", "column": "k"}])
    assert got.count() == 6


def test_dq_empty_table_zero_violations(spark):
    # F.sum over zero rows is NULL; an empty upstream table must read
    # as (0 checked, 0 violations) — and the gate must PASS, not crash
    # comparing None > 0
    empty = _df(spark).filter("1 = 0")
    out = dq.dq_report(
        empty,
        [
            {"type": "not_null", "column": "k"},
            {"type": "range", "column": "v", "lo": 0.0, "hi": 100.0},
            {"type": "unique", "columns": ["k"]},
        ],
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_checked"] == 0
        assert r["n_violations"] == 0
    gated = dq.dq_gate(empty, [{"type": "not_null", "column": "k"}])
    assert gated.count() == 0


def test_dq_unknown_check_rejected(spark):
    with pytest.raises(ValueError):
        dq.dq_report(_df(spark), [{"type": "regexp", "column": "k"}])


def test_cli_dq(spark, sf_dir, capsys):
    from sensomics_data_pipeline_spark.cli import main

    rc = main(
        [
            "dq",
            f"{sf_dir}/lineitem.parquet",
            "--not-null", "l_orderkey",
            "--range", "l_quantity:1:49",
            "--unique", "l_orderkey+l_linenumber",
            "--fk", f"l_orderkey:{sf_dir}/orders.parquet:o_orderkey",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0  # no --gate: report-only always exits 0
    assert "ok not_null(l_orderkey)" in out
    assert "FAIL range[1.0,49.0](l_quantity)" in out  # 50s exist


def test_cli_dq_gate_exits_nonzero(spark, sf_dir):
    from sensomics_data_pipeline_spark.cli import main

    rc = main(
        [
            "dq",
            f"{sf_dir}/lineitem.parquet",
            "--range", "l_quantity:1:49",
            "--gate",
        ]
    )
    assert rc == 1
