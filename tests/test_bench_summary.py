"""Unit tests for bench.py's self-adjudicating summary line — the
canonical-baseline selection rules (r12 advisor findings): runB/probe
sidecars never become the movers baseline, and a glob-matching
filename without digits degrades to movers=[] instead of crashing a
finished bench run. Pure Python, no Spark session."""

import glob as glob_mod
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _line(monkeypatch, names):
    monkeypatch.setattr(
        glob_mod, "glob", lambda pat: [f"/nonexistent/docs/{n}" for n in names]
    )
    return bench._summary_line({"q1": 1.0}, 1.0, {"cal_first": 0.1}, 0.1)


def test_summary_canonical_skips_runB_and_suffixed_files(monkeypatch):
    out = _line(
        monkeypatch,
        [
            "BENCH_LOCAL_r12_runB.json",
            "BENCH_LOCAL_r12.json",
            "BENCH_LOCAL_r9.json",
            "BENCH_LOCAL_r13_probe.json",
        ],
    )
    # r12.json selected (numeric sort beats r9; suffixed files are
    # sidecars, never baselines); the file doesn't exist here so the
    # summary degrades to unreadable + movers=[] without raising
    assert out["vs"] == "unreadable:BENCH_LOCAL_r12.json"
    assert out["movers"] == []


def test_summary_digitless_filename_does_not_crash(monkeypatch):
    out = _line(monkeypatch, ["BENCH_LOCAL_rerun.json"])
    assert out["vs"] is None
    assert out["movers"] == []


def test_summary_no_canonical_files(monkeypatch):
    out = _line(monkeypatch, [])
    assert out["vs"] is None and out["movers"] == []
    assert out["n"] == 1 and out["n_failed"] == 0


def test_summary_counts_failures_in_n_but_not_total():
    out = bench._summary_line(
        {"ok": 2.0, "bad": -1.0}, 2.0, {"cal_first": 0.1}, 0.1
    )
    # documented contract: n counts RUN queries incl. failures; total
    # sums only successes
    assert out["n"] == 2 and out["n_failed"] == 1 and out["total"] == 2.0
