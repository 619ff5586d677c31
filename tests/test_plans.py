"""Physical-plan audits: assert that the optimizations we rely on at
scale actually appear in the plans (pushdown, broadcast joins, window
partitioning) — regressions here silently cost 100× at 100 TB."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

import __spark_entry__ as entrymod


def plan_of(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    p = plan_of(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # column pruning: only the 7 needed columns reach the scan
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_dim_joins_broadcast(spark, sf_dir):
    for q in ("join_revenue_by_nation", "threshold_rules", "interval_semijoin"):
        p = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in p, q
        assert "BroadcastNestedLoopJoin" not in p, q
        assert "CartesianProduct" not in p, q


def test_windows_are_partitioned(spark, sf_dir):
    """No query's window runs unpartitioned (single-partition sort of
    the whole table)."""
    for q in ("lag_dedup", "sessionization", "flatline_runs", "counter_reset_delta"):
        p = plan_of(spark, sf_dir, q)
        # a Window with an empty partition spec renders as
        # "Window [...], [ts ASC ...]" with no partition list; ours
        # must carry user_id in the partition spec
        for line in p.splitlines():
            if "Arguments" in line and "windowspecdefinition" in line:
                assert "user_id" in line, (q, line)


def test_events_scan_prunes_columns(spark, sf_dir):
    p = plan_of(spark, sf_dir, "sessionization")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # value/props are not needed by sessionization; they must be pruned
    assert "props" not in cols and "value" not in cols


def test_no_rdd_fallbacks(spark, sf_dir):
    """Every declared query stays in the DataFrame planner: the only
    Python boundaries allowed are Arrow-batched (MapInPandas /
    FlatMapGroupsInPandas); no row-at-a-time BatchEvalPython."""
    for name in entrymod.queries():
        if name.startswith("streaming"):
            continue  # streaming queries execute eagerly in run_bounded
        p = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in p, name


def test_no_unmatched_persist_in_package():
    """Every ``.persist(`` in the engine source must live in a file that
    also releases it with ``.unpersist(`` (a lazy operator can't offer a
    release point, so operators must not pin cache entries at all — at
    100 TB an unbounded pinned cache entry is a memory-pressure bug).
    Docstring/comment mentions don't count."""
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "sensomics_data_pipeline_spark"
    offenders = []
    for f in pkg.rglob("*.py"):
        code_lines = [
            ln
            for ln in f.read_text().splitlines()
            if not ln.lstrip().startswith(("#", '"', "'"))
        ]
        has_persist = any(
            ".persist(" in ln and ".unpersist(" not in ln for ln in code_lines
        )
        has_unpersist = any(".unpersist(" in ln for ln in code_lines)
        if has_persist and not has_unpersist:
            offenders.append(str(f))
    assert not offenders, f"persist without unpersist in: {offenders}"


#: Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
#: a ONE-ROW scalar side (thresholds / histogram bounds from an
#: upstream global aggregate) cross-joined onto the fact table — O(n)
#: work, broadcast of a single row, the standard Spark shape for
#: "attach computed scalars".
SCALAR_BROADCAST_OK = {
    "tumbling_categorize",
    "quantiles",
    "merge_windows",
    "histogram",
    # the fk check's 1-row total-count aggregate crossed onto the
    # 1-row orphan-count aggregate (attach-computed-scalars shape)
    "dq_report",
    # 1-row global scale m = min(count/weight) crossed onto the
    # |weights|-row quota table — both sides tiny by construction
    "domain_mix",
    # 1-row doc-level aggregate joined with the 1-row pack-level
    # violation counters (conservation-law signature queries)
    "pack_invariants",
    "corpus_invariants",
    # 1-row violation-counter aggregates per ANN variant joined on a
    # literal key — same attach-computed-scalars shape
    "ann_invariants",
    # 1-row structural counters ⋈ 1-row dim agg ⋈ 1-row optimality
    # counter, all on a literal key — same shape as ann_invariants
    "pq_invariants",
    # 1-row rank aggregate ⋈ 1-row seed-floor counter on a literal
    # key (plus the broadcast seed semi-join, bounded by the seed set)
    "ppr_invariants",
    # k-row sketch broadcast onto exact counts + 1-row scalar
    # (kth-est, undercount mass) attachments — all bounded by k
    "hh_invariants",
    # the optimality law's n_lists-row centroid broadcast (auto-sized
    # ⌈√n⌉, clamped ≤ 4096 — KBs at any corpus scale) attached to
    # every vector: the n×n_lists expansion IS the law's definition,
    # same bounded-small-side class as hh_invariants
    "ivf_invariants",
    # 1-row corpus stats (N, avgdl) attached to the filtered posting
    # rows — the standard attach-computed-scalars shape
    "bm25_topk",
    # 1-row corpus totals (N_uni, N_bi) attached to the bigram rows —
    # same attach-computed-scalars shape
    "pmi_collocations",
    # 1-row sketch states joined for the union/intersect set ops —
    # every BNLJ side here is a single 64-long sketch row
    "theta_sketch_ops",
}


def test_no_cartesian_products(spark, sf_dir):
    """No declared query may plan a cartesian or unbounded nested-loop
    join — the quadratic shapes that silently stop scaling. (The exact
    near-dup ground-truth variant is chunk-replicated by construction
    and carries its O(n²) cost in its name/docstring; 1-row scalar
    broadcasts are whitelisted explicitly above.)"""
    for name in entrymod.queries():
        if name.startswith("streaming") or name == "embedding_near_dup_exact":
            continue
        p = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        if name not in SCALAR_BROADCAST_OK:
            assert "BroadcastNestedLoopJoin" not in p, name


def test_text_family_plan_shapes(spark, sf_dir):
    """Pin the documented plan-shape guarantees of the text/training
    operators: the per-row families must not shuffle (the only allowed
    Exchange is fan_out's small-scale RoundRobin), the contamination
    probe must broadcast, and vocab top-k must plan a TakeOrdered, not
    a global sort."""
    for q in ("repetition_signals", "chunk_documents"):
        p = plan_of(spark, sf_dir, q)
        assert "hashpartitioning" not in p, (q, "unexpected shuffle")
        assert "rangepartitioning" not in p, (q, "unexpected sort shuffle")
    p = plan_of(spark, sf_dir, "decontaminate")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    p = plan_of(spark, sf_dir, "vocab_topk")
    assert "TakeOrderedAndProject" in p


def test_session_scale_confs(spark):
    """The scale-critical session settings are part of the engine's
    contract (AQE re-planning, skew-join splitting, Arrow transfers,
    UTC timestamps for oracle parity) — regressions here change every
    plan silently."""
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"


def test_ewma_blocked_plan_keeps_its_fences(spark):
    """Structural pins for the two Catalyst quadratic traps the blocked
    EWMA dodges (CATALYST_NOTES 12/13): the executed plan must carry
    BOTH posexplode Generate fences (without them, projection collapse
    inlines the carry fold into the per-element lambda — measured
    O(n²)), and must not slice the series array (Catalyst Slice copies
    the whole parent array per call — also measured O(n²))."""
    from sensomics_data_pipeline_spark.operators.analytics import (
        ewma_smooth_blocked,
    )

    df = spark.createDataFrame(
        [("u", i, i, float(i)) for i in range(10)],
        "u string, t int, eid int, v double",
    )
    out = ewma_smooth_blocked(
        df, ["u"], ts_col="t", value_col="v", tiebreak_cols=["eid"],
        block_size=3, round_decimals=None,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") >= 2, "generator fences removed"
    assert "slice(" not in plan, "F.slice reintroduced in blocking"
