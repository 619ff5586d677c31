"""End-to-end CLI test: the four reference stages chained through real
files, as a reference user would run them."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark import cli


@pytest.fixture()
def raw_json_dir(tmp_path):
    """FIXTURES.md F1-shaped upload files, named with the lineage
    timestamp pattern."""
    d = tmp_path / "raw"
    d.mkdir()
    base = pd.Timestamp("2024-03-01 00:00:00")
    base_ms = int(base.timestamp() * 1000)

    def rec(offset_ms, kind, data):
        return {"time": base_ms + offset_ms, "kind": kind, "data": data}

    records = []
    # sleep counter reports + hr + steps through the night/morning
    for h in range(1, 7):
        records.append(rec(h * 3_600_000, "activity", [0.0, 10.0, 20.0, 30.0, 5.0]))
        records.append(rec(h * 3_600_000 + 1000, "hr", [55.0 + h]))
    records.append(rec(7 * 3_600_000, "bp", [120.0, 80.0]))
    records.append(rec(7 * 3_600_000 + 500, "multi measure", [70.0, 97.0, [118.0, 79.0], 36.6]))
    # accelerometer triples at 0.5s cadence, 5-sample bursts
    for i in range(30):
        t = 8 * 3_600_000 + i * 500
        for axis in ("acx", "acy", "acz"):
            records.append(rec(t, axis, [0.1 * (i % 3)] * 5))
    records.append(rec(8 * 3_600_000, "ppg", [1.0, 2.0, 3.0]))
    (d / "upload 2024-03-01 09-00-00.json").write_text(json.dumps(records))
    return str(d)


def test_cli_full_chain(spark, raw_json_dir, tmp_path):
    out1 = str(tmp_path / "stage2")
    assert cli.main(["reformat", "-d", raw_json_dir, "-o", out1]) == 0
    meas = spark.read.parquet(f"{out1}/measurements")
    kinds = {r["kind"] for r in meas.select("kind").distinct().collect()}
    assert {"hr", "bp_sys", "bp_dia", "step", "mm_hr"} <= kinds
    # lineage column extracted from the file name
    assert meas.filter(meas.jname == "2024-03-01 09-00-00").count() == meas.count()

    out2 = str(tmp_path / "stage4")
    assert cli.main(["filter", "-i", f"{out1}/measurements", "-o", out2]) == 0
    filtered = spark.read.parquet(out2)
    assert filtered.count() > 0

    out3 = str(tmp_path / "stage3")
    assert cli.main(["acc", "-i", f"{out1}/ac", "-o", out3]) == 0
    acc = spark.read.parquet(out3)
    assert {"acx", "acy", "acz", "g_force", "bin", "seconds"} <= set(acc.columns)
    # 30 aligned burst rows × 5 sub-samples at 10 Hz
    assert acc.count() == 150

    # idempotency: reformat skips when outputs exist
    assert cli.main(["reformat", "-d", raw_json_dir, "-o", out1, "--skip-existing"]) == 0


def test_cli_dq_gate_blocks_corrupt_write(spark, raw_json_dir, tmp_path):
    import pathlib

    out1 = str(tmp_path / "stage2")
    assert cli.main(["reformat", "-d", raw_json_dir, "-o", out1]) == 0

    # clean input + satisfiable checks -> write proceeds
    out_ok = str(tmp_path / "gated_ok")
    assert cli.main([
        "filter", "-i", f"{out1}/measurements", "-o", out_ok,
        "--dq-gate", "not_null:kind",
        "--dq-gate", "range:data:-1000000:1000000",
    ]) == 0
    assert spark.read.parquet(out_ok).count() > 0

    # corrupted fixture (every hr value far beyond physiology) -> the
    # declared range check refuses the write and NOTHING is created
    corrupt = str(tmp_path / "corrupt_meas")
    spark.read.parquet(f"{out1}/measurements").withColumn(
        "data", F.col("data") + F.lit(10_000_000.0)
    ).write.parquet(corrupt)
    out_bad = str(tmp_path / "gated_bad")
    assert cli.main([
        "filter", "-i", corrupt, "-o", out_bad,
        "--dq-gate", "range:data:-1000000:1000000",
    ]) == 1
    assert not pathlib.Path(out_bad).exists()


def test_cli_reformat_with_skew(spark, raw_json_dir, tmp_path):
    out = str(tmp_path / "skewed")
    assert cli.main(["reformat", "-d", raw_json_dir, "-o", out, "-t", "900000"]) == 0
    from sensomics_data_pipeline_spark.sources.writers import read_scalar_sidecar

    assert read_scalar_sidecar(spark, f"{out}/timestamp_diff") == 900000.0
    meas = spark.read.parquet(f"{out}/measurements")
    # all timestamps shifted forward by 15 minutes
    first = meas.agg({"date_time": "min"}).first()[0]
    assert first.minute == 15


def test_cli_corpus(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    out = str(tmp_path / "corpus_out")
    rows = [
        (i, "s0" if i % 2 else "s1", f"doc {i} " + "text body words here " * (3 + i % 5))
        for i in range(12)
    ]
    rows.append((99, "s0", "spam " * 50))  # repetitious -> dropped
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(docs_path)

    assert cli.main(
        ["corpus", "-i", docs_path, "-o", out, "--dedup", "exact",
         "--keep-frac", "0.9", "--budget", "256"]
    ) == 0
    got = spark.read.parquet(out)
    assert {"doc_id", "pack_id", "pack_fill", "n_tokens", "quality_score"} <= set(
        got.columns
    )
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert 99 not in ids and ids <= {r[0] for r in rows}


def test_cli_spans(spark, tmp_path):
    docs_path = str(tmp_path / "docs_spans")
    out = str(tmp_path / "spans_out")
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, "s0", f"one two three {shared} four five six"),
        (2, "s0", f"seven eight {shared} nine ten eleven"),
        (3, "s0", "totally unrelated words repeating nothing at all"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(docs_path)
    assert cli.main(
        ["spans", "-i", docs_path, "-o", out,
         "--span-tokens", "5", "--min-frac", "0.01"]
    ) == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {
        "doc_id", "n_spans", "dup_spans", "dup_span_frac"
    }
    ids = {r["doc_id"] for r in got.collect()}
    assert ids == {1, 2}  # doc 3 filtered by --min-frac


def test_cli_corpus_dedup_max_bucket(spark, tmp_path):
    """--dedup-max-bucket reaches the minhash skew guard; rejecting it
    for dedup methods without a bucket cap."""
    docs_path = str(tmp_path / "docs_mb")
    out = str(tmp_path / "corpus_mb_out")
    # texts must clear the repetition gate (>=10 distinct words, no
    # dominant bigram) so the drop below is attributable to DEDUP
    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, "s0", boiler) for i in range(30)] + [
        (
            100 + i,
            "s1",
            f"unique document number {i} with varied prose about "
            f"weather sailing mountains rivers forests meadow",
        )
        for i in range(6)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(docs_path)
    assert cli.main(
        ["corpus", "-i", docs_path, "-o", out, "--dedup", "minhash",
         "--keep-frac", "1.0", "--budget", "256",
         "--dedup-max-bucket", "4"]
    ) == 0
    got = spark.read.parquet(out)
    # the 30-identical class collapses to one canonical doc even though
    # its bucket overflows the cap (hub pairs keep it connected)
    assert got.filter(F.col("doc_id") < 100).count() == 1
    with pytest.raises(SystemExit, match="max-bucket"):
        cli.main(
            ["corpus", "-i", docs_path, "-o", out, "--dedup", "jaccard",
             "--dedup-max-bucket", "4"]
        )


def test_cli_corpus_with_paragraph_and_mix(spark, tmp_path):
    docs_path = str(tmp_path / "docs_pm")
    out = str(tmp_path / "corpus_pm_out")
    boiler = "subscribe to the newsletter now"
    rows = [
        (
            i,
            f"s{i % 2}",
            f"doc {i} " + "text body words here " * (3 + i % 5) + boiler,
        )
        for i in range(12)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(docs_path)

    assert cli.main(
        ["corpus", "-i", docs_path, "-o", out, "--dedup", "exact",
         "--keep-frac", "1.0", "--budget", "256",
         "--paragraph-min-docs", "2", "--mix", "s0=1,s1=1"]
    ) == 0
    got = spark.read.parquet(out).toPandas()
    assert not got.text.str.contains("subscribe").any()
    assert set(got.source) <= {"s0", "s1"}


def test_cli_analytics_and_diff_and_resolve(spark, tmp_path):
    import datetime as dt

    from sensomics_data_pipeline_spark import cli

    ev_path = str(tmp_path / "events")
    B = dt.datetime(2024, 1, 1)
    rows = [
        (i, B + dt.timedelta(hours=i), 100 + i % 3, t, float(i))
        for i, t in enumerate(["view", "click", "purchase", "view", "click"] * 6)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(ev_path)

    for op, cols in (
        ("funnel", {"stage", "n_users", "conversion"}),
        ("retention", {"cohort_start", "period_offset", "n_active"}),
        ("trend", {"user_id", "slope_per_hour"}),
        ("cusum", {"user_id", "cusum_max", "change_ts"}),
    ):
        out = str(tmp_path / f"out_{op}")
        assert cli.main(["analytics", op, "-i", ev_path, "-o", out]) == 0
        got = spark.read.parquet(out)
        assert cols <= set(got.columns)
        assert got.count() > 0

    # diff: candidate = baseline with one value changed, one row dropped
    b_path = str(tmp_path / "events_b")
    ev = spark.read.parquet(ev_path)
    from pyspark.sql import functions as F

    ev.filter(F.col("event_id") != 3).withColumn(
        "value",
        F.when(F.col("event_id") == 5, F.lit(999.0)).otherwise(F.col("value")),
    ).write.parquet(b_path)
    out = str(tmp_path / "out_diff")
    assert cli.main(
        ["diff", "-i", ev_path, "-b", b_path, "-o", out, "--key", "event_id"]
    ) == 0
    got = {r.event_id: r.change_type for r in spark.read.parquet(out).collect()}
    assert got == {3: "removed", 5: "changed"}

    # resolve: canonicalize a fuzzy column
    n_path = str(tmp_path / "names")
    spark.createDataFrame(
        [("kitten",), ("sitten",), ("other-name",)], "p_name string"
    ).write.parquet(n_path)
    out = str(tmp_path / "out_resolve")
    assert cli.main(
        ["resolve", "-i", n_path, "-o", out, "-c", "p_name"]
    ) == 0
    got = {r.name: r.canonical_name for r in spark.read.parquet(out).collect()}
    assert got["sitten"] == "kitten" and got["other-name"] == "other-name"


def test_cli_profile(spark, tmp_path):
    from sensomics_data_pipeline_spark import cli

    d_path = str(tmp_path / "vals")
    spark.createDataFrame(
        [(i, float(i % 100), "hot" if i % 3 else "cold")
         for i in range(1, 501)],
        "id long, v double, tag string",
    ).write.mode("overwrite").parquet(d_path)

    out = str(tmp_path / "out_table")
    assert cli.main(["profile", "table", "-i", d_path, "-o", out, "--exact"]) == 0
    got = spark.read.parquet(out)
    assert {"column", "n", "n_null", "approx_distinct"} <= set(got.columns)
    assert got.count() == 3

    out = str(tmp_path / "out_hh")
    assert cli.main(["profile", "hh", "-i", d_path, "-o", out, "-c", "tag",
                     "-k", "2"]) == 0
    got = {r.value: r.est_count for r in spark.read.parquet(out).collect()}
    assert set(got) == {"hot", "cold"}
    assert got["hot"] >= got["cold"]

    out = str(tmp_path / "out_q")
    assert cli.main(["profile", "quantiles", "-i", d_path, "-o", out,
                     "-c", "v"]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 7
    assert all(r.n_total == 500 for r in got.collect())

    out = str(tmp_path / "out_hist")
    assert cli.main(["profile", "histogram", "-i", d_path, "-o", out,
                     "-c", "v", "-k", "10"]) == 0
    assert spark.read.parquet(out).count() == 10

    out = str(tmp_path / "out_cms")
    assert cli.main(["profile", "cms", "-i", d_path, "-o", out,
                     "-c", "tag", "--buffer-size", "64"]) == 0
    got = {r.value: r.est for r in spark.read.parquet(out).collect()}
    assert set(got) == {"hot", "cold"}
    # CMS never undercounts; 2 values in a 64-wide table don't collide
    assert got["hot"] == 334 and got["cold"] == 166


def test_cli_cluster_and_pagerank(spark, tmp_path):
    import numpy as np

    from sensomics_data_pipeline_spark import cli

    # cluster: two tight blobs, interleaved ids so the deterministic
    # lowest-key seeding picks one seed per blob
    rng = np.random.RandomState(3)
    a = [0.0, 0.0] + 0.05 * rng.randn(20, 2)
    b = [5.0, 5.0] + 0.05 * rng.randn(20, 2)
    rows = []
    for i in range(20):
        rows.append((2 * i, [float(x) for x in a[i]]))
        rows.append((2 * i + 1, [float(x) for x in b[i]]))
    vecs = str(tmp_path / "vecs")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(vecs)
    out = str(tmp_path / "clusters")
    assert cli.main(["cluster", "-i", vecs, "-o", out, "-k", "2"]) == 0
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 40
    even = set(got[got.vec_id % 2 == 0]["cluster"])
    odd = set(got[got.vec_id % 2 == 1]["cluster"])
    assert len(even) == 1 and len(odd) == 1 and even != odd

    # pagerank: star graph — the hub outranks every leaf
    edges = str(tmp_path / "edges")
    spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    ).write.mode("overwrite").parquet(edges)
    out = str(tmp_path / "ranks")
    assert cli.main(["pagerank", "-i", edges, "-o", out,
                     "--n-iter", "6"]) == 0
    ranks = {r.node: r.rank for r in spark.read.parquet(out).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert all(ranks[0] > ranks[i] for i in range(1, 6))

    # lpa: star graph is a clique-free tree; self-vote converges to
    # the hub's community = min id 0 everywhere
    out_lpa = str(tmp_path / "lpa")
    assert cli.main(["lpa", "-i", edges, "-o", out_lpa]) == 0
    got_lpa = {r.node: r.label for r in spark.read.parquet(out_lpa).collect()}
    assert got_lpa == {i: 0 for i in range(6)}

    # pagerank --tol: a huge threshold stops after one iteration
    out_tol = str(tmp_path / "ranks_tol")
    assert cli.main(["pagerank", "-i", edges, "-o", out_tol,
                     "--n-iter", "6", "--tol", "10.0"]) == 0
    assert abs(sum(
        r.rank for r in spark.read.parquet(out_tol).collect()
    ) - 1.0) < 1e-9


def test_cli_validation_errors(tmp_path):
    """Ops that need a value column fail at argparse with a clear
    message, not a schema-lookup traceback; cluster rejects a
    zero-iteration fit."""
    import pytest

    from sensomics_data_pipeline_spark import cli

    for op in ("hh", "quantiles", "histogram", "cms"):
        with pytest.raises(SystemExit):
            cli.main(["profile", op, "-i", "x", "-o", "y"])
    with pytest.raises(SystemExit):
        cli.main(["cluster", "-i", "x", "-o", "y", "--n-iter", "0"])


def test_parse_fk_spec_scheme_aware(spark, tmp_path):
    """fk:COL:ref_path:ref_col must survive a ':' inside the path
    (s3://, hdfs://, file: …): the column splits off from the LEFT and
    only the ref column from the RIGHT — everything between is the
    path verbatim."""
    ref = tmp_path / "dim.parquet"
    spark.createDataFrame([(1,), (2,)], "c_custkey int").write.parquet(str(ref))
    spec = f"fk:cust_id:file:{ref}:c_custkey"
    check = cli._parse_check_spec(spec, spark)
    assert check["type"] == "fk"
    assert check["column"] == "cust_id"
    assert check["ref_column"] == "c_custkey"
    assert sorted(r["c_custkey"] for r in check["ref"].collect()) == [1, 2]
    with pytest.raises(ValueError, match="malformed fk spec"):
        cli._parse_check_spec("fk:only_col", spark)
