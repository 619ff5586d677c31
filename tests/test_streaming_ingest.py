"""Streaming twins of the batch regen-proof sweeps: each degenerate
documents corpus that the batch oracle tests salt in
(``test_oracle_queries.py``) is ALSO driven through the real
``readStream`` ingest flow, and the stream's survivor set must equal a
batch replica of the same stages computed with the engine's own batch
operators — so a driver testdata revision that adds empty / NULL /
whitespace / unicode / repeated-token documents cannot make the
streaming path diverge from the batch path."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

#: the 48 salted permutations of the SHARED degenerate-row table
#: (tests/degenerate_cases.py — the same rows the batch oracle sweep
#: salts in, so batch and stream can never drift): every class alone,
#: every pairwise and three-way interaction, every leave-one-out
#: 5-subset, and the full corpus
from degenerate_cases import doc_permutations

_CASES = doc_permutations()


def _salted_dir(sf_dir: str, tmp_path, rows) -> str:
    out = tmp_path
    base = pq.read_table(f"{sf_dir}/documents.parquet")
    ids, texts, langs, srcs, ncs = zip(*rows)
    edge = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs),
            "source": pa.array(srcs),
            "n_chars": pa.array(ncs, pa.int64()),
        }
    )
    pq.write_table(
        pa.concat_tables([base.select(edge.column_names), edge]),
        str(out / "documents.parquet"),
    )
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", str(out / f"{t}.parquet"))
    return str(out)


def _batch_twin(spark, salted: str):
    """The stream's stages replayed with the BATCH operators: scrub ->
    repetition filter -> quality score -> by-value threshold gate ->
    contamination probe. Mirrors ``corpus_ingest_stream`` stage for
    stage (by-VALUE gate, not by-rank — a stream cannot rank against
    unseen documents)."""
    from sensomics_data_pipeline_spark.operators.text import (
        ngram_contamination,
        quality_score,
        repetition_signals,
        scrub_pii,
    )
    from sensomics_data_pipeline_spark.sources.readers import (
        ensure_session_confs,
    )
    from sensomics_data_pipeline_spark.streaming.ingest import (
        gate_thresholds,
    )

    ensure_session_confs(spark)
    docs = (
        spark.read.option("pathGlobFilter", "documents.parquet")
        .parquet(salted)
    )
    thresholds = gate_thresholds(docs, keep_frac=0.6)
    scrubbed = scrub_pii(docs).select(
        "doc_id", "source", F.col("scrubbed_text").alias("text")
    )
    nonrep = (
        repetition_signals(scrubbed, "text")
        .filter(~F.col("repetitious"))
        .select("doc_id", "source", "text")
    )
    scored = quality_score(nonrep, "text")
    gated = scored.join(F.broadcast(thresholds), "source").filter(
        F.col("quality_score") >= F.col("gate_threshold")
    )
    clean_ids = ngram_contamination(
        gated,
        docs.filter(F.col("source") == "src0"),
        key_col="doc_id",
        text_col="text",
        n=8,
    ).filter(~F.col("contaminated"))
    return (
        gated.join(clean_ids.select("doc_id"), "doc_id", "left_semi")
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "quality_score",
        )
    )


@pytest.mark.parametrize("case", sorted(_CASES))
def test_stream_ingest_matches_batch_on_degenerate_corpus(
    spark, sf_dir, tmp_path, case
):
    import pandas as pd

    from sensomics_data_pipeline_spark.streaming.ingest import (
        corpus_ingest_stream,
    )

    salted = _salted_dir(sf_dir, tmp_path, _CASES[case])
    streamed = (
        corpus_ingest_stream(spark, salted, keep_frac=0.6, eval_source="src0")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    batch = (
        _batch_twin(spark, salted)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(streamed) > 0
    pd.testing.assert_frame_equal(
        streamed[sorted(streamed.columns)], batch[sorted(batch.columns)]
    )


def test_streaming_theta_multi_batch_equals_batch_sketch(spark, sf_dir, tmp_path):
    """The KMV trimmed-merge law under REAL micro-batching: split the
    events table into 4 files, force maxFilesPerTrigger=1 (>= 4
    micro-batches carrying sketch state across batches), and the final
    emitted state must equal the batch sketch bit-for-bit."""
    from pyspark.sql import functions as F

    from sensomics_data_pipeline_spark.operators import profile as prof_ops
    from sensomics_data_pipeline_spark.sources.readers import load_table
    from sensomics_data_pipeline_spark.streaming.stateful import (
        theta_sketch_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    split_dir = str(tmp_path / "split")
    ev.repartition(4).write.parquet(f"{split_dir}/events.parquet")

    got = {
        (r["label"], r["pos"]): (r["h"], r["theta"], r["n_kept"])
        for r in theta_sketch_stream(
            spark,
            f"{split_dir}/events.parquet",
            max_files_per_trigger=1,
            glob="*.parquet",
        ).collect()
    }
    batch = prof_ops.theta_sketch_table(ev, ["event_type"], "user_id", k=64)
    want = {}
    for r in batch.collect():
        for i, h in enumerate(r["hashes"], start=1):
            want[(r["event_type"], i)] = (h, r["theta"], r["n_kept"])
    assert got == want
