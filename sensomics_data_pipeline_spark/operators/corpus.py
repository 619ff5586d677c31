"""End-to-end training-corpus preparation: the composition a
large-scale data pipeline actually ships — PII scrubbing → repetition
filter → per-source quality gate → benchmark decontamination →
near-dup deduplication → sequence packing — expressed as ONE lazy
Spark plan over a ``documents``-shaped table.

Each stage is an independently oracle-/unit-tested operator from this
package; this module owns only the composition contract (column
hand-off, filter order, final schema). Stage order is deliberate:

1. scrub first, so every later text-derived signal (quality, grams,
   dedup hashes) sees the text that would actually be trained on;
2. cheap per-row filters (repetition) before windowed ones (quality
   percentile) before join-shaped ones (contamination, dedup) — drop
   rows while it is cheapest;
3. dedup after content filters, so near-dup clusters are not formed
   across documents that were going to be dropped anyway;
4. packing last, over survivors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.operators.dedup import (
    dedup_corpus,
    dedup_paragraphs,
)
from sensomics_data_pipeline_spark.operators.packing import pack_sequences
from sensomics_data_pipeline_spark.operators.sampling import rebalance_sources
from sensomics_data_pipeline_spark.operators.text import (
    contamination_probe,
    ngram_contamination,
    quality_percentile_gate,
    remove_duplicate_spans,
    repetition_signals,
    scrub_pii,
)


def prepare_corpus(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    eval_df: DataFrame | None = None,
    eval_grams=None,
    quality_keep_frac: float = 0.5,
    gate_two_pass: bool = False,
    contamination_ngram: int = 8,
    dedup_method: str = "minhash",
    dedup_kwargs: dict | None = None,
    pack_budget: int = 2048,
    pack_groups: int | None = None,
    paragraph_min_docs: int | None = None,
    span_min_docs: int | None = None,
    span_tokens: int = 16,
    paragraph_sep: str | None = None,
    paragraph_join: str | None = None,
    paragraph_words: int = 10,
    mix_weights: dict[str, float] | None = None,
    seed: int = 42,
    persist_stages: bool = True,
) -> DataFrame:
    """Run the full corpus-preparation pipeline; returns one row per
    SURVIVING document with its pack assignment:

    ``(key, source, text [scrubbed], n_tokens, quality_score,
    pack_id, pack_fill, oversize)``

    ``eval_df`` (optional) is the benchmark set for decontamination;
    when omitted that stage is skipped. ``eval_grams`` (optional,
    value-identical alternative) is a PRECOMPUTED eval gram-hash list
    (:func:`~.text.eval_gram_hashes`): the stage then runs as the
    map-side broadcast-set :func:`~.text.contamination_probe` — no
    eval-side job, no join, no hit-count shuffle — the right shape for
    a long-lived session running the pipeline repeatedly against a
    static benchmark set (the ``__spark_entry__`` memo does exactly
    this). ``dedup_method`` passes through
    to :func:`dedup_corpus` (``minhash``/``jaccard``/``simhash``/
    ``exact``). ``gate_two_pass=True`` swaps the quality gate's
    per-source window for the broadcast-threshold two-pass form (the
    few-huge-groups 100-TB shape; see
    :func:`~.text.quality_percentile_gate`).

    Three optional stages (all off by default, preserving the r3 query
    contract): ``paragraph_min_docs`` inserts paragraph-level
    boilerplate removal (:func:`dedup_paragraphs`) right after PII
    scrubbing — shared navbox/license paragraphs are stripped before
    any text-derived signal is computed; ``span_min_docs`` inserts
    substring-grain duplicated-span removal
    (:func:`remove_duplicate_spans`, Lee et al. ACL 2022) at the same
    point (after the paragraph stage when both are on — paragraphs
    strip whole blocks cheaply, spans catch the sub-paragraph
    boilerplate that remains); ``mix_weights`` appends
    deterministic domain-mix rebalancing (:func:`rebalance_sources`)
    over the survivors just before packing, so packs are built from
    the final mix.

    Scale shape: stages 1-2 are pure per-row projections (no
    shuffle); the quality gate shuffles once per source-partitioned
    window; contamination is a broadcast probe; dedup is the banding
    equi-join family; packing shuffles only ``(key, n_tokens)`` pairs.
    ``pack_groups=None`` (default) lets :func:`pack_sequences`
    auto-size its group count from a survivor count — with
    ``persist_stages=True`` that count doubles as the survivors-cache
    materialization (the cache fills during the count job and every
    later consumer scans it), so the extra action is effectively free.

    ``persist_stages`` (default True): the plan DAG references
    ``gated`` twice (contamination probe + join-back) and the survivor
    set twice (packing input + final join), and Spark recomputes a
    subplan once PER consumer — un-persisted, the text-heavy
    scrub/signals/gate prefix executes up to 4x in one action
    (measured 1.5x end-to-end at bench scale). Persisting the two fan-
    out points (MEMORY_AND_DISK — spills, never OOMs) is exactly what
    a production pipeline does between stage families; at 100 TB the
    same role is played by checkpointing survivors to the object
    store. Pass False to keep the plan fully lazy (e.g. when the
    caller materializes once and manages its own caching).
    """
    from pyspark import StorageLevel

    cached: list[DataFrame] = []
    scrubbed = scrub_pii(df, text_col).select(
        key_col, source_col, F.col("scrubbed_text").alias(text_col)
    )
    if paragraph_min_docs is not None:
        cleaned = dedup_paragraphs(
            scrubbed,
            text_col=text_col,
            doc_col=key_col,
            sep=paragraph_sep,
            join_sep=paragraph_join,
            words_per_para=paragraph_words,
            min_docs=paragraph_min_docs,
        ).select(key_col, F.col("clean_text").alias(text_col))
        scrubbed = scrubbed.select(key_col, source_col).join(
            cleaned, key_col
        )
    if span_min_docs is not None:
        despanned = remove_duplicate_spans(
            scrubbed,
            key_col=key_col,
            text_col=text_col,
            span_tokens=span_tokens,
            min_docs=span_min_docs,
            engine_exact=False,
        ).select(key_col, F.col("clean_text").alias(text_col))
        scrubbed = scrubbed.select(key_col, source_col).join(
            despanned, key_col
        )
    non_repetitious = (
        repetition_signals(scrubbed, text_col, engine_exact=False)
        .filter(~F.col("repetitious"))
        .select(key_col, source_col, text_col)
    )
    gated = quality_percentile_gate(
        non_repetitious,
        keep_frac=quality_keep_frac,
        partition_col=source_col,
        key_col=key_col,
        text_col=text_col,
        two_pass=gate_two_pass,
    ).select(key_col, source_col, text_col, "n_tokens", "quality_score")
    if eval_df is not None or eval_grams is not None:
        # the join path reads `gated` twice (probe input + join-back),
        # so it pins a cache; the fused probe is gated's ONLY consumer
        # — a linear plan — so pinning would be pure fill overhead
        if persist_stages and eval_grams is None:
            gated = gated.persist(StorageLevel.MEMORY_AND_DISK)
            cached.append(gated)
        if eval_grams is not None:
            # fused map-side probe over the gated rows: the filter
            # happens in the same Arrow pass, so no join-back either
            gated = (
                contamination_probe(
                    gated,
                    eval_grams,
                    text_col=text_col,
                    n=contamination_ngram,
                )
                .filter(~F.col("contaminated"))
                .select(
                    key_col, source_col, text_col,
                    "n_tokens", "quality_score",
                )
            )
        else:
            clean_ids = ngram_contamination(
                gated,
                eval_df,
                key_col=key_col,
                text_col=text_col,
                n=contamination_ngram,
                engine_exact=False,
            ).filter(~F.col("contaminated"))
            gated = gated.join(
                clean_ids.select(key_col), key_col, "left_semi"
            )
    survivors = dedup_corpus(
        gated, key_col, text_col, method=dedup_method, **(dedup_kwargs or {})
    )
    if mix_weights is not None:
        survivors = rebalance_sources(
            survivors, mix_weights, source_col, key_col, seed=seed
        )
    if persist_stages:
        survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(survivors)
    packed = pack_sequences(
        survivors.select(key_col, "n_tokens"),
        key_col=key_col,
        tokens_col="n_tokens",
        budget=pack_budget,
        n_groups=pack_groups,
    )
    out = survivors.join(
        packed.select(key_col, "pack_id", "pack_fill", "oversize"), key_col
    ).select(
        key_col,
        source_col,
        text_col,
        "n_tokens",
        "quality_score",
        "pack_id",
        "pack_fill",
        "oversize",
    )
    # release point for the pinned stage caches (see
    # release_stage_cache): a lazy operator must not pin cache entries
    # it cannot free — the caller materializes, then releases
    out._prepare_corpus_cached = cached
    return out


def release_stage_cache(df: DataFrame) -> None:
    """Unpersist the stage caches :func:`prepare_corpus` attached to
    ``df`` (no-op for ``persist_stages=False`` results). Call after the
    result has been materialized (written / counted); long-lived
    sessions running many differently-parameterized pipelines would
    otherwise accumulate one pinned cache entry pair per call."""
    for c in getattr(df, "_prepare_corpus_cached", ()):
        c.unpersist()
