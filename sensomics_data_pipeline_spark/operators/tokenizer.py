"""Distributed byte-pair-encoding trainer + tokenizer (Sennrich et al.
2016, ACL — "Neural Machine Translation of Rare Words with Subword
Units"): the vocabulary-building step every LLM training-data pipeline
runs before packing.

Scale design: training never touches the corpus after one pass — the
trainer operates on the WORD-FREQUENCY table (``groupBy word``), whose
size is the corpus vocabulary (≪ corpus; ~10⁷-10⁸ rows even at 100 TB
of text), with each word's current subword split carried as an
``array<string>`` column. One merge round = one pair-explode +
group-count + a 1-row argmax to the driver (BPE is sequential by
definition — each merge depends on the previous — so O(n_merges)
driver-synced scalar decisions is the floor, the same shape as
``graph.k_core``'s peel rounds), then a JVM-side ``aggregate`` fold
rewrites every word's split — no Python UDF anywhere. The word table
is eagerly ``localCheckpoint``-ed per round so the plan stays one fold
deep instead of stacking ``n_merges`` folds.

Tokenizing a corpus with the trained vocabulary is a JOIN against the
word table (broadcast when it fits, shuffle otherwise) — per-document
merge loops never run at scale.

No reference analog (the reference has no tokenizer); certified
against an unrolled merge-stage DuckDB oracle (list_reduce folds) in
``__spark_entry__.q_bpe_merges``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: whitespace pretokenization (the repo-wide
    ``split(trim(text), '\\s+')`` convention shared with
    ``text.token_count``) → ``(word, n)`` counts with the initial
    character split carried as ``toks``."""
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return words.withColumn(
        "toks", F.expr("filter(split(word, ''), x -> x != '')")
    )


def _merge_fold_on(col, a: str, b: str, m: str):
    """JVM-side left-to-right greedy merge of adjacent (a, b) → m in a
    token-array COLUMN: the standard BPE application order (overlapping
    occurrences resolve leftmost-first, so 'aaa' under (a,a) → [aa, a]).
    Nested CASE keeps ``element_at(acc, -1)`` guarded for empty acc
    (ANSI-safe)."""
    return F.aggregate(
        col,
        F.expr("cast(array() as array<string>)"),
        lambda acc, t: F.when(
            F.size(acc) == 0, F.array(t)
        ).otherwise(
            F.when(
                (F.element_at(acc, -1) == F.lit(a)) & (t == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))
                ),
            ).otherwise(F.concat(acc, F.array(t)))
        ),
    )


def _merge_fold(a: str, b: str, m: str):
    return _merge_fold_on(F.col("toks"), a, b, m)


def _rotate_local_checkpoint(
    df: DataFrame, prior_ids: set[int]
) -> tuple[DataFrame, set[int]]:
    """Eager-``localCheckpoint`` ``df`` and unpersist the executor
    blocks the PRIOR rotation pinned, returning ``(checkpointed_df,
    ids_pinned_now)``.

    Without this, a long training run accumulates one checkpointed
    block set per round in executor storage memory (at a 32k-merge
    vocabulary that is thousands of dead copies of the word table) —
    the ContextCleaner only frees them after a driver GC happens to
    collect the Python refs. The unpersist runs strictly AFTER the new
    eager checkpoint materializes, so no live lineage still reads the
    old blocks. Only ids this rotation chain created are touched —
    caches owned by other operators are invisible to it.

    SINGLE-THREADED CONTRACT: ownership is attributed by diffing
    ``getPersistentRDDs()`` around the eager checkpoint, which is only
    sound when no OTHER thread persists RDDs in the same
    SparkContext during that window (a concurrently-persisted RDD
    would land in ``mine`` and be unpersisted on the NEXT rotation —
    unrecoverable for a localCheckpoint, whose lineage is truncated).
    BPE training drives the session from one driver thread, so the
    contract holds for every caller in this repo; do NOT run
    ``bpe_train*`` concurrently with other persisting jobs on the
    same SparkSession (run it on its own session if you must overlap
    — sessions are cheap, SparkContexts are shared but per-session
    training here persists nothing outside this chain)."""
    sc = df.sparkSession.sparkContext
    before = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    out = df.localCheckpoint(eager=True)
    jmap = sc._jsc.getPersistentRDDs()
    after = {int(k) for k in jmap.keySet().toArray()}
    mine = after - before
    stale = prior_ids & after
    if stale:
        it = jmap.entrySet().iterator()
        while it.hasNext():
            e = it.next()
            if int(e.getKey()) in stale:
                e.getValue().unpersist(False)
    return out, mine


def bpe_train(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[list[tuple], DataFrame]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns ``(merges, words)`` where merges is a driver-side list of
    ``(rank, left, right, merged, pair_count)`` (bounded: n_merges
    rows — the same bounded-scalar contract as threshold derivations)
    and ``words`` is the word-frequency DataFrame with each word's
    final subword split in ``toks``.

    Ties break on (count DESC, left, right) so the learned table is
    deterministic and engine-portable.
    """
    words, ckpt_ids = _rotate_local_checkpoint(
        word_freq_table(df, text_col), set()
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pairs = words.select(
            "n",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks)-1),"
                    " (t, i) -> struct(t AS a, element_at(toks, i+2) AS b))"
                )
            ).alias("p"),
        ).select("n", "p.a", "p.b")
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        m = a + b
        merges.append((rank, a, b, m, int(cnt)))
        words, ckpt_ids = _rotate_local_checkpoint(
            words.withColumn(
                "toks",
                F.when(F.size("toks") < 2, F.col("toks")).otherwise(
                    _merge_fold(a, b, m)
                ),
            ),
            ckpt_ids,
        )
    return merges, words


def bpe_train_batched(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    batch_k: int = 8,
    with_rounds: bool = False,
) -> tuple[list[tuple], DataFrame]:
    """Batched BPE trainer: per driver-synced round, take the top
    ``batch_k`` MUTUALLY NON-CONFLICTING pairs (no shared left/right/
    merged symbol — disjoint merges commute, so applying them in one
    fold chain is order-independent) instead of one. Driver syncs drop
    from ``n_merges`` to ``~n_merges / batch_k`` rounds — the standard
    trick for making a 32k-vocab train tractable (32k Spark jobs →
    ~4k at batch_k=8).

    Divergence from canonical BPE, by construction: pair counts are
    recomputed once per ROUND, so merges 2..k of a round are chosen on
    counts that ignore merges 1..k-1 of the same round — the learned
    table can differ from the sequential trainer's. ``batch_k=1``
    reproduces :func:`bpe_train` exactly (law pinned in tests); the
    certified driver oracle stays on the sequential mode. Recorded
    ``pair_count`` values are as-of the round start.

    Returns the same ``(merges, words)`` contract as ``bpe_train``;
    ``with_rounds=True`` appends the 0-based sync-round index as a
    6th tuple element (so certification queries can check the
    per-round mutual-non-conflict law without re-deriving batch
    boundaries).
    """
    words, ckpt_ids = _rotate_local_checkpoint(
        word_freq_table(df, text_col), set()
    )
    merges: list[tuple] = []
    round_idx = -1
    while len(merges) < n_merges:
        round_idx += 1
        room = n_merges - len(merges)
        k = min(batch_k, room)
        pairs = words.select(
            "n",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks)-1),"
                    " (t, i) -> struct(t AS a, element_at(toks, i+2) AS b))"
                )
            ).alias("p"),
        ).select("n", "p.a", "p.b")
        # over-fetch 4x: conflicting candidates are skipped, and the
        # collect stays a bounded (4*batch_k)-row scalar either way
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(4 * k)
            .collect()
        )
        if not top:
            break
        used: set = set()
        batch: list[tuple] = []
        for r in top:
            if len(batch) >= k:
                break
            a, b, cnt = r["a"], r["b"], r["cnt"]
            m = a + b
            # conflict = any shared symbol with an already-picked merge
            # (incl. its output); the FIRST candidate never conflicts,
            # so every round makes progress
            if a in used or b in used or m in used:
                continue
            batch.append((a, b, m, int(cnt)))
            used.update((a, b, m))
        # one withColumn per merge, NOT one nested expression: each
        # fold's input must be an attribute reference to the previous
        # Project's output. Nesting the when(size<2, ..)/aggregate
        # expressions directly references the prior level's tree 3×
        # per level — a 3^batch_k expression blow-up that overflows
        # codegen into interpreted eval (no subexpression elimination
        # there), measured 12.7 s for ONE batch-8 round at sf0.1 vs
        # ~0.4 s/round sequential. Catalyst keeps the chained Projects
        # separate (CollapseProject refuses to duplicate non-cheap
        # expressions, SPARK-36718), so each fold evaluates once.
        folded = words
        for a, b, m, _cnt in batch:
            folded = folded.withColumn(
                "toks",
                F.when(F.size("toks") < 2, F.col("toks")).otherwise(
                    _merge_fold(a, b, m)
                ),
            )
        rank0 = len(merges)
        merges.extend(
            (rank0 + i + 1, a, b, m, cnt, round_idx)
            if with_rounds
            else (rank0 + i + 1, a, b, m, cnt)
            for i, (a, b, m, cnt) in enumerate(batch)
        )
        words, ckpt_ids = _rotate_local_checkpoint(folded, ckpt_ids)
    return merges, words


def bpe_token_counts(
    df: DataFrame,
    words: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Tokenize a corpus with a trained word table: per-document BPE
    token count = Σ over the document's words of the word's subword
    count. The scale path is this JOIN (word table broadcasts when it
    fits, shuffles otherwise) — no per-document merge loop ever runs.
    In-vocabulary only by construction when ``df`` is the training
    corpus; out-of-vocabulary words of a NEW corpus fall back to their
    character count (= the no-merges-apply floor).

    Output: df columns + ``n_bpe_tokens``.
    """
    vocab = words.select("word", F.size("toks").alias("_n_sub"))
    doc_words = df.withColumn(
        "_word",
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")),
    ).filter(F.col("_word") != "")
    joined = doc_words.join(
        vocab, doc_words["_word"] == vocab["word"], "left"
    ).withColumn(
        "_n_tok",
        F.coalesce(F.col("_n_sub"), F.length("_word")),
    )
    return (
        joined.groupBy(*df.columns)
        .agg(F.sum("_n_tok").cast("long").alias("n_bpe_tokens"))
    )
