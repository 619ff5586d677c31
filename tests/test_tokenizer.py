"""BPE trainer/tokenizer laws (operators/tokenizer.py): the Spark
trainer must match a pure-Python reference implementation merge-for-
merge on arbitrary corpora, and the join-based corpus tokenizer must
match per-word merge application.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.operators import tokenizer as tok_ops


def _py_bpe(texts: list[str], n_merges: int):
    """Reference trainer: greedy left-to-right merges, ties on
    (count DESC, left, right)."""
    wf = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                wf[w] += 1
    words = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, toks in words.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += wf[w]
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        m = a + b
        merges.append((rank, a, b, m, cnt))
        for w, toks in words.items():
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = m
                else:
                    out.append(t)
            words[w] = out
    return merges, words


def _spark_corpus(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _assert_match(spark, texts, n_merges):
    got_merges, got_words = tok_ops.bpe_train(
        spark, _spark_corpus(spark, texts), "text", n_merges=n_merges
    )
    want_merges, want_words = _py_bpe(texts, n_merges)
    assert got_merges == want_merges
    got_tok = {
        r["word"]: (r["n"], list(r["toks"])) for r in got_words.collect()
    }
    wf = Counter(
        w for t in texts for w in re.split(r"\s+", t.strip()) if w
    )
    want_tok = {w: (wf[w], toks) for w, toks in want_words.items()}
    assert got_tok == want_tok


def test_bpe_simple_corpus(spark):
    _assert_match(
        spark,
        ["low lower lowest", "new newer newest", "low low newer"],
        n_merges=6,
    )


def test_bpe_overlapping_pairs_leftmost_first(spark):
    # 'aaaa' under merge (a,a): leftmost-first gives [aa, aa], and the
    # second round can then merge (aa, aa)
    _assert_match(spark, ["aaaa aaa aa baa"], n_merges=3)


def test_bpe_tie_break_deterministic(spark):
    # every pair occurs exactly once -> ties resolved lexicographically
    _assert_match(spark, ["ab cd ef gh"], n_merges=4)


def test_bpe_single_char_words_exhaust(spark):
    # corpus with no mergeable pairs after 1 merge: trainer must stop
    # early without error
    merges, _ = tok_ops.bpe_train(
        spark, _spark_corpus(spark, ["a b c ab"]), "text", n_merges=5
    )
    assert len(merges) == 1  # only (a,b) inside the word 'ab'


def test_bpe_unicode(spark):
    _assert_match(spark, ["héllo héllo wörld wörld héllo"], n_merges=4)


def test_bpe_random_corpora_property(spark):
    import random

    rng = random.Random(1234)
    alphabet = "abcdef"
    for trial in range(3):
        texts = [
            " ".join(
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randint(1, 7))
                )
                for _ in range(rng.randint(1, 30))
            )
            for _ in range(rng.randint(2, 12))
        ]
        _assert_match(spark, texts, n_merges=5)


def test_bpe_token_counts_matches_reference(spark):
    texts = ["low lower lowest low", "newer newest new", "low newer"]
    _, words = tok_ops.bpe_train(
        spark, _spark_corpus(spark, texts), "text", n_merges=4
    )
    _, ref_words = _py_bpe(texts, 4)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tok_ops.bpe_token_counts(docs, words, "text").collect()
    }
    want = {
        i: sum(
            len(ref_words[w])
            for w in re.split(r"\s+", t.strip())
            if w
        )
        for i, t in enumerate(texts)
    }
    assert got == want


def test_bpe_token_counts_oov_falls_back_to_chars(spark):
    _, words = tok_ops.bpe_train(
        spark, _spark_corpus(spark, ["xx yy xx"]), "text", n_merges=1
    )
    docs = spark.createDataFrame(
        [(1, "xx zzz")], "doc_id int, text string"
    )
    got = tok_ops.bpe_token_counts(docs, words, "text").collect()
    # xx -> 1 token (merged), zzz out-of-vocab -> 3 chars
    assert got[0]["n_bpe_tokens"] == 1 + 3


def test_bpe_train_no_python_udf(spark):
    """The per-round rewrite must stay JVM-side (aggregate fold)."""
    _, words = tok_ops.bpe_train(
        spark, _spark_corpus(spark, ["ab ab ab"]), "text", n_merges=1
    )
    # localCheckpoint already materialized; re-derive one fold to
    # inspect the plan shape
    plan = (
        words.withColumn("toks", tok_ops._merge_fold("a", "b", "ab"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
