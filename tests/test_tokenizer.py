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


def test_bpe_batched_k1_equals_sequential(spark):
    # batch_k=1 must reproduce bpe_train merge-for-merge (the law that
    # keeps the batched mode anchored to the certified trainer)
    texts = ["low lower lowest", "new newer newest", "low low newer"]
    corpus = _spark_corpus(spark, texts)
    want_m, want_w = tok_ops.bpe_train(spark, corpus, "text", n_merges=6)
    got_m, got_w = tok_ops.bpe_train_batched(
        spark, corpus, "text", n_merges=6, batch_k=1
    )
    assert got_m == want_m
    assert sorted(map(tuple, got_w.select("word", "toks").collect())) == \
        sorted(map(tuple, want_w.select("word", "toks").collect()))


def test_bpe_batched_skips_conflicting_candidates(spark):
    # all top pairs share the symbol 'b': each round can apply only ONE
    # of them, so conflict-skipping must serialize them across rounds
    # in count order - (a,b):3 then (b,c):2 then (b,d):1 - exactly the
    # sequential trainer's choices for this corpus
    texts = ["ab ab ab bc bc bd"]
    corpus = _spark_corpus(spark, texts)
    merges, words = tok_ops.bpe_train_batched(
        spark, corpus, "text", n_merges=3, batch_k=3
    )
    assert merges == [
        (1, "a", "b", "ab", 3),
        (2, "b", "c", "bc", 2),
        (3, "b", "d", "bd", 1),
    ]
    for row in words.collect():
        assert "".join(row["toks"]) == row["word"]


def test_bpe_batched_fewer_driver_rounds(spark):
    # the whole point: merges/round > 1 -> the 32k-vocab cost model
    # scales as n_merges / batch_k driver syncs
    texts = ["abcd efgh ijkl mnop qrst"] * 3
    corpus = _spark_corpus(spark, texts)
    merges, _ = tok_ops.bpe_train_batched(
        spark, corpus, "text", n_merges=4, batch_k=4
    )
    # all four merges were selected in ONE round: counts are all
    # as-of round start (each pair occurs exactly 3 times)
    assert len(merges) == 4
    assert [c for (_r, _a, _b, _m, c) in merges] == [3, 3, 3, 3]


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


def test_cli_bpe(spark, tmp_path, sf_dir):
    from sensomics_data_pipeline_spark.cli import main

    out = str(tmp_path / "bpe_out")
    rc = main(
        [
            "bpe",
            f"{sf_dir}/documents.parquet",
            out,
            "--n-merges",
            "3",
            "--counts",
        ]
    )
    assert rc == 0
    merges = spark.read.parquet(f"{out}/merges.parquet")
    assert merges.count() == 3
    assert merges.columns == [
        "merge_rank", "left_tok", "right_tok", "merged", "pair_count",
    ]
    counts = spark.read.parquet(f"{out}/token_counts.parquet")
    assert counts.filter("n_bpe_tokens <= 0").count() == 0


# ---------------------------------------------------------------------------
# normalize_text (operators/text.py) — cross-engine unicode agreement
# ---------------------------------------------------------------------------

ADVERSARIAL_TEXTS = [
    "hello world",
    "café",                 # precomposed é
    "café",                # e + combining acute
    "ÅNGSTRÖM",       # A + ring, precomposed Ö
    "ẛ̣",              # long s with dot above + dot below
    "straße",               # sharp s (lowercase invariant)
    "  spaced\tout\n\ntext  ",
    "İstanbul",             # dotted capital I (locale-sensitive edge)
    "naïve résumé",
    "",
]


def _spark_norm(spark, texts, **kw):
    from sensomics_data_pipeline_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    out = normalize_text(df, "text", out_col="norm", **kw)
    return {r["i"]: r["norm"] for r in out.collect()}


def test_normalize_nfc_matches_duckdb(spark):
    import duckdb

    got = _spark_norm(spark, ADVERSARIAL_TEXTS, form="NFC")
    for i, t in enumerate(ADVERSARIAL_TEXTS):
        want = duckdb.sql(
            "SELECT nfc_normalize(?)", params=[t]
        ).fetchone()[0]
        assert got[i] == want, f"NFC mismatch on {t!r}"


def test_normalize_strip_accents_matches_duckdb(spark):
    import duckdb

    got = _spark_norm(spark, ADVERSARIAL_TEXTS, strip_accents=True)
    for i, t in enumerate(ADVERSARIAL_TEXTS):
        want = duckdb.sql(
            "SELECT strip_accents(nfc_normalize(?))", params=[t]
        ).fetchone()[0]
        assert got[i] == want, f"strip_accents mismatch on {t!r}"


def test_normalize_lower_matches_duckdb(spark):
    import duckdb

    got = _spark_norm(spark, ADVERSARIAL_TEXTS, lowercase=True)
    for i, t in enumerate(ADVERSARIAL_TEXTS):
        if "İ" in t:
            continue  # dotted capital I: see the dedicated test below
        want = duckdb.sql(
            "SELECT lower(nfc_normalize(?))", params=[t]
        ).fetchone()[0]
        assert got[i] == want, f"lower mismatch on {t!r}"


def test_normalize_lower_dotted_capital_i_pins_spark_side(spark):
    """KNOWN engine divergence, pinned both ways: U+0130 (İ) full-
    lowercases to 'i' + U+0307 combining dot per Unicode
    SpecialCasing.txt — Python str.lower() and Spark's JVM lower()
    both do this, and the kernel must match SPARK (the engine it
    ships in). DuckDB/utf8proc does the SIMPLE mapping to bare 'i';
    any future oracle over text lowercased by this op must
    canonicalize İ first (or exclude it), exactly like the
    libm-vs-DuckDB ln divergence documented for bm25."""
    import duckdb

    from pyspark.sql import functions as F

    got = _spark_norm(spark, ["İstanbul"], lowercase=True)[0]
    spark_lower = (
        spark.createDataFrame([("İstanbul",)], "t string")
        .select(F.lower(F.col("t")).alias("l"))
        .collect()[0]["l"]
    )
    duck_lower = duckdb.sql("SELECT lower('İstanbul')").fetchone()[0]
    assert got == spark_lower == "i̇stanbul"
    assert duck_lower == "istanbul" and duck_lower != got


def test_normalize_collapse_whitespace(spark):
    got = _spark_norm(spark, ["  a \t b\n\nc  "], collapse_whitespace=True)
    assert got[0] == "a b c"


def test_normalize_nfc_unifies_equivalent_forms(spark):
    got = _spark_norm(spark, ["café", "café"], form="NFC")
    assert got[0] == got[1] == "café"


def test_normalize_null_passthrough(spark):
    from sensomics_data_pipeline_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, None)], "i int, text string")
    out = normalize_text(df, "text", out_col="norm").collect()
    assert out[0]["norm"] is None


def test_bpe_checkpoint_rotation_releases_blocks(spark):
    """Each training round eager-checkpoints the word table; the prior
    round's blocks must be unpersisted once the new checkpoint
    materializes — otherwise a 32k-merge train accumulates thousands
    of dead word-table copies in executor storage. Net persistent-RDD
    growth after training = at most the FINAL checkpoint (plus none
    for the consumed intermediates)."""
    from sensomics_data_pipeline_spark.operators.tokenizer import (
        bpe_train,
        bpe_train_batched,
    )

    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.getPersistentRDDs().size()

    df = spark.createDataFrame(
        [("low lower lowest newer newest low low",)], "text string"
    )
    before = n_persistent()
    merges, words = bpe_train(spark, df, n_merges=5)
    assert len(merges) == 5
    words.count()
    assert n_persistent() - before <= 1
    before = n_persistent()
    merges_b, words_b = bpe_train_batched(spark, df, n_merges=5, batch_k=2)
    assert len(merges_b) == 5
    words_b.count()
    assert n_persistent() - before <= 1


def test_bpe_batched_with_rounds_records_schedule(spark):
    """with_rounds=True appends the 0-based sync-round index: rounds
    are non-decreasing, each holds at most batch_k merges, merges
    within a round share no symbol (the disjointness law), and the
    5-tuple prefix is byte-identical to the with_rounds=False run."""
    from sensomics_data_pipeline_spark.operators.tokenizer import (
        bpe_train_batched,
    )

    df = spark.createDataFrame(
        [("low lower lowest newer newest low low wide widest",)],
        "text string",
    )
    plain, _ = bpe_train_batched(spark, df, n_merges=6, batch_k=2)
    tagged, _ = bpe_train_batched(
        spark, df, n_merges=6, batch_k=2, with_rounds=True
    )
    assert [m[:5] for m in tagged] == plain
    rounds = [m[5] for m in tagged]
    assert rounds == sorted(rounds) and rounds[0] == 0
    from collections import defaultdict

    by_round = defaultdict(list)
    for _rank, a, b, m, _cnt, rd in tagged:
        by_round[rd].append((a, b, m))
    for items in by_round.values():
        assert len(items) <= 2
        used: set = set()
        for a, b, m in items:
            assert not ({a, b, m} & used)
            used.update((a, b, m))
