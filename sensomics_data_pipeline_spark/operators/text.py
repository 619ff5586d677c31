"""Text-analysis operators for training-data pipelines (north-star ops,
BASELINE.md "Query set"): token counting, quality scoring, language ID,
document fingerprinting. All pure column expressions — JVM-side,
codegen'd, no Python in the hot path; designed to stream over a 100-TB
``documents`` table with zero shuffles (per-row projections) except the
final aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language marker-word profiles for the n-gram/stopword
#: language heuristic. Deliberately minimal & deterministic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; drops empty tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on word/non-word boundaries and
    counts ~4-char chunks — a cheap deterministic proxy for BPE token
    counts (len/4 heuristic blended with word count)."""
    c = F.col(col) if isinstance(col, str) else col
    words = token_count(c)
    return F.greatest(words, F.ceil(F.length(c) / 4).cast("int"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token stats, punctuation /
    digit / uppercase ratios, stopword ratio, mean word length.

    The tokenization runs ONCE per row: ``_toks`` is materialized
    through a generator barrier (``util.materialize``) — a bare alias
    does NOT survive CollapseProject, which would inline the
    split+filter into each downstream consumer and re-tokenize the
    document per feature (measured on the dedup family; same trap)."""
    from sensomics_data_pipeline_spark.util import materialize

    c = F.col(text_col)
    pre = (
        materialize(df, _toks=tokens(c))
        .withColumn("n_chars_q", F.length(c))
        .withColumn("n_tokens", F.size("_toks"))
    )
    n_chars = F.col("n_chars_q")
    n_tokens = F.col("n_tokens")
    stop_hits = F.size(
        F.filter(F.col("_toks"), lambda t: F.lower(t).isin(LANG_MARKERS["en"]))
    )
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return (
        pre.withColumn(
            "mean_word_len",
            F.round(
                F.when(
                    n_tokens > 0,
                    (F.length(F.concat_ws("", F.col("_toks"))) / n_tokens),
                ).otherwise(0.0),
                6,
            ),
        )
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("digit_ratio", F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("upper_ratio", F.round(n_upper / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn(
            "stopword_ratio",
            F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6),
        )
        .drop("_toks")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score from the features — monotone, cheap,
    deterministic: long docs with real words and sane punctuation score
    high; flooded punctuation / digits score low.

    Rounding is ``round(x * 1e6) / 1e6`` rather than ``round(x, 6)``,
    deliberately: the weighted sum of 6-decimal ratios with 1-decimal
    weights lands EXACTLY on 7th-decimal halves all the time, and
    fractional-digit round() breaks those ties engine-specifically
    (Spark rounds the binary double's exact decimal expansion; DuckDB
    multiplies by 1e6 first, which can cross the .5 boundary the other
    way — observed as a 1-ulp-in-the-6th-decimal disagreement at
    sf0.1). Scaling first and rounding at digit 0 makes both engines
    round the SAME double with the same ties-away-from-zero rule."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.3
        + (1 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.1
    )
    return feats.withColumn(
        "quality_score", F.round(score * 1_000_000.0) / 1_000_000.0
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count marker hits per language,
    argmax with deterministic tie-break on language code; 'und' when no
    marker hits at all."""
    from sensomics_data_pipeline_spark.util import materialize

    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    hit_cols = []
    out = materialize(df, _toks=toks)
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.filter(F.col("_toks"), lambda t: t.isin(markers)))
        col_name = f"_hits_{lang}"
        out = out.withColumn(col_name, hits)
        hit_cols.append((lang, col_name))
    # argmax via greatest + chained when (deterministic order)
    best = F.greatest(*[F.col(c) for _, c in hit_cols])
    pred = F.lit("und")
    for lang, c in reversed(hit_cols):
        pred = F.when((F.col(c) == best) & (best > 0), lang).otherwise(pred)
    return out.withColumn("pred_lang", pred).drop(
        "_toks", *[c for _, c in hit_cols]
    )


def shingles_of(toks: Column, n: int) -> Column:
    """n-word shingles from an already-tokenized array: join each
    sliding window of n tokens with a single space. Built-ins only:
    transform over index sequence + slice + array_join. Take the token
    array as input (rather than re-tokenizing) so callers that need
    several shingle widths tokenize once behind a generator barrier."""
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(0)))
    return F.when(
        k >= 1,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles of a raw text column (tokenize + ``shingles_of``)."""
    return shingles_of(tokens(col), n)


#: Byte-exact Python replica of :func:`tokens` (``trim`` + Java-regex
#: ``\s+`` split + drop-empties). Java's ``\s`` WITHOUT the
#: UNICODE_CHARACTER_CLASS flag is the ASCII class ``[ \t\n\x0B\f\r]``
#: — Python's ``\s`` is Unicode-aware by default, so the class is
#: spelled out to keep e.g. NBSP (U+00A0) INSIDE tokens on both
#: engines; ``trim`` strips 0x20 only.
import re as _re

_JAVA_WS = _re.compile(r"[ \t\n\x0b\f\r]+")


def _py_tokens(s) -> list[str]:
    if not isinstance(s, str):
        return []
    return [t for t in _JAVA_WS.split(s.strip(" ")) if t]


def _doc_fingerprint_arrow(
    df: DataFrame, text_col: str, shingle_n: int
) -> DataFrame:
    """Arrow fast path for :func:`doc_fingerprint`: tokenize + shingle +
    md5 in C (hashlib) inside ``mapInPandas`` instead of the interpreted
    higher-order ``transform``/``slice``/``array_join`` chain — the HOF
    pipeline is pure interpreted expression eval (no codegen for lambda
    functions), measured ~8× the CPU of hashlib on the same shingles.
    Bit-identical by construction: same tokens (``_py_tokens`` replica),
    same ``" "``-joined n-gram strings, same md5/UTF-8, same first-15-
    hex-chars → 60-bit integer; <n-token and NULL docs pin to NULL like
    ``conv(array_min([]))``. Zero shuffle either way; the equivalence is
    pinned by a full-table test."""
    import hashlib

    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("fingerprint_min", LongType(), True),
            StructField("fingerprint_max", LongType(), True),
        ]
    )
    n = shingle_n

    def run(batches):
        md5 = hashlib.md5
        for pdf in batches:
            lo: list = []
            hi: list = []
            for t in pdf[text_col].tolist():
                toks = [w.encode("utf-8") for w in _py_tokens(t)]
                if len(toks) < n:
                    lo.append(None)
                    hi.append(None)
                    continue
                hexes = [
                    md5(b" ".join(toks[i : i + n])).hexdigest()[:15]
                    for i in range(len(toks) - n + 1)
                ]
                # fixed-length hex orders exactly as its numeric value
                lo.append(int(min(hexes), 16))
                hi.append(int(max(hexes), 16))
            yield pdf.assign(
                fingerprint_min=pd.array(lo, dtype="Int64"),
                fingerprint_max=pd.array(hi, dtype="Int64"),
            )

    return df.mapInPandas(run, out_schema)


def doc_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    shingle_n: int = 5,
    engine_exact: bool = True,
) -> DataFrame:
    """Rolling-hash document fingerprint: min and max 60-bit hash over
    the document's word 5-gram shingles (winnowing-lite). Equal
    fingerprints ⇒ near-identical prefix content; used as a cheap
    first-pass near-dup key.

    ``engine_exact=True`` (default) is the pure-builtin HOF form — the
    oracle-reference algorithm; ``False`` routes to
    :func:`_doc_fingerprint_arrow`, a hashlib ``mapInPandas`` fast path
    with bit-identical output (full-table equivalence test) — the
    interpreted ``transform``+``array_join``+``md5`` chain is the CPU
    hot spot of the pair-generation family at scale (slope 8.55 at a
    10× growing-vocab rehearsal came almost entirely from it)."""
    if not engine_exact:
        return _doc_fingerprint_arrow(df, text_col, shingle_n)
    sh = word_shingles(F.col(text_col), shingle_n)
    # Keep per-shingle hashes as 15-char lowercase hex: fixed-length hex
    # orders lexicographically exactly as its numeric value, so min/max
    # run on the strings and the costly conv(16,10) base conversion is
    # applied only to the TWO winners per document instead of every
    # shingle. The hash array is materialized via a generator barrier
    # (``util.materialize``) — a plain alias does NOT stop Catalyst's
    # projection collapse from inlining (and re-md5-ing) the HOF into
    # both the min and the max consumer (measured pitfall, see
    # ``dedup.hashed_shingle_sets``).
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    hex_hashes = F.transform(sh, lambda s: F.substring(F.md5(s), 1, 15))
    barrier = materialize(fan_out(df), _hex=hex_hashes)
    return (
        barrier.withColumn(
            "fingerprint_min", F.conv(F.array_min("_hex"), 16, 10).cast("bigint")
        )
        .withColumn(
            "fingerprint_max", F.conv(F.array_max("_hex"), 16, 10).cast("bigint")
        )
        .drop("_hex")
    )


def _run_stats(arr: Column) -> Column:
    """``struct(max_run, n_distinct)`` over an array's elements: the
    highest multiplicity of any single value and the distinct count.

    Computed per row as one O(n log n) fold: ``array_sort`` then a
    single ``aggregate`` pass that tracks the current run length. This
    is the per-document equivalent of ``explode → groupBy(doc, value)
    → count → max`` with ZERO shuffle — at 100 TB the explode plan
    shuffles the entire token stream, while this stays inside the scan
    stage as a codegen'd projection. (No index arithmetic: ANSI mode
    makes ``element_at(arr, 0)`` a runtime error, so a fold over the
    sorted array is both safer and one pass.)"""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("max_run"),
        F.lit(0).alias("n_distinct"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x.eqNullSafe(acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["max_run"], run).alias("max_run"),
            (acc["n_distinct"] + F.when(same, F.lit(0)).otherwise(F.lit(1))).alias(
                "n_distinct"
            ),
        )

    return F.aggregate(
        F.array_sort(arr),
        zero,
        step,
        lambda acc: F.struct(
            acc["max_run"].alias("max_run"), acc["n_distinct"].alias("n_distinct")
        ),
    )


def _repetition_counts_arrow(df: DataFrame, text_col: str) -> DataFrame:
    """Arrow twin of ``repetition_signals``' count kernel: per row the
    five integers the ratios are built from — token count, top-word
    multiplicity, distinct words, top-bigram multiplicity, distinct
    trigrams — via ``Counter`` over the ``_py_tokens`` replica inside
    ``mapInPandas`` instead of three interpreted ``array_sort`` +
    ``aggregate`` folds (HOFs do not enter whole-stage codegen; the
    fold chain was the corpus pipeline's hottest stage, ~60% of the
    prefix cost at bench scale). Bit-identical by construction: the
    counts are exact integers, and the ratio/round arithmetic stays in
    the SAME Spark expressions both engines share."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(c, T.LongType())
            for c in ("_n", "_w_max", "_w_dist", "_b_max", "_t_dist")
        ]
    )

    def run(batches):
        from collections import Counter

        for pdf in batches:
            ns, wm, wd, bm, td = [], [], [], [], []
            for t in pdf[text_col]:
                toks = _py_tokens(t)
                n = len(toks)
                cw = Counter(toks)
                cb = Counter(
                    " ".join(toks[i : i + 2]) for i in range(n - 1)
                )
                tg = {" ".join(toks[i : i + 3]) for i in range(n - 2)}
                ns.append(n)
                wm.append(max(cw.values()) if cw else 0)
                wd.append(len(cw))
                bm.append(max(cb.values()) if cb else 0)
                td.append(len(tg))
            yield pdf.assign(
                _n=ns, _w_max=wm, _w_dist=wd, _b_max=bm, _t_dist=td
            )

    from sensomics_data_pipeline_spark.util import fan_out

    return fan_out(df).mapInPandas(run, out_schema)


def repetition_signals(
    df: DataFrame, text_col: str = "text", engine_exact: bool = True
) -> DataFrame:
    """Repetition-based quality signals in the style of the Gopher /
    FineWeb heuristics, word-shaped (the corpus has no line structure):

    - ``top_word_frac`` — occurrences of the most frequent token over
      total tokens (boilerplate / keyword-stuffing detector),
    - ``unique_word_ratio`` — distinct tokens over total tokens,
    - ``top_bigram_frac`` — occurrences of the most frequent word
      bigram over total bigrams,
    - ``dup_trigram_frac`` — fraction of trigram occurrences that are
      repeats of an earlier trigram (1 − distinct/total),
    - ``repetitious`` — the composite keep/drop flag a training
      pipeline filters on.

    Plan shape (``engine_exact=True``, the oracle-reference form):
    tokenize ONCE per row behind a generator barrier, build 2/3-gram
    shingles from the materialized array, then one sorted-fold per
    width (``_run_stats``). Everything is a per-row projection — no
    shuffle, no UDF, embarrassingly parallel at any scale. Ratios are
    rounded to 6 and ``+ 0.0``-normalized so the DuckDB oracle (which
    computes the same counts via unnest + groupBy — an independent
    algorithm) hashes byte-identically.

    ``engine_exact=False`` swaps the interpreted fold kernel for
    :func:`_repetition_counts_arrow` (``Counter`` in C inside
    ``mapInPandas``) — exact same integer counts feeding the SAME
    ratio expressions, so output is bit-identical (full-table
    equivalence test in ``tests/test_operators.py``); used by the
    corpus pipeline where this stage dominated the prefix cost."""
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    if engine_exact:
        pre = materialize(fan_out(df), _toks=tokens(F.col(text_col)))
        t = F.col("_toks")
        # coalesce pins NULL text to n_tokens=0 (size(NULL) is NULL,
        # which pandas would widen to float64 and the driver's schema
        # gate would reject against the oracle's LEFT JOIN +
        # coalesce-to-0 shape)
        pre = materialize(
            pre,
            _w=_run_stats(t),
            _b=_run_stats(shingles_of(t, 2)),
            _t=_run_stats(shingles_of(t, 3)),
            _n=F.coalesce(F.size(t), F.lit(0)).cast("bigint"),
        )
        pre = pre.withColumns(
            {
                "_w_max": F.coalesce(F.col("_w.max_run"), F.lit(0)),
                "_w_dist": F.coalesce(F.col("_w.n_distinct"), F.lit(0)),
                "_b_max": F.coalesce(F.col("_b.max_run"), F.lit(0)),
                "_t_dist": F.coalesce(F.col("_t.n_distinct"), F.lit(0)),
            }
        ).drop("_toks", "_w", "_b", "_t")
    else:
        pre = _repetition_counts_arrow(df, text_col)
    n = F.col("_n")
    n_bg = F.greatest(n - 1, F.lit(0).cast("bigint"))
    n_tg = F.greatest(n - 2, F.lit(0).cast("bigint"))
    z = F.lit(0.0)

    def frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.round(num / den, 6) + z).otherwise(z)

    out = (
        pre.withColumn("n_tokens", n)
        .withColumn("top_word_frac", frac(F.col("_w_max"), n))
        .withColumn("unique_word_ratio", frac(F.col("_w_dist"), n))
        .withColumn("top_bigram_frac", frac(F.col("_b_max"), n_bg))
        .withColumn(
            "dup_trigram_frac",
            F.when(
                n_tg > 0,
                F.round(1.0 - F.col("_t_dist") / n_tg, 6) + z,
            ).otherwise(z),
        )
    )
    repetitious = (
        (F.col("top_word_frac") > 0.20)
        | (F.col("top_bigram_frac") > 0.18)
        | (F.col("dup_trigram_frac") > 0.30)
    )
    return out.withColumn("repetitious", repetitious).drop(
        "_w_max", "_w_dist", "_b_max", "_t_dist", "_n"
    )


def chunk_documents(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    long-document chunking step before embedding / context-window
    packing. Emits ``(key, chunk_id, chunk_text, chunk_n_tokens)``;
    every document yields at least one chunk (short docs come through
    whole), consecutive chunks share ``overlap`` tokens, and the last
    chunk may be short (nothing is dropped).

    Chunk count uses pure integer arithmetic
    (``(n - chunk + stride - 1) div stride + 1``) so the Spark plan and
    the SQL oracle derive identical chunk grids — float ``ceil`` is an
    engine-specific tie-breaker. Per-row generator fan-out (tokenize
    once → posexplode of sliced windows): no shuffle, linear in output
    size, embarrassingly parallel."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    pre = materialize(fan_out(df), _toks=tokens(F.col(text_col)))
    n = F.size("_toks")
    last_idx = F.when(n <= chunk_tokens, F.lit(0)).otherwise(
        F.floor((n - chunk_tokens + (stride - 1)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), last_idx),
        lambda i: F.slice(F.col("_toks"), i * stride + 1, chunk_tokens),
    )
    return (
        pre.select(
            F.col(key_col),
            F.posexplode(chunks).alias("chunk_id", "_chunk"),
        )
        .withColumn("chunk_text", F.array_join("_chunk", " "))
        .withColumn("chunk_n_tokens", F.size("_chunk").cast("bigint"))
        .drop("_chunk")
    )


def vocab_topk(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent tokens with total
    occurrence counts and document frequencies — the wordcount every
    pipeline needs for stopword lists, df-caps and tokenizer vocab
    seeding.

    Plan: explode the token stream → one groupBy(token) with map-side
    partial aggregation (count + approx-free exact distinct via the
    (token, doc) pre-distinct) → global top-k. Deterministic total
    order: (count desc, token asc). At 100 TB this is the canonical
    one-shuffle wordcount; the top-k limit is a TakeOrdered, not a full
    sort."""
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    toks = (
        materialize(fan_out(df), _toks=tokens(F.col(text_col)))
        .select(F.col(key_col), F.explode("_toks").alias("token"))
    )
    counts = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct(key_col).alias("n_docs"),
    )
    return counts.orderBy(
        F.desc("n_occurrences"), F.asc("token")
    ).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    broadcast_df_table: bool = True,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf — keyword
    extraction / topic labeling over a corpus.

    Scoring is integer-exact across engines: tf = in-doc count, idf is
    kept as the RAW df (document frequency) and the ranking uses
    (tf DESC per df ASC) lexicographically via an exact integer
    composite instead of tf * log(N/df) — log() is a libm call whose
    last-ulp differs by platform, which would make the top-k set
    engine-dependent. The composite preserves the tf-idf order for any
    corpus with df < 10^6 docs per term snapshot; the raw (tf, df)
    pair is emitted so callers can apply their own idf curve.

    Plan: explode → (doc, token) counts → join the token df table
    (vocab-sized; broadcast by default — natural-language vocabularies
    are ~10⁷ terms ≈ hundreds of MB, set ``broadcast_df_table=False``
    for adversarial/unbounded vocabularies to fall back to a shuffle
    hash join) → per-doc top-k window. Two shuffles (the wordcounts),
    one broadcast."""
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    from pyspark.sql import Window

    toks = (
        materialize(fan_out(df), _toks=tokens(F.col(text_col)))
        .select(F.col(key_col), F.explode("_toks").alias("token"))
    )
    tf = toks.groupBy(key_col, "token").agg(F.count("*").alias("tf"))
    dfreq = (
        tf.groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    if broadcast_df_table:
        dfreq = F.broadcast(dfreq)
    scored = tf.join(dfreq, "token")
    w = Window.partitionBy(key_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key_col, "token", "tf", "df", "rank")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    key_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag-of-terms
    query — the standard lexical retrieval score, used in a
    training-data pipeline to pull topic-relevant slices out of a
    crawl (and as the lexical half of hybrid BM25+embedding
    retrieval). Output: ``(key, bm25, n_terms_hit)`` for every
    document matching ≥ 1 query term.

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene's
                   non-negative variant)

    Plan shape: tokenize once; dl/avgdl/N from one aggregate
    (broadcast-scalar attach); the explode is FILTERED to the query
    terms before the tf groupBy, so the shuffled volume is
    O(matching postings), not O(corpus tokens); df is a
    |query_terms|-row broadcast. Scale: one corpus scan + one bounded
    shuffle regardless of corpus size.

    Engine parity: tf/df/dl/N are exact integers and avgdl is an
    exact integer-sum average, so both engines build identical IEEE
    expression trees; ln() is the one libm call (JVM vs libc differ
    in the last ulp on ~10% of inputs — measured r10), so the final
    score is ROUNDED on both sides (``round_decimals``, repo
    convention for hash-borne doubles; None keeps raw floats)."""
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    base = materialize(
        fan_out(df), _toks=tokens(F.col(text_col))
    ).select(F.col(key_col), F.size("_toks").alias("dl"), F.col("_toks"))
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).withColumn("_k", F.lit(0))
    terms = [str(t) for t in query_terms]
    # lazy checkpoint: tf feeds BOTH dfreq and the scored join — without
    # a materialization seam each consumer re-runs the corpus
    # scan+tokenize upstream (measured: 3 full tokenize passes; with
    # the seam exactly 2 — the stats pass and this one, the minimum,
    # since stats needs ALL docs and tf only matching postings)
    tf = (
        base.select(key_col, "dl", F.explode("_toks").alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy(key_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .withColumn("_k", F.lit(0))
        .join(F.broadcast(stats), "_k")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    agg = (
        scored.withColumn("_s", idf * tf_norm)
        .groupBy(key_col)
        .agg(
            F.sum("_s").alias("bm25"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    if round_decimals is not None:
        agg = agg.withColumn(
            "bm25", F.round("bm25", round_decimals)
        )
    return agg


def quality_percentile_gate(
    df: DataFrame,
    keep_frac: float = 0.4,
    partition_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    two_pass: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quality gate: keep the top ``keep_frac`` fraction of
    documents by composite quality score WITHIN each group (source /
    crawl / shard) — the "filter to the best q% per source" step of a
    training-data pipeline, which must be per-group so one
    high-quality source cannot crowd out every other source.

    Default (``two_pass=False``): ``percent_rank`` over (score desc,
    key) — the key tiebreak makes the kept set deterministic and
    engine-reproducible; this is the oracle-checked path. Scale note:
    the window shuffles ONE partition per group, so with few huge
    groups (5 sources × 100 TB) a single task sorts a whole source.

    ``two_pass=True`` is the few-huge-groups form: pass 1 computes the
    per-group score threshold with ``percentile_approx`` (a grouped
    aggregate — partial aggregation on every input partition, nothing
    serializes per group), pass 2 broadcasts the tiny per-group
    threshold table back and filters ``score >= threshold``. No window
    anywhere; both passes are embarrassingly parallel. The kept set is
    approximate at the boundary (quantile sketch error + score ties
    all kept, no key tiebreak) — emitted as ``gate_threshold`` instead
    of ``pct_rank`` so callers cannot confuse the two contracts.
    ``approx_accuracy`` is the sketch knob (higher = tighter boundary,
    more memory; 10k ≈ 1/10000 rank error)."""
    from pyspark.sql import Window

    scored = quality_score(df, text_col)
    if two_pass:
        thresholds = scored.groupBy(partition_col).agg(
            F.percentile_approx(
                "quality_score", 1.0 - keep_frac, approx_accuracy
            ).alias("gate_threshold")
        )
        return scored.join(F.broadcast(thresholds), partition_col).filter(
            F.col("quality_score") >= F.col("gate_threshold")
        )
    w = Window.partitionBy(partition_col).orderBy(
        F.desc("quality_score"), F.col(key_col)
    )
    return (
        scored.withColumn("pct_rank", F.percent_rank().over(w))
        .filter(F.col("pct_rank") <= keep_frac)
        .withColumn("pct_rank", F.round("pct_rank", 6) + F.lit(0.0))
    )


def _gram_hashes_arrow(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Arrow twin of ``ngram_contamination``'s ``_doc_grams``: per row,
    the DISTINCT word ``n``-gram 60-bit hex hashes as ``_g:
    array<string>`` — hashlib md5 over ``_py_tokens`` shingles instead
    of the interpreted HOF chain. Same values as
    ``array_distinct(transform(shingles, md5-substr))`` (set-equal; the
    array is only ever exploded, so element order is immaterial)."""
    import hashlib

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField("_g", ArrayType(StringType()))]
    )

    def run(batches):
        md5 = hashlib.md5
        for pdf in batches:
            grams = []
            for t in pdf[text_col].tolist():
                toks = [w.encode("utf-8") for w in _py_tokens(t)]
                if len(toks) < n:
                    grams.append([])
                    continue
                grams.append(
                    list(
                        {
                            md5(b" ".join(toks[i : i + n])).hexdigest()[:15]
                            for i in range(len(toks) - n + 1)
                        }
                    )
                )
            yield pdf.assign(_g=grams)

    return df.mapInPandas(run, out_schema)


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    broadcast_eval: bool = True,
    engine_exact: bool = True,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, count the
    DISTINCT word ``n``-grams it shares with an evaluation set and flag
    documents at or above ``min_overlap`` — the contamination check a
    training pipeline runs before shipping data (the classic setup uses
    8-13-gram overlap against held-out benchmarks).

    Plan shape: both sides tokenize once behind a generator barrier,
    shingle, and reduce each n-gram to the portable 60-bit hex hash
    (15 bytes on the wire instead of the ~50-byte gram string). The
    eval side collapses to one globally-distinct hash column — eval
    sets are benchmark-sized, so it is broadcast by default and the
    corpus side never shuffles its gram stream for the probe; the only
    shuffle is the per-doc count of matches (hits only, usually a tiny
    fraction of the corpus). Set ``broadcast_eval=False`` if the eval
    set is itself corpus-scale. Hashing on BOTH engines (the oracle
    applies the identical md5-substr) keeps the count identical even in
    the astronomically-unlikely collision case.

    ``engine_exact=True`` (default) hashes grams with the pure-builtin
    HOF chain (the oracle-reference algorithm); ``False`` swaps BOTH
    sides' gram hashing for :func:`_gram_hashes_arrow` (hashlib in C) —
    value-identical hex hashes, same join/count plan, ~4× less CPU on
    the gram stream (the dominant cost at a 10× growing-vocab
    rehearsal)."""
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    def _doc_grams(df: DataFrame) -> DataFrame:
        if not engine_exact:
            return _gram_hashes_arrow(fan_out(df), text_col, n)
        sh = shingles_of(tokens(F.col(text_col)), n)
        return materialize(
            fan_out(df),
            _g=F.array_distinct(
                F.transform(sh, lambda s: F.substring(F.md5(s), 1, 15))
            ),
        )

    eval_grams = (
        _doc_grams(eval_df).select(F.explode("_g").alias("g")).distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    hits = (
        _doc_grams(corpus)
        .select(F.col(key_col), F.explode("_g").alias("g"))
        .join(eval_grams, "g")
        .groupBy(key_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        corpus.select(key_col)
        .join(hits, key_col, "left")
        .withColumn(
            "n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint")
        )
        .withColumn("contaminated", F.col("n_overlap") >= min_overlap)
    )


def eval_gram_hashes(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> list[str]:
    """Batch prepass: the distinct portable 60-bit (15-hex-char) gram
    hashes of the evaluation set, as a driver-side list.

    Eval sets are benchmark-sized (thousands of documents), so their
    distinct gram set is MBs, not GBs — the identical smallness
    assumption under ``ngram_contamination(broadcast_eval=True)``; this
    materializes the same set once so a long-lived session (or a
    stream) can probe it map-side without re-deriving it per run. For
    a corpus-scale eval set, decontaminate with the join plan instead.
    """
    from sensomics_data_pipeline_spark.util import fan_out

    grams = (
        _gram_hashes_arrow(fan_out(eval_df), text_col, n)
        .select(F.explode("_g").alias("g"))
        .distinct()
    )
    return [r.g for r in grams.collect()]


#: eval gram sets are pure functions of (corpus location, source
#: filter, text column, n) and benchmark-sized by assumption — the
#: production pattern is compute-once-per-refresh, probe-many
#: (contamination_probe's broadcast contract). Keyed by applicationId
#: so a dead session's entries can never leak into a new one; small
#: LRU for the multi-sf-dir harness pattern (bench warms at sf0.001
#: and times at sf0.1).
_EVAL_GRAM_MEMO: dict = {}
_EVAL_GRAM_MEMO_MAX = 8


def eval_gram_hashes_cached(
    eval_df: DataFrame,
    cache_key,
    text_col: str = "text",
    n: int = 8,
) -> list[str]:
    """Memoized :func:`eval_gram_hashes`. ``cache_key`` must identify
    the eval-set DEFINITION (e.g. ``(sf_dir, source)``) — the caller
    owns that contract, exactly like a static-side refresh owns
    deciding when thresholds are stale. One gram-set job per
    (application, definition); every later consumer — the corpus
    pipeline memo, the streaming ingest's broadcast probe, repeat
    bench runs — reuses the driver-side list."""
    spark = eval_df.sparkSession
    key = (spark.sparkContext.applicationId, cache_key, text_col, n)
    hit = _EVAL_GRAM_MEMO.get(key)
    if hit is not None:
        # true LRU: a hit refreshes recency (dicts preserve insertion
        # order, so re-inserting moves the entry to the tail) — without
        # this, eviction is FIFO and a hot entry can be dropped while a
        # cold one survives
        _EVAL_GRAM_MEMO.pop(key)
        _EVAL_GRAM_MEMO[key] = hit
        return hit
    val = eval_gram_hashes(eval_df, text_col, n)
    while len(_EVAL_GRAM_MEMO) >= _EVAL_GRAM_MEMO_MAX:
        _EVAL_GRAM_MEMO.pop(next(iter(_EVAL_GRAM_MEMO)))
    _EVAL_GRAM_MEMO[key] = val
    return val


def contamination_probe(
    df: DataFrame,
    gram_hashes,
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Map-side decontamination against a PRECOMPUTED eval gram-hash
    set (:func:`eval_gram_hashes`): appends ``n_overlap`` (distinct
    shared grams) and ``contaminated`` to ``df`` in ONE fused Arrow
    pass — no eval-side job, no broadcast join, no hit-count shuffle.

    Value-identical to ``ngram_contamination(corpus, eval_df,
    engine_exact=False)`` when ``gram_hashes`` came from the same eval
    set (equivalence pytest-pinned): both reduce the corpus doc to its
    DISTINCT hashlib gram hashes and count membership. This is the
    production shape for a long-lived pipeline — the eval set is
    static, so it ships once per executor as a broadcast variable and
    every batch/run probes it at memory speed; the join plan in
    :func:`ngram_contamination` remains the right tool when the eval
    side is itself corpus-scale."""
    import hashlib

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from sensomics_data_pipeline_spark.util import fan_out

    src = fan_out(df)
    bc = src.sparkSession.sparkContext.broadcast(frozenset(gram_hashes))
    out_schema = StructType(
        list(src.schema.fields)
        + [
            StructField("n_overlap", LongType()),
            StructField("contaminated", BooleanType()),
        ]
    )
    text_i = [f.name for f in src.schema.fields].index(text_col)

    def run(batches):
        import pandas as pd

        md5 = hashlib.md5
        evset = bc.value
        for pdf in batches:
            overlaps = []
            for t in pdf.iloc[:, text_i]:
                toks = [w.encode("utf-8") for w in _py_tokens(t)]
                if len(toks) < n:
                    overlaps.append(0)
                    continue
                gs = {
                    md5(b" ".join(toks[i : i + n])).hexdigest()[:15]
                    for i in range(len(toks) - n + 1)
                }
                overlaps.append(sum(1 for g in gs if g in evset))
            ov = pd.Series(overlaps, dtype="int64")
            yield pdf.assign(
                n_overlap=ov, contaminated=ov >= int(min_overlap)
            )

    return src.mapInPandas(run, out_schema)


def duplicate_spans(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 16,
    min_docs: int = 2,
    engine_exact: bool = True,
) -> DataFrame:
    """Cross-document duplicated-span detection — the detection core of
    substring-level dedup (the regime whole-doc, near-dup, and
    paragraph dedup all miss: licence blocks, navigation chrome, and
    quoted passages repeated inside otherwise-unique documents; the
    training-data case for removing them is Lee et al., ACL 2022,
    "Deduplicating Training Data Makes Language Models Better").

    A span is a ``span_tokens``-word window at every token position
    (stride 1); it is DUPLICATED when its portable 60-bit hash occurs
    in ≥ ``min_docs`` distinct documents. One row per input document
    over the doc's DISTINCT span set:

    ``(key, n_spans, dup_spans, dup_span_frac)``

    Plan (2 shuffles, skew-safe): per-doc distinct span hashes are a
    map-side projection (builtin HOF chain; ``engine_exact=False``
    swaps in the hashlib Arrow kernel — identical hex values); the
    exploded (doc, hash) rows are already distinct, so one
    ``groupBy(hash).count()`` IS the document frequency with map-side
    partial aggregation — a boilerplate span hot across millions of
    documents moves per-partition COUNTS, never a posting list. The
    (hash, df) side joins back and reduces per document. Documents
    with no span (short/NULL text) surface as ``n_spans = 0`` /
    ``dup_span_frac = 0.0`` on both engines.
    """
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    if engine_exact:
        sh = shingles_of(tokens(F.col(text_col)), span_tokens)
        grams = materialize(
            fan_out(df),
            _g=F.array_distinct(
                F.transform(sh, lambda s: F.substring(F.md5(s), 1, 15))
            ),
        )
    else:
        grams = _gram_hashes_arrow(fan_out(df), text_col, span_tokens)
    rows = grams.select(F.col(key_col), F.explode("_g").alias("g"))
    doc_freq = rows.groupBy("g").agg(F.count("*").alias("_df"))
    per_doc = (
        rows.join(doc_freq, "g")
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("_df") >= min_docs, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_spans"),
        )
    )
    ns = F.coalesce(F.col("n_spans"), F.lit(0).cast("bigint"))
    ds = F.coalesce(F.col("dup_spans"), F.lit(0).cast("bigint"))
    return (
        df.select(key_col)
        .join(per_doc, key_col, "left")
        .select(
            key_col,
            ns.alias("n_spans"),
            ds.alias("dup_spans"),
            F.round(
                F.when(ns > 0, ds.cast("double") / ns).otherwise(F.lit(0.0))
                + 0.0,
                6,
            ).alias("dup_span_frac"),
        )
    )


def _pos_gram_arrow(
    df: DataFrame, key_col: str, text_col: str, n: int
) -> DataFrame:
    """Arrow twin of ``remove_duplicate_spans``' substrate projection:
    per row, the token array AND the POSITION-INDEXED span-hash array
    (one 60-bit hex hash per token position, stride 1 — unlike
    ``_gram_hashes_arrow`` the output is ordered and NOT
    deduplicated, because the consumer needs span positions to map
    hashes back to covered token indices). hashlib md5 in C over
    ``_py_tokens`` replicas — bit-identical to the builtin HOF chain
    (equivalence pinned in tests/test_operators.py)."""
    import hashlib

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("_k", df.schema[key_col].dataType),
            StructField("_toks", ArrayType(StringType())),
            StructField("_gs", ArrayType(StringType())),
        ]
    )

    def run(batches):
        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            toks_out, gs_out = [], []
            for t in pdf[text_col]:
                toks = _py_tokens(t)
                bs = [w.encode("utf-8") for w in toks]
                toks_out.append(toks)
                gs_out.append(
                    [
                        md5(b" ".join(bs[i : i + n])).hexdigest()[:15]
                        for i in range(len(toks) - n + 1)
                    ]
                )
            yield pd.DataFrame(
                {
                    "_k": pdf[key_col].reset_index(drop=True),
                    "_toks": toks_out,
                    "_gs": gs_out,
                }
            )

    return (
        df.select(key_col, text_col)
        .mapInPandas(run, out_schema)
        .withColumnRenamed("_k", key_col)
    )


def remove_duplicate_spans(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 16,
    min_docs: int = 2,
    engine_exact: bool = True,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL — the training-data payoff
    of :func:`duplicate_spans` (Lee et al., ACL 2022: excising repeated
    substrings, not just dropping whole near-dup documents, is what
    moves LM quality). A token is removed when ANY ``span_tokens``-word
    window covering it occurs in ≥ ``min_docs`` distinct documents
    (same span hash + doc-frequency definition as the detector);
    surviving tokens are re-joined with single spaces.

    One row per input document::

        (key, n_tokens, kept_tokens, removed_tokens, clean_text)

    with the token-conservation invariant
    ``kept_tokens + removed_tokens = n_tokens`` (oracle-checked).

    Plan — strictly LINEAR in total tokens, no per-doc quadratic step
    (an ``exists`` HOF over per-doc dup positions would be O(tokens ×
    dup-positions) on boilerplate-heavy documents):

    1. substrate: per doc the token array and the position-indexed
       span-hash array, computed ONCE behind a generator barrier
       (``engine_exact=False`` swaps in the hashlib Arrow kernel
       :func:`_pos_gram_arrow` — identical values);
    2. duplicated hash set: map-side ``array_distinct`` → explode →
       ``groupBy(hash).count()`` (distinct-doc frequency with map-side
       partials — a boilerplate span moves per-partition counts, never
       a posting list) → filter ``≥ min_docs``;
    3. covered token indices: position-exploded spans equi-joined to
       the dup set (1:1 output with spans — AQE-splittable if a hash
       is hot), each emitting its ``span_tokens`` covered indices;
       NOT deduplicated — the anti-join below is set-semantics anyway,
       so the dedup shuffle is skipped;
    4. kept tokens: position-exploded tokens LEFT ANTI join covered on
       (doc, index) — high-cardinality composite key, skew-free;
    5. rebuild: ``groupBy(doc)`` sorting the surviving (index, token)
       structs, ``array_join`` with spaces; docs that lost everything
       (or had no tokens) surface with ``clean_text = ''``.
    """
    from sensomics_data_pipeline_spark.util import fan_out, materialize

    if engine_exact:
        toks_c = F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        )
        base = materialize(fan_out(df), _toks=toks_c)
        base = materialize(
            base,
            _gs=F.transform(
                shingles_of(F.col("_toks"), span_tokens),
                lambda s: F.substring(F.md5(s), 1, 15),
            ),
        ).select(key_col, "_toks", "_gs")
    else:
        base = _pos_gram_arrow(fan_out(df), key_col, text_col, span_tokens)

    dup = (
        base.select(F.explode(F.array_distinct("_gs")).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= int(min_docs))
        .select("g")
    )
    spans = base.select(
        key_col, F.posexplode("_gs").alias("_i", "g")
    )
    covered = spans.join(dup, "g").select(
        key_col,
        F.explode(
            F.sequence(F.col("_i"), F.col("_i") + F.lit(span_tokens - 1))
        ).alias("_idx"),
    )
    toks_pos = base.select(
        key_col, F.posexplode("_toks").alias("_idx", "_tok")
    )
    kept = toks_pos.join(covered, [key_col, "_idx"], "left_anti")
    rebuilt = kept.groupBy(key_col).agg(
        F.count("*").alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_tok"))),
                lambda x: x["_tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    nt = F.coalesce(F.col("n_tokens"), F.lit(0).cast("int")).cast("bigint")
    kt = F.coalesce(F.col("kept_tokens"), F.lit(0).cast("bigint"))
    return (
        base.select(key_col, F.size("_toks").alias("n_tokens"))
        .join(rebuilt, key_col, "left")
        .select(
            key_col,
            nt.alias("n_tokens"),
            kt.alias("kept_tokens"),
            (nt - kt).alias("removed_tokens"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def build_gram_bloom(
    gram_hashes, bits_per_gram: int = 16
) -> tuple:
    """Driver-side Bloom filter over an eval set's 60-bit gram hashes
    (:func:`eval_gram_hashes` output): returns ``(words, m_mask, k)``
    where ``words`` is a packed uint64 bit array of ``m`` bits
    (``m`` = next power of two ≥ ``bits_per_gram × n_grams``) and
    ``k`` ≈ ``ln2 · bits_per_gram`` double-hashed probes per gram.

    The 100-TB point: :func:`contamination_probe` broadcasts the exact
    gram SET (~50 B/gram as a Python frozenset entry); at 16 bits/gram
    the Bloom bits are ~25× smaller, so an eval suite two orders of
    magnitude larger still ships to every executor as a few MB. The
    price is one-sided: a Bloom filter can only FALSE-POSITIVE — every
    truly contaminated document is still flagged (the invariant the
    ``bloom_decon_invariants`` oracle pins at zero), and false hits
    only quarantine extra docs, never leak eval data into training.

    Probes use double hashing off the (well-mixed) md5-prefix value:
    ``pos_i = (h1 + i·h2) mod m`` with ``h2`` forced odd (coprime with
    the power-of-two ``m``) — fully deterministic, no seeds.
    """
    import numpy as np

    vs = np.array([int(g, 16) for g in gram_hashes], dtype=np.uint64)
    n = max(1, vs.size)
    m = 1 << max(6, int(np.ceil(np.log2(bits_per_gram * n))))
    mask = np.uint64(m - 1)
    k = max(1, int(round(0.6931 * bits_per_gram)))
    words = np.zeros(m >> 6, dtype=np.uint64)
    h1 = vs & mask
    h2 = (((vs >> np.uint64(27)) << np.uint64(1)) | np.uint64(1)) & mask
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    return words, int(mask), int(k)


def bloom_contamination_probe(
    df: DataFrame,
    bloom: tuple,
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    exact_gram_hashes=None,
) -> DataFrame:
    """Map-side decontamination against a :func:`build_gram_bloom`
    filter: appends ``n_bloom_overlap`` (distinct grams whose Bloom
    probe hits) and ``bloom_contaminated`` in one fused Arrow pass —
    the :func:`contamination_probe` plan shape (no eval-side job, no
    join, no shuffle) with the broadcast state ~25× smaller.

    ``exact_gram_hashes`` (optional, the same list the Bloom was built
    from) additionally emits the EXACT ``n_overlap`` / ``contaminated``
    columns from the same fused pass — the certification shape: both
    membership structures probe one shared distinct-gram set per doc,
    so the bloom-vs-exact comparison needs no second scan and no join.

    Deterministic one-sided guarantee (certified by the full-hash
    ``bloom_decon_invariants`` twin): for every document,
    ``n_bloom_overlap ≥ n_overlap`` (exact), and every exactly
    contaminated document is bloom-flagged — Bloom filters admit no
    false negatives."""
    import hashlib

    import numpy as np
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from sensomics_data_pipeline_spark.util import fan_out

    src = fan_out(df)
    words, m_mask, k = bloom
    with_exact = exact_gram_hashes is not None
    bc = src.sparkSession.sparkContext.broadcast(
        (
            words.tobytes(),
            m_mask,
            k,
            frozenset(exact_gram_hashes) if with_exact else None,
        )
    )
    extra = [
        StructField("n_bloom_overlap", LongType()),
        StructField("bloom_contaminated", BooleanType()),
    ]
    if with_exact:
        extra += [
            StructField("n_overlap", LongType()),
            StructField("contaminated", BooleanType()),
        ]
    out_schema = StructType(list(src.schema.fields) + extra)
    text_i = [f.name for f in src.schema.fields].index(text_col)

    def run(batches):
        import pandas as pd

        md5 = hashlib.md5
        wbytes, mask_i, kk, evset = bc.value
        w = np.frombuffer(wbytes, dtype=np.uint64)
        mask = np.uint64(mask_i)
        for pdf in batches:
            overlaps = []
            exacts = []
            for t in pdf.iloc[:, text_i]:
                toks = [x.encode("utf-8") for x in _py_tokens(t)]
                if len(toks) < n:
                    overlaps.append(0)
                    exacts.append(0)
                    continue
                gs = {
                    md5(b" ".join(toks[i : i + n])).hexdigest()[:15]
                    for i in range(len(toks) - n + 1)
                }
                vs = np.fromiter(
                    (int(g, 16) for g in gs), dtype=np.uint64, count=len(gs)
                )
                h1 = vs & mask
                h2 = (
                    ((vs >> np.uint64(27)) << np.uint64(1)) | np.uint64(1)
                ) & mask
                ok = np.ones(vs.size, dtype=bool)
                for i in range(kk):
                    pos = (h1 + np.uint64(i) * h2) & mask
                    ok &= (
                        w[(pos >> np.uint64(6)).astype(np.int64)]
                        >> (pos & np.uint64(63))
                    ) & np.uint64(1) == np.uint64(1)
                overlaps.append(int(ok.sum()))
                if evset is not None:
                    exacts.append(sum(1 for g in gs if g in evset))
            ov = pd.Series(overlaps, dtype="int64")
            out = pdf.assign(
                n_bloom_overlap=ov, bloom_contaminated=ov >= int(min_overlap)
            )
            if evset is not None:
                ex = pd.Series(exacts, dtype="int64")
                out = out.assign(
                    n_overlap=ex, contaminated=ex >= int(min_overlap)
                )
            yield out

    return src.mapInPandas(run, out_schema)


#: PII surface patterns — RE2-compatible (no lookaround), so the DuckDB
#: oracle evaluates the IDENTICAL regex; email before phone so the
#: digits in a redacted email can't re-match as a phone number.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d[\d().-]{7,}\d"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", replacement: str = "[PII]"
) -> DataFrame:
    """Training-data PII scrubbing: redact emails / IPv4s / phone-like
    digit runs with ``replacement`` and count redactions per kind.

    All-codegen: one ``regexp_extract_all`` size per kind (count before
    redaction) and a chained ``regexp_replace`` — no Python in the hot
    path, linear per row, embarrassingly parallel at any scale. The
    pattern set is deliberately RE2-compatible so an independent engine
    (the DuckDB oracle) applies byte-identical semantics."""
    out = df
    scrubbed = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
        )
        scrubbed = F.regexp_replace(scrubbed, pat, replacement)
    return out.withColumn("scrubbed_text", scrubbed)


def _char_diversity_arrow(df: DataFrame, text_col: str) -> DataFrame:
    """Arrow fast path for :func:`char_diversity`: numpy codepoint
    count per document inside ``mapInPandas`` — ~2 orders of magnitude
    less CPU than the interpreted higher-order fold (which walks an
    ``array_sort`` of every character through an interpreted
    ``aggregate``), with the SAME bit-exact results:

    - the integer signals (``n_chars_exact``, ``n_distinct_chars``,
      ``char_coll``) are exact integers in both algorithms;
    - ``collision_prob`` replicates Spark's ``F.round(x, 6)`` exactly:
      Spark rounds via ``BigDecimal.valueOf(double)`` — i.e. HALF_UP on
      the SHORTEST decimal representation (``Double.toString``), not on
      the exact binary expansion — and Python's ``repr(float)`` is the
      same shortest round-trip decimal, so
      ``Decimal(repr(x)).quantize(6, ROUND_HALF_UP)`` agrees bit-for-
      bit (using ``Decimal(x)`` directly instead flips the last digit
      on ~0.1% of docs whose quotient sits just below a 6-decimal tie;
      caught by the full-table equivalence test);
    - empty/NULL text pins to (0, 0, 0, NULL) like the exact path
      (``Float64`` nullable dtype so NULL survives Arrow, not NaN).

    Still zero-shuffle and embarrassingly parallel; the equivalence is
    pinned by a full-table comparison test against the fold path."""
    import numpy as np
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_chars_exact", LongType()),
            StructField("n_distinct_chars", LongType()),
            StructField("char_coll", LongType()),
            StructField("collision_prob", DoubleType()),
        ]
    )
    quantum = Decimal("0.000001")

    def fold(batches):
        for pdf in batches:
            k = len(pdf)
            n_chars = np.zeros(k, dtype=np.int64)
            n_dist = np.zeros(k, dtype=np.int64)
            coll = np.zeros(k, dtype=np.int64)
            prob = np.full(k, pd.NA, dtype=object)
            for i, t in enumerate(pdf[text_col].tolist()):
                if not isinstance(t, str) or not t:
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                )
                counts = np.unique(codes, return_counts=True)[1].astype(
                    np.int64
                )
                n = len(codes)
                sq = int((counts * counts).sum())
                n_chars[i] = n
                n_dist[i] = len(counts)
                coll[i] = sq
                prob[i] = float(
                    Decimal(repr(sq / (n * n))).quantize(
                        quantum, rounding=ROUND_HALF_UP
                    )
                )
            yield pdf.assign(
                n_chars_exact=n_chars,
                n_distinct_chars=n_dist,
                char_coll=coll,
                collision_prob=pd.array(prob, dtype="Float64"),
            )

    return df.mapInPandas(fold, out_schema)


def _lexical_counts_arrow(df: DataFrame, text_col: str) -> DataFrame:
    """Arrow twin of ``lexical_stats``' count kernel: per row the exact
    BIGINT (n_words, Σc², n_types, max_freq) via ``Counter`` instead of
    the interpreted sorted fold — same integers, and the ratio /
    rounding arithmetic stays in the shared Spark expressions, so the
    full column set is bit-identical (equivalence test)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(c, T.LongType())
            for c in ("_lx_n", "_lx_sq", "_lx_types", "_lx_maxr")
        ]
    )

    def run(batches):
        from collections import Counter

        for pdf in batches:
            ns, sqs, tys, mxs = [], [], [], []
            for t in pdf[text_col]:
                toks = _py_tokens(t)
                c = Counter(toks)
                ns.append(len(toks))
                sqs.append(sum(v * v for v in c.values()))
                tys.append(len(c))
                mxs.append(max(c.values()) if c else 0)
            yield pdf.assign(
                _lx_n=ns, _lx_sq=sqs, _lx_types=tys, _lx_maxr=mxs
            )

    from sensomics_data_pipeline_spark.util import fan_out

    return fan_out(df).mapInPandas(run, out_schema)


def lexical_stats(
    df: DataFrame, text_col: str = "text", engine_exact: bool = True
) -> DataFrame:
    """Word-level lexical diversity signals (the token-grain sibling of
    :func:`char_diversity`): per document the type count (distinct
    words), the top-word multiplicity, and the word-collision
    probability ``Σ c_w² / n²`` (Rényi-2 over the word distribution) —
    plus the derived type-token ratio and top-word fraction that
    quality filters like Gopher/RefinedWeb threshold on ("fraction of
    the doc that is its most common word").

    All multiplicities come from ONE sorted run-length fold per row
    (``array_sort`` + ``aggregate``), so the plan is a pure zero-shuffle
    projection — no explode → groupBy(doc, word) that would shuffle the
    whole token stream at 100 TB. Counters are exact BIGINTs; only the
    three ratios are rounded doubles (single IEEE divisions of exactly
    representable integers — engine-reproducible).

    Empty/NULL text is pinned to (0, 0, 0, NULL, NULL, NULL) on both
    engines, per the repo's degenerate-text convention.

    ``engine_exact=False`` swaps the fold for
    :func:`_lexical_counts_arrow` (``Counter`` in C) — bit-identical
    output, used on the bench path (the interpreted fold is the
    query's dominant cost)."""
    if not engine_exact:
        pre = _lexical_counts_arrow(df, text_col)
        n = F.col("_lx_n")
        zl = F.lit(0).cast("long")
        nd = n.cast("double")
        return pre.select(
            *[c for c in df.columns],
            n.alias("n_words"),
            F.when(n > 0, F.col("_lx_types")).otherwise(zl).alias("n_types"),
            F.when(n > 0, F.col("_lx_maxr")).otherwise(zl).alias("max_freq"),
            F.when(
                n > 0, F.round(F.col("_lx_types").cast("double") / nd, 6)
            ).alias("ttr"),
            F.when(
                n > 0, F.round(F.col("_lx_maxr").cast("double") / nd, 6)
            ).alias("top_frac"),
            F.when(
                n > 0,
                F.round(
                    F.col("_lx_sq").cast("double") / (n * n).cast("double"), 6
                ),
            ).alias("word_coll_prob"),
        )
    ws = tokens(text_col)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("sq"),
        F.lit(0).cast("long").alias("types"),
        F.lit(0).cast("long").alias("maxr"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x.eqNullSafe(acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (
                acc["sq"]
                + F.when(same, 2 * acc["run"] + 1)
                .otherwise(F.lit(1))
                .cast("long")
            ).alias("sq"),
            (
                acc["types"]
                + F.when(same, F.lit(0)).otherwise(F.lit(1)).cast("long")
            ).alias("types"),
            F.greatest(acc["maxr"], run).alias("maxr"),
        )

    folded = F.aggregate(
        F.array_sort(ws),
        zero,
        step,
        lambda acc: F.struct(
            acc["sq"].alias("sq"),
            acc["types"].alias("types"),
            acc["maxr"].alias("maxr"),
        ),
    )
    n = F.coalesce(F.size(ws), F.lit(0)).cast("long")
    zl = F.lit(0).cast("long")
    nd = n.cast("double")
    return df.select(
        "*",
        n.alias("n_words"),
        F.when(n > 0, folded["types"]).otherwise(zl).alias("n_types"),
        F.when(n > 0, folded["maxr"]).otherwise(zl).alias("max_freq"),
        F.when(n > 0, F.round(folded["types"].cast("double") / nd, 6)).alias(
            "ttr"
        ),
        F.when(n > 0, F.round(folded["maxr"].cast("double") / nd, 6)).alias(
            "top_frac"
        ),
        F.when(
            n > 0, F.round(folded["sq"].cast("double") / (n * n).cast("double"), 6)
        ).alias("word_coll_prob"),
    )


def char_diversity(
    df: DataFrame, text_col: str = "text", engine_exact: bool = True
) -> DataFrame:
    """Character-diversity quality signal (gibberish / low-entropy
    detection): per document, the collision probability of two random
    character draws — ``Σ c_i² / n²`` over character multiplicities
    ``c_i`` — which is the Rényi-2 (collision) entropy in probability
    form: ``H₂ = -log₂(collision_prob)``. Flat repeated filler
    (``"aaaa…"``) scores → 1, diverse prose scores → 1/alphabet. The
    numerator ``Σ c_i²`` is emitted as an exact BIGINT so the signal
    is integer-exact and engine-reproducible; only the final ratio is
    a rounded double (sign-normalized with ``+ 0.0``).

    Zero shuffle, like ``repetition_signals``: characters are folded
    per row with one ``array_sort`` + ``aggregate`` pass (run length r
    extends ⇒ Σc² grows by (r+1)²−r² = 2r+1; new run ⇒ +1), instead of
    an explode → groupBy(doc, char) plan that would shuffle the entire
    character stream at 100 TB.

    Two engines, same bits: ``engine_exact=True`` (default) is the
    pure-builtin fold above — the oracle-reference algorithm;
    ``engine_exact=False`` routes to :func:`_char_diversity_arrow`,
    a numpy ``mapInPandas`` fast path (the interpreted HOF fold is
    ~100× the CPU of a vectorized character count — measured 2.8 s
    for 5k docs at sf0.1) that reproduces every column bit-exactly
    (equivalence pinned by a full-table test).
    """
    if not engine_exact:
        return _char_diversity_arrow(df, text_col)
    chars = F.split(F.col(text_col), "")
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("sq"),
        F.lit(0).cast("long").alias("n_distinct"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x.eqNullSafe(acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        sq = acc["sq"] + F.when(same, 2 * acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            sq.alias("sq"),
            (
                acc["n_distinct"]
                + F.when(same, F.lit(0)).otherwise(F.lit(1)).cast("long")
            ).alias("n_distinct"),
        )

    folded = F.aggregate(
        F.array_sort(chars),
        zero,
        step,
        lambda acc: F.struct(
            acc["sq"].alias("sq"), acc["n_distinct"].alias("n_distinct")
        ),
    )
    # Empty/NULL text is pinned EXPLICITLY to (0, 0, 0, NULL): Spark's
    # split("", "") yields [""] (one sentinel element, folding to 1/1)
    # and split(NULL, ...) yields NULL (folding to NULL), while SQL
    # engines differ on whether unnest(string_split(...)) emits a row
    # for either — so both degenerate cases are overridden before the
    # fold result is exposed, and the oracle SQL mirrors the same rule.
    n = F.coalesce(F.length(text_col), F.lit(0)).cast("long")
    zero_long = F.lit(0).cast("long")
    return df.select(
        "*",
        n.alias("n_chars_exact"),
        F.when(n > 0, folded["n_distinct"])
        .otherwise(zero_long)
        .alias("n_distinct_chars"),
        F.when(n > 0, folded["sq"]).otherwise(zero_long).alias("char_coll"),
        (
            F.when(
                n > 0,
                F.round(
                    folded["sq"].cast("double") / (n * n).cast("double"), 6
                )
                + F.lit(0.0),
            )
        ).alias("collision_prob"),
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    lowercase: bool = False,
    strip_accents: bool = False,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Unicode text normalization — the canonicalization pass that runs
    BEFORE hashing/dedup/tokenization so that visually-identical texts
    ('é' precomposed vs 'e'+combining-acute) hash identically: NFC/NFKC
    (``form``), optional full-Unicode lowercase, accent stripping
    (NFD → drop combining marks → recompose, utf8proc-compatible) and
    whitespace collapsing (runs → single space, trimmed).

    Arrow ``mapInPandas`` kernel (``unicodedata`` is C): a per-row
    string rewrite with no relational structure is exactly the
    sanctioned escape-hatch shape (SURVEY.md §2.11) — no shuffle, scans
    stream through. Cross-engine agreement with DuckDB's
    ``nfc_normalize``/``strip_accents``/``lower`` is pinned by tests on
    adversarial unicode (combining marks, ligatures, full-width forms).
    """
    import re as _re
    import unicodedata

    from pyspark.sql.types import StringType, StructField, StructType

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out = out_col or text_col
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != out]
        + [StructField(out, StringType(), True)]
    )
    ws = _re.compile(r"\s+")

    def _one(t, _form=form, _lower=lowercase, _strip=strip_accents,
             _collapse=collapse_whitespace):
        if t is None:
            return None
        s = unicodedata.normalize(_form, t)
        if _strip:
            s = unicodedata.normalize(
                "NFC",
                "".join(
                    c
                    for c in unicodedata.normalize("NFD", s)
                    if not unicodedata.combining(c)
                ),
            )
        if _lower:
            s = s.lower()
        if _collapse:
            s = ws.sub(" ", s).strip()
        return s

    def run(batches):
        for pdf in batches:
            vals = [_one(t) for t in pdf[text_col].tolist()]
            if out in pdf.columns:
                pdf = pdf.drop(columns=[out])
            pdf[out] = vals
            yield pdf[[f.name for f in out_schema.fields]]

    return df.mapInPandas(run, out_schema)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    round_decimals: int = 6,
) -> DataFrame:
    """Pointwise-mutual-information collocation extraction over
    adjacent token bigrams (Church & Hanks 1990, the classic
    collocation statistic): ``pmi(a,b) = ln(p(a,b) / (p(a)p(b)))``
    with bigram probability from the corpus bigram total and unigram
    probabilities from the corpus token total. The staple phrase-miner
    a training-data pipeline runs before vocabulary decisions
    (multi-word entities, boilerplate phrases, domain jargon).

    Plan: ONE tokenize pass materialized (lazy checkpoint), from which
    both count tables derive — unigrams via token explode, bigrams via
    the adjacent-pair transform (the BPE pair-explode shape). Counts
    shuffle on the token/bigram key (vocabulary-bounded, not
    corpus-bounded); the two corpus totals ride along as 1-row
    aggregates cross-joined back (no driver collect). Adjacency-only
    pairs keep the explosion at exactly ``tokens-1`` rows per document
    — no window-k blowup. The unigram join is a plain equi-join:
    Catalyst broadcasts while the vocabulary fits and falls back to
    shuffle when it doesn't.

    Output: ``(a, b, n_ab, pmi)`` for bigrams with ``n_ab >=
    min_count``; pmi rounded for engine-exact comparison (ln is the
    one libm call — same precedent as BM25's idf).
    """
    toks = df.select(tokens(text_col).alias("_toks")).localCheckpoint(
        eager=False
    )
    uni = (
        toks.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, greatest(size(_toks)-1, 0)),"
                    " (t, i) -> struct(t AS a, element_at(_toks, i+2) AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    stats = (
        uni.agg(F.sum("c_w").alias("_n_uni"))
        .withColumn("_k", F.lit(0))
        .join(bi.agg(F.sum("n_ab").alias("_n_bi")).withColumn("_k", F.lit(0)), "_k")
    )
    scored = (
        bi.filter(F.col("n_ab") >= min_count)
        .join(uni.select(F.col("w").alias("a"), F.col("c_w").alias("_ca")), "a")
        .join(uni.select(F.col("w").alias("b"), F.col("c_w").alias("_cb")), "b")
        .withColumn("_k", F.lit(0))
        .join(F.broadcast(stats), "_k")
    )
    pmi = F.log(
        (F.col("n_ab").cast("double") * F.col("_n_uni") * F.col("_n_uni"))
        / (F.col("_n_bi").cast("double") * F.col("_ca") * F.col("_cb"))
    )
    return scored.select(
        "a", "b", "n_ab", F.round(pmi, round_decimals).alias("pmi")
    )
