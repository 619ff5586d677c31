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
    high; flooded punctuation / digits score low."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.3
        + (1 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.1
    )
    return feats.withColumn("quality_score", F.round(score, 6))


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


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles: join each sliding window of n tokens with a
    single space. Built-ins only: transform over index sequence +
    slice + array_join."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(0)))
    return F.when(
        k >= 1,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", shingle_n: int = 5
) -> DataFrame:
    """Rolling-hash document fingerprint: min and max 60-bit hash over
    the document's word 5-gram shingles (winnowing-lite). Equal
    fingerprints ⇒ near-identical prefix content; used as a cheap
    first-pass near-dup key."""
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
