"""Deduplication operators for training-data pipelines (north-star ops):
exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design: every variant avoids the O(n²) all-pairs comparison —
exact dedup is a hash groupBy; MinHash/LSH banding turns near-dup search
into an equi-join on band signatures; SimHash buckets on rotated
prefixes. The only quadratic step left is *within candidate buckets*,
which banding keeps tiny. All hashes are the portable 60-bit
``md5``-derived hash so results are engine-independent and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.operators.text import word_shingles


def _hash_expr(col, seed: int | None = None):
    if seed is not None:
        col = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_duplicates(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    only_dups: bool = True,
) -> DataFrame:
    """Exact dedup via content-hash groupBy: one shuffle on the 60-bit
    text hash, groups with >1 member are duplicate clusters
    (``only_dups=False`` returns every cluster — the dedup'd canonical
    mapping)."""
    hashed = df.select(
        F.col(key_col), _hash_expr(F.col(text_col)).alias("content_hash")
    )
    out = hashed.groupBy("content_hash").agg(
        F.count("*").alias("n_docs"),
        F.min(key_col).alias("canonical_id"),
    )
    return out.filter(F.col("n_docs") > 1) if only_dups else out


def shingle_sets(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exploded distinct (doc, shingle-hash) pairs — the common substrate
    for Jaccard and MinHash."""
    return (
        df.select(
            F.col(key_col).alias("doc_id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .select("doc_id", _hash_expr(F.col("shingle")).alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index:
    explode → self-equi-join on shingle hash → per-pair intersection
    count → |A∪B| = |A|+|B|−|A∩B|.

    The shingle join is the scale risk (hot shingles fan out
    quadratically) — ``max_df`` drops stop-shingles appearing in more
    than that many documents BEFORE the join, bounding every shingle's
    fan-out at max_df². Set sizes are computed before the cap so the
    Jaccard denominator stays exact; the intersection count is then a
    lower bound for pairs dominated by stop-shingles (documented
    approximation — MinHash/LSH below is the preferred scale path; this
    variant is the ground truth for its recall on non-degenerate
    corpora).
    """
    sets = shingle_sets(df, key_col, text_col, n)
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    if max_df is not None:
        rare = (
            sets.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("sh")
        )
        sets = sets.join(rare, "sh")
    a = sets.alias("a")
    b = sets.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures: k independent seeded hashes per shingle, min
    per (doc, seed). One explode + one groupBy — linear in total
    shingles. Empty-shingle docs drop out (no signature)."""
    sets = (
        df.select(
            F.col(key_col).alias("doc_id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )
    seeded = sets.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        "shingle",
    )
    hashed = seeded.select(
        "doc_id",
        "seed",
        _hash_expr(
            F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))
        ).alias("h"),
    )
    return hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    band_size: int = 4,
) -> DataFrame:
    """LSH banding: group the signature into bands of ``band_size``
    consecutive seeds; docs sharing any full band signature become
    candidate pairs. Equi-join on (band, band_signature) — never an
    all-pairs scan.
    """
    banded = signatures.withColumn("band", F.floor(F.col("seed") / band_size))
    band_sig = banded.groupBy("doc_id", "band").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seed", "minhash"))
                ),
                lambda s: s["minhash"].cast("string"),
            ),
        ).alias("band_sig")
    )
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures → banded candidate
    pairs → estimated Jaccard (fraction of matching minhashes)."""
    sigs = minhash_signatures(df, key_col, text_col, n, num_hashes)
    pairs = lsh_candidate_pairs(sigs, band_size)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), "seed", F.col("minhash").alias("mh_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), "seed", F.col("minhash").alias("mh_b")
    )
    est = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.avg((F.col("mh_a") == F.col("mh_b")).cast("double")), 6
            ).alias("est_jaccard")
        )
    )
    return est


def simhash(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash document signature: per-token 60-bit hash, bit-majority
    vote over the first ``bits`` bits → one integer signature per doc.
    Near-dups differ in few bits (Hamming distance).

    Plan: explode tokens → explode bit positions (``bits``× fan-out,
    constant) → signed vote sum per (doc, bit) → reassemble the integer
    with a bit-shift dot product. All built-ins.
    """
    from sensomics_data_pipeline_spark.operators.text import tokens

    tok = df.select(
        F.col(key_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    hashed = tok.select("doc_id", _hash_expr(F.col("token")).alias("h"))
    votes = (
        hashed.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
            "h",
        )
        .withColumn(
            "vote",
            F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
        ).alias("simhash")
    )
