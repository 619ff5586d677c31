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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensomics_data_pipeline_spark.operators.text import word_shingles


def _hash_expr(col, seed: int | None = None):
    if seed is not None:
        col = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _hex_hash_expr(col):
    """15-char lowercase hex form of the portable 60-bit hash — same
    identity as ``_hash_expr`` (fixed-length hex is order- and
    equality-isomorphic to the bigint) but skips the conv(16,10) base
    conversion, which dominates hashing cost. Use wherever the hash is
    only a join/group key, never exposed."""
    return F.substring(F.md5(col), 1, 15)


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
        .select("doc_id", _hex_hash_expr(F.col("shingle")).alias("sh"))
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
    # the shingle set feeds sizes, the df-cap, and both join sides —
    # persist so the scan+shingle+hash runs once, not four times
    sets = shingle_sets(df, key_col, text_col, n).persist()
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


#: Mersenne prime 2^31−1 for the universal-hash family below.
MINHASH_P = 2_147_483_647


def minhash_seed_params(seed: int) -> tuple[int, int]:
    """Universal-hash coefficients for seed i: h_i(x) = (a·x + b) mod p
    with a odd and (a, b) < p — one base md5 hash per shingle feeds all
    k hash functions (the standard a·x+b MinHash family), instead of k
    md5 invocations per shingle."""
    return 2 * seed + 1, (104_729 * seed + 12_345) % MINHASH_P


def minhash_wide(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature as ONE array column per doc, computed entirely
    inside a codegen'd projection: shingle → one portable base hash
    (mod p) → k universal-hash minima. ZERO shuffles (the naive design
    explodes |shingles|·k rows through a groupBy). min over the shingle
    multiset equals min over the set, so no distinct pass either. Docs
    with < n tokens (no shingles) are dropped."""
    base = F.transform(
        word_shingles(F.col(text_col), n),
        lambda s: F.pmod(_hash_expr(s), F.lit(MINHASH_P)),
    )
    minima = []
    for seed in range(num_hashes):
        a, b = minhash_seed_params(seed)
        minima.append(
            F.array_min(
                F.transform(
                    F.col("_base"),
                    lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P)),
                )
            )
        )
    return (
        df.select(F.col(key_col).alias("doc_id"), base.alias("_base"))
        .filter(F.size("_base") > 0)
        .select("doc_id", F.array(*minima).alias("mhs"))
    )


def minhash_signatures(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Long-format (doc_id, seed, minhash) view of ``minhash_wide``."""
    return minhash_wide(df, key_col, text_col, n, num_hashes).select(
        "doc_id", F.posexplode("mhs").alias("seed", "minhash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    band_size: int = 4,
    num_hashes: int = 16,
) -> DataFrame:
    """LSH banding over wide signatures: slice the signature array into
    bands of ``band_size``, stringify each band, explode to
    (doc, band, band_sig), equi-join on (band, band_sig) — never an
    all-pairs scan. Input: ``minhash_wide`` output (doc_id, mhs).
    """
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice("mhs", i * band_size + 1, band_size),
                        lambda m: m.cast("string"),
                    ),
                ).alias("band_sig"),
            )
            for i in range(n_bands)
        ]
    )
    banded = signatures.select(
        "doc_id", F.explode(bands).alias("b")
    ).select("doc_id", "b.band", "b.band_sig")
    a = banded.alias("a")
    b = banded.alias("b")
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
    """Full MinHash+LSH near-dup pipeline: wide signatures → banded
    candidate pairs → estimated Jaccard (fraction of equal minhash
    positions, via one zip_with over the two signature arrays — no
    per-seed join)."""
    # signatures feed banding and both sides of the estimate join —
    # persist so the shingle hashing computes once
    sigs = minhash_wide(df, key_col, text_col, n, num_hashes).persist()
    pairs = lsh_candidate_pairs(sigs, band_size, num_hashes)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("mhs").alias("_ma"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("mhs").alias("_mb"))
    matches = F.size(
        F.filter(
            F.zip_with("_ma", "_mb", lambda x, y: x == y), lambda v: v
        )
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard", F.round(matches / F.lit(num_hashes), 6)
        )
        .select("doc_a", "doc_b", "est_jaccard")
    )


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
