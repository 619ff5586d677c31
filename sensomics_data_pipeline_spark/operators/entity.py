"""Entity resolution: fuzzy string matching and canonicalization
(north-star op, no reference analog — the record-linkage staple for
catalog/vendor/name tables).

Scale shape: matching runs on the DISTINCT value domain, not the row
domain — a 100-TB fact table usually carries a value domain orders of
magnitude smaller (names, vendors, SKUs), so the candidate join is
tiny after `distinct()`. Candidate generation reuses the repo's
binned-equi-join trick (``intervals.overlap_join``) on the LENGTH
dimension: strings within edit distance d differ in length by at most
d, so each string explodes into ``(len ± d) / bin_width`` length bins
and pairs meet in their first common bin — an equi-join, never a
cartesian. The exact ``levenshtein`` predicate then filters
candidates; both engines implement unit-cost edit distance, so pairs
are engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 2,
    bin_width: int = 4,
) -> DataFrame:
    """All unordered pairs of DISTINCT ``text_col`` values within
    ``max_dist`` edit distance: ``(name_a, name_b, dist)`` with
    ``name_a < name_b``.

    Plan: distinct → explode into length bins covering
    ``[len - max_dist, len + max_dist]`` → self-equi-join on the bin,
    keeping each pair once via its first common bin
    ``floor((greatest(len_a, len_b) - max_dist) / bin_width)`` (always
    common to both sides because ``|len_a - len_b| <= max_dist``) →
    length-window + ``levenshtein`` residual predicates. NULLs drop.
    """
    d = int(max_dist)
    w = int(bin_width)
    names = (
        df.select(F.col(text_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .withColumn("_len", F.length("name"))
    )
    binned = names.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((F.col("_len") - d) / w),
                F.floor((F.col("_len") + d) / w),
            )
        ),
    )
    a, b = binned.alias("a"), binned.alias("b")
    la, lb = F.col("a._len"), F.col("b._len")
    cond = (
        (F.col("a._bin") == F.col("b._bin"))
        & (F.col("a.name") < F.col("b.name"))
        & (F.abs(la - lb) <= d)
        # first-common-bin: dedups multi-bin pairs without a shuffle
        & (F.col("a._bin") == F.floor((F.greatest(la, lb) - d) / w))
        & (F.levenshtein(F.col("a.name"), F.col("b.name")) <= d)
    )
    return a.join(b, on=cond, how="inner").select(
        F.col("a.name").alias("name_a"),
        F.col("b.name").alias("name_b"),
        F.levenshtein(F.col("a.name"), F.col("b.name"))
        .cast("int")
        .alias("dist"),
    )


def resolve_entities(
    df: DataFrame,
    text_col: str,
    max_dist: int = 2,
    bin_width: int = 4,
) -> DataFrame:
    """Canonicalize fuzzy-duplicate values: fuzzy pairs → distributed
    connected components (``dedup.duplicate_clusters`` — pointer-
    jumping, O(log diameter) rounds) → every value mapped to its
    cluster's MINIMUM value as the canonical form. Returns
    ``(name, canonical_name)`` for every distinct input value
    (singletons map to themselves).

    Note transitivity: edit distance is not transitive, so a cluster
    may span more than ``max_dist`` end-to-end — the standard CC
    semantics of record linkage (same as MinHash dedup clusters).
    """
    from sensomics_data_pipeline_spark.operators.dedup import (
        duplicate_clusters,
    )

    pairs = fuzzy_match_pairs(df, text_col, max_dist, bin_width).select(
        F.col("name_a").alias("doc_a"), F.col("name_b").alias("doc_b")
    )
    # duplicate_clusters is id-type-agnostic (min-label propagation
    # works on strings); canonical_id is already the cluster minimum
    mapped = duplicate_clusters(pairs).select(
        F.col("doc_id").alias("name"),
        F.col("canonical_id").alias("canonical_name"),
    )
    names = (
        df.select(F.col(text_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
    )
    return names.join(mapped, "name", "left").select(
        "name",
        F.coalesce("canonical_name", "name").alias("canonical_name"),
    )
