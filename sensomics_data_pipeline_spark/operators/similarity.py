"""Similarity search over embedding columns (north-star ops):
brute-force cosine top-k as the correctness baseline, random-hyperplane
LSH bucketing as the approximate scale path.

Scale design:
- The scoring loop is a vectorized numpy matmul inside ``mapInPandas``
  (Arrow batches, BLAS) against a broadcast index matrix — the classic
  "broadcast the small side" nearest-neighbor join. Per-row
  ``zip_with``/``aggregate`` expressions exist for expression-level use
  (``cosine``) but allocate per pair and lose to BLAS by ~100× in the
  all-pairs loop.
- When the index side outgrows a broadcast (≫ millions of vectors),
  ``lsh_topk`` buckets both sides by hyperplane sign pattern and only
  scores within buckets — an equi-join, no cross product.
- Hyperplane weights are ±1 derived from the portable md5 hash, so an
  independent engine (the DuckDB oracle) reproduces the buckets exactly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def plane_weights(n_planes: int, dim: int, seed_base: int = 1) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights from the portable 60-bit md5
    hash: weight[p][i] = +1 if H(f"{seed_base+p}:{i}") is even else −1.
    Reproducible in any engine — the DuckDB oracle re-derives the same
    planes symbolically."""
    out = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed_base + p}:{i}".encode()).hexdigest()[:15], 16)
            row.append(1.0 if h % 2 == 0 else -1.0)
        out.append(row)
    return out


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed_base: int = 1
) -> Column:
    """Random-hyperplane LSH bucket id: bit p of the bucket is the sign
    of ``vec · w_p`` for the deterministic plane ``w_p``. Pure column
    expression (n_planes dot products, JVM-side)."""
    weights = plane_weights(n_planes, dim, seed_base)
    bucket = F.lit(0).cast("bigint")
    for p, w in enumerate(weights):
        proj = dot(vec, F.array(*[F.lit(x) for x in w]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def brute_force_topk(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for every vector, scored with numpy.

    The index (all vectors) is collected once and shipped to executors
    in the task closure (a few MB for ~100k×64 floats); each Arrow batch
    of queries scores against it with one float64 matmul and takes the
    top-k by (rounded cosine desc, neighbor id asc) — deterministic and
    oracle-reproducible. Beyond broadcastable index sizes, switch to
    ``lsh_topk``.
    """
    import numpy as np

    rows = df.select(key_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    order = np.argsort(ids)
    ids, mat, norms = ids[order], mat[order], norms[order]

    out_schema = "query_id long, neighbor_id long, cos_sim double, rank int"

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qids = pdf[key_col].to_numpy(dtype=np.int64)
            sims = (q @ mat.T) / (np.linalg.norm(q, axis=1)[:, None] * norms[None, :])
            sims = np.round(sims, 6)
            res = []
            for row_i, qid in enumerate(qids):
                s = sims[row_i]
                mask = ids != qid
                cand_ids = ids[mask]
                cand_s = s[mask]
                # top-k by (sim desc, id asc): lexsort on (-sim, id)
                sel = np.lexsort((cand_ids, -cand_s))[:k]
                for rank, j in enumerate(sel, start=1):
                    res.append((qid, cand_ids[j], cand_s[j], rank))
            yield pd.DataFrame(
                res, columns=["query_id", "neighbor_id", "cos_sim", "rank"]
            )

    return df.select(key_col, vec_col).mapInPandas(score, out_schema)


def cosine_near_dup_pairs(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: all (a < b) pairs with cosine ≥
    threshold. Scored like ``brute_force_topk`` (numpy matmul against a
    broadcast index); at index sizes beyond broadcast, reuse the LSH
    buckets to restrict candidates first."""
    import numpy as np

    rows = df.select(key_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    order = np.argsort(ids)
    ids, mat, norms = ids[order], mat[order], norms[order]

    out_schema = "vec_a long, vec_b long, cos_sim double"

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qids = pdf[key_col].to_numpy(dtype=np.int64)
            sims = np.round(
                (q @ mat.T)
                / (np.linalg.norm(q, axis=1)[:, None] * norms[None, :]),
                6,
            )
            res = []
            for row_i, qid in enumerate(qids):
                mask = (ids > qid) & (sims[row_i] >= threshold)
                for j in np.nonzero(mask)[0]:
                    res.append((qid, ids[j], sims[row_i][j]))
            yield pd.DataFrame(res, columns=["vec_a", "vec_b", "cos_sim"])

    return df.select(key_col, vec_col).mapInPandas(score, out_schema)


def lsh_topk(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 6,
    multi_probe: bool = True,
) -> DataFrame:
    """ANN cosine top-k: bucket by hyperplane sign pattern, exact cosine
    only within probed buckets — an equi-join replaces the all-pairs
    cross join, so candidate volume is n²/2^planes instead of n².

    ``multi_probe=True`` probes the query's own bucket plus every
    Hamming-1 bucket (one plane's sign flipped): near-neighbors that a
    single plane split off are recovered, multiplying recall at
    (n_planes+1)× candidate cost — the standard multi-probe LSH
    trade."""
    # pre-normalize once per vector: cosine then reduces to a single
    # dot product per candidate pair (vs 3 array reductions per pair)
    norm = l2_norm(F.col(vec_col))
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    bucketed = df.select(
        F.col(key_col).alias("vid"),
        unit.alias("vec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).persist()
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.expr(f"bucket ^ {1 << p}").cast("bigint")
                for p in range(n_planes)
            ],
        )
    else:
        probes = F.array(F.col("bucket"))
    a = bucketed.select(
        F.col("vid").alias("query_id"),
        F.explode(probes).alias("bucket"),
    )
    b = bucketed.select(F.col("vid").alias("neighbor_id"), "bucket")
    pairs = (
        a.join(b, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    va = bucketed.select(
        F.col("vid").alias("query_id"), F.col("vec").alias("_va"),
        F.col("bucket").alias("bucket"),
    )
    vb = bucketed.select(F.col("vid").alias("neighbor_id"), F.col("vec").alias("_vb"))
    scored = (
        pairs.join(va, "query_id")
        .join(vb, "neighbor_id")
        .withColumn("cos_sim", F.round(dot(F.col("_va"), F.col("_vb")), 6))
        .drop("_va", "_vb")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    n_iter: int = 3,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer (deterministic
    seeding: centroids initialized from the ``n_lists`` lowest vec ids),
    vectors assigned to nearest centroid list, queries probe the
    ``n_probe`` nearest lists only.

    The quantizer is trained driver-side on a sample (here: all rows —
    at 100 TB, a bounded sample) with numpy; assignment + probing are
    distributed. Deterministic end-to-end, but not SQL-oracle-checkable
    (iterative training) — covered by rows-only checks + pytest recall
    tests against ``brute_force_topk``.
    """
    import numpy as np

    rows = df.select(key_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1)[:, None]
    order = np.argsort(ids)
    ids, mat_n = ids[order], mat_n[order]

    cent = mat_n[:n_lists].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat_n @ cent.T, axis=1)
        for c in range(n_lists):
            members = mat_n[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    assign = np.argmax(mat_n @ cent.T, axis=1)

    out_schema = "query_id long, neighbor_id long, cos_sim double, rank int"

    def probe(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qids = pdf[key_col].to_numpy(dtype=np.int64)
            qn = q / np.linalg.norm(q, axis=1)[:, None]
            probe_lists = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
            res = []
            for row_i, qid in enumerate(qids):
                cand_mask = np.isin(assign, probe_lists[row_i]) & (ids != qid)
                cand_ids = ids[cand_mask]
                if not len(cand_ids):
                    continue
                sims = np.round(mat_n[cand_mask] @ qn[row_i], 6)
                sel = np.lexsort((cand_ids, -sims))[:k]
                for rank, j in enumerate(sel, start=1):
                    res.append((qid, cand_ids[j], sims[j], rank))
            yield pd.DataFrame(
                res, columns=["query_id", "neighbor_id", "cos_sim", "rank"]
            )

    return df.select(key_col, vec_col).mapInPandas(probe, out_schema)
