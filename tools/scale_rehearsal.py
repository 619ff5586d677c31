#!/usr/bin/env python3
"""Scale rehearsal: measure how the text/dedup/corpus query family
scales from the driver's sf0.1 corpus (5k docs) to a synthetic 10x
replica (50k docs), reporting the wall-time slope per query.

The 10x corpus is built by replicating sf0.1 documents 10x with (a)
offset doc_ids and (b) a per-replica cyclic vocabulary rotation, so
replicas are NOT trivial exact duplicates of each other and posting
lists / near-dup structure stay realistic (each replica reproduces the
original corpus's internal duplicate structure in a disjoint token
space). Embedding queries are out of scope (documents-family only).

A near-1.0x-per-10x slope means driver-JVM fixed costs dominate; the
interesting signal is any query with slope >> 10 (super-linear = a
plan that will not survive a real scale-up).

Usage: python tools/scale_rehearsal.py [replicas] [out_md]
Writes a markdown table to docs/SCALE_r03.md by default.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/scale_rehearsal"

#: documents-family queries to rehearse (heaviest + every new r3 op)
QUERIES = [
    "exact_dedup",
    "token_stats",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "repetition_signals",
    "quality_gate",
    "vocab_topk",
    "tfidf_top_terms",
    "chunk_documents",
    "decontaminate",
    "minhash_lsh",
    "ngram_jaccard",
    "simhash",
    "simhash_pairs",
    "dedup_clusters",
    "paragraph_dedup",
    "domain_mix",
    "holdout_split",
    "stratified_sample",
    "pack_sequences",
    "char_diversity",
    "dedup_incremental",
    "corpus_pipeline",
]


def build_replica(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"{WORK}/sf1x{replicas}"
    marker = f"{out_dir}/documents.parquet"
    if os.path.exists(marker):
        return out_dir
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    vocab = [
        r[0]
        for r in docs.select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .collect()
    ]
    n_docs = docs.count()
    parts = []
    for r in range(replicas):
        # cyclic vocabulary rotation: word i -> word (i + r) mod |V|;
        # replica 0 is the original corpus
        mapping = dict(zip(vocab, vocab[r:] + vocab[:r]))
        rotated = F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w: F.element_at(
                    F.create_map(
                        *[F.lit(x) for kv in mapping.items() for x in kv]
                    ),
                    w,
                ),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
                rotated.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    big.repartition(32).write.mode("overwrite").parquet(marker)
    # the rehearsal queries only touch documents; link the other tables
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    return out_dir


def time_query(spark, fn, sf_dir: str, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
        spark.catalog.clearCache()
    return best


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r03.md"

    import __spark_entry__ as entrymod
    from sensomics_data_pipeline_spark.session import get_spark

    spark = get_spark("scale_rehearsal")
    big_dir = build_replica(spark, replicas)
    qs = entrymod.queries()

    rows = []
    for name in QUERIES:
        fn = qs[name]
        # warm both plans once (codegen JIT), then min-of-2 each
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        t1 = time_query(spark, fn, BASE)
        t10 = time_query(spark, fn, big_dir)
        slope = t10 / t1 if t1 > 0 else float("nan")
        rows.append((name, t1, t10, slope))
        print(
            f"{name:24s} 1x {t1:6.2f}s  {replicas}x {t10:7.2f}s  "
            f"slope {slope:5.2f}",
            flush=True,
        )

    with open(out_md, "w") as f:
        f.write(
            f"# Scale rehearsal — round 3\n\n"
            f"sf0.1 documents (5k docs) vs a {replicas}x replica "
            f"(50k docs, cyclic-vocabulary-rotated so replicas are not "
            f"exact duplicates), local[32], min-of-2 after a JIT warm "
            f"pass. `slope` = t({replicas}x)/t(1x); linear scaling at "
            f"{replicas}x data means slope <= {replicas} (fixed "
            f"per-job costs push it below; a slope well above "
            f"{replicas} would flag a plan that cannot survive a real "
            f"scale-up).\n\n"
        )
        f.write("| query | 1x (s) | " f"{replicas}x (s) | slope |\n")
        f.write("|---|---|---|---|\n")
        for name, t1, t10, slope in rows:
            f.write(f"| {name} | {t1:.2f} | {t10:.2f} | {slope:.2f} |\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
