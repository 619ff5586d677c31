#!/usr/bin/env python3
"""Scale rehearsal: measure how the text/dedup/corpus query family
scales from the driver's sf0.1 corpus (5k docs) to a synthetic 10x
replica (50k docs), reporting the wall-time slope per query.

The 10x corpus is built by replicating sf0.1 documents 10x with (a)
offset doc_ids and (b) a per-replica token-space suffix (word ->
word~r for replica r > 0), so the VOCABULARY GROWS with the corpus:
replicas live in disjoint token spaces, each reproducing the original
corpus's internal duplicate structure, and cross-replica shingle /
band collisions happen only at the hash-random rate. This is the
realistic regime for the pair-generation family — the round-3
rehearsal rotated a FIXED 31-word vocabulary instead, which made every
replica collide with every other in the same shingle space and
measured a degenerate quadratic-collision regime (slopes 8-12x) that
says nothing about real growth, where vocabulary scales with data.
Embedding queries are out of scope (documents-family only).

A near-1.0x-per-10x slope means driver-JVM fixed costs dominate; the
interesting signal is any query with slope >> 10 (super-linear = a
plan that will not survive a real scale-up).

Also runs the connected-components rehearsal (``cc`` mode): synthetic
chain (diameter 100) + clique pair sets at 1x and 100x edge counts,
reading back the executed round count via the ``stats`` hook to verify
``duplicate_clusters``'s O(log diameter) pointer-jumping claim off the
toy graph.

The ``events`` mode replicates the events table with per-replica
user_id / event_id offsets (MORE users at 10x data — the realistic
growth axis for per-user windowed operators: partition count grows,
per-partition size stays constant) and measures the events-family
slopes the documents rehearsal cannot see.

Usage: python tools/scale_rehearsal.py [replicas] [out_md]   # documents
       python tools/scale_rehearsal.py events [out_md]       # events
       python tools/scale_rehearsal.py cc [out_md]           # CC only
Writes a markdown table to docs/SCALE_r04.md by default.
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
    # new in round-4 build
    "lexical_stats",
    "weighted_sample",
    "duplicate_spans",
    # new in round-7 build
    "remove_dup_spans",
    "hh_invariants",
    "bloom_decon_invariants",
    "cms_invariants",
]


def build_replica(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"{WORK}/sf1x{replicas}_growvocab"
    marker = f"{out_dir}/documents.parquet"
    if os.path.exists(marker):
        return out_dir
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    parts = [docs]  # replica 0: the original corpus, untouched
    for r in range(1, replicas):
        # disjoint token space per replica: word -> word~r, so total
        # vocabulary grows linearly with the corpus (realistic regime)
        # and replicas collide only at the hash-random rate
        suffixed = F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w: F.concat(w, F.lit(f"~{r}")),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
                suffixed.alias("text"),
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
        # Same fix as bench.py: Spark's ContextCleaner only releases dead
        # broadcast vars / shuffle files when a DRIVER GC collects their
        # refs; across a long rehearsal the debris inflates later queries
        # (measured up to 3x in the r4 bench before the fix — the r4
        # rehearsal slopes for late-table queries carried the same bias).
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    return best


#: events-family queries to rehearse (windowed / interval / resample
#: shapes that scale with the events table, not documents)
EVENT_QUERIES = [
    "counter_reset_delta",
    "flatline_runs",
    "tumbling_categorize",
    "merge_windows",
    "interval_subtract",
    "sessionization",
    "lag_dedup",
    "rolling_1h",
    "interpolate_linear",
    "asof_join",
    "interval_semijoin",
    "resample_ffill",
    "posexplode_resample",
    "quantiles",
    "threshold_rules",
    # new in round-4 build
    "overlap_join",
    "mad_outliers",
    "funnel",
    "cohort_retention",
    "trend_slope",
    # new in round-7 build
    "scd2_history",
]


def build_events_replica(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"{WORK}/ev1x{replicas}"
    marker = f"{out_dir}/events.parquet"
    if os.path.exists(marker):
        return out_dir
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n = ev.count()
    max_user = ev.agg(F.max("user_id")).first()[0] + 1
    parts = [ev]
    for r in range(1, replicas):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(r * n)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(r * max_user)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    big.repartition(32).write.mode("overwrite").parquet(marker)
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings".split()
    ):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    return out_dir


def build_embeddings_replica(spark, replicas: int) -> str:
    """10x embeddings: vec_id offset + per-replica cyclic ROTATION of
    the vector elements (same norm, near-random cosine to the original
    for isotropic data) — new vectors are NOVEL, so near-dup structure
    per replica mirrors the original instead of every replica being an
    exact duplicate of replica 0 (which would measure a degenerate
    45x-pair-blowup regime, the embedding analog of the fixed-vocab
    trap the r3 document rehearsal fell into)."""
    from pyspark.sql import functions as F

    out_dir = f"{WORK}/emb1x{replicas}"
    marker = f"{out_dir}/embeddings.parquet"
    if os.path.exists(marker):
        return out_dir
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n = emb.count()
    parts = [emb]
    for r in range(1, replicas):
        shift = (r * 7) % 64 or 1
        rolled = F.concat(
            F.slice("embedding", shift + 1, 64 - shift),
            F.slice("embedding", 1, shift),
        )
        if r >= 64:
            # only 64 distinct rotations exist: negate the second
            # cycle so replicas past 64 stay NOVEL (same norm, cosine
            # = -cos of the unnegated twin) instead of exact
            # duplicates of an earlier replica
            rolled = F.transform(rolled, lambda x: -x)
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    big.repartition(32).write.mode("overwrite").parquet(marker)
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "events".split()
    ):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    return out_dir


#: embedding-family entries from queries() (fixed production params —
#: the self-top-k formulation is inherently O(n^2) work, so slopes
#: near replicas^2 are the COST LAW for the exact/fixed-param paths;
#: the scaled-parameter variants below are the mitigation evidence)
EMB_QUERIES = [
    "embedding_centroids",
    "embedding_topk",
    "embedding_lsh",
    "embedding_near_dup",
    "semantic_dedup",
    "embedding_ivf",
    "embedding_pq",
    "kmeans_invariants",
]


def emb_scaled_variants():
    """ANN configs with capacity scaled to the corpus — since r6 this
    is the DEFAULT behavior (``n_planes=None`` → ``auto_n_planes``,
    ``n_lists=None`` → ``auto_n_lists``): these variants pass NO
    explicit capacity knobs, so the table measures what a caller gets
    out of the box as n grows (constant bucket occupancy / √n
    lists)."""
    from sensomics_data_pipeline_spark.operators import similarity as sim_ops
    from sensomics_data_pipeline_spark.sources import readers

    def lsh_auto(spark, sf_dir):
        emb = readers.load_table(spark, sf_dir, "embeddings")
        return sim_ops.lsh_topk(emb, dim=64, k=5)

    def ivf_auto(spark, sf_dir):
        emb = readers.load_table(spark, sf_dir, "embeddings")
        return sim_ops.ivf_topk(emb, k=5)

    def ivfpq_auto(spark, sf_dir):
        # the mitigation for embedding_pq's full-scan cost law: IVF
        # prunes the lists, PQ still compresses what remains; n_probe
        # left to the r7 auto-sizer (constant probed fraction)
        emb = readers.load_table(spark, sf_dir, "embeddings")
        return sim_ops.ivf_pq_topk(emb, k=5, m=16, n_codes=32)

    return [
        ("lsh_topk(auto n_planes)", lsh_auto),
        ("ivf_topk(auto n_lists)", ivf_auto),
        ("ivf_pq_topk(auto n_lists)", ivfpq_auto),
    ]


def run_queries(spark, entrymod, names, big_dir, replicas, out_md, title):
    qs = entrymod.queries()
    rows = []
    for name in names:
        fn = qs[name]
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
    with open(out_md, "a") as f:
        f.write(f"\n## {title}\n\n")
        f.write("| query | 1x (s) | " f"{replicas}x (s) | slope |\n")
        f.write("|---|---|---|---|\n")
        for name, t1, t10, slope in rows:
            f.write(f"| {name} | {t1:.2f} | {t10:.2f} | {slope:.2f} |\n")
    print(f"appended {title} to {out_md}")


def cc_rehearsal(spark) -> list[tuple]:
    """100x rehearsal for duplicate_clusters: chains of diameter 100
    (the adversarial case for label propagation — plain min-label needs
    ~100 rounds) plus 5-cliques, at 1x (~10k edges) and 100x (~1M
    edges). Returns (name, n_edges, rounds, seconds) rows; the
    O(log d) claim holds if rounds stays ~7-8 at BOTH sizes (rounds is
    a function of diameter, not edge count)."""
    from pyspark.sql import functions as F

    from sensomics_data_pipeline_spark.operators.dedup import (
        duplicate_clusters,
    )

    def chain_clique_pairs(n_chains: int, n_cliques: int):
        # chains: nodes [c*1000, c*1000+100) linked in a path
        chains = (
            spark.range(n_chains)
            .select(F.explode(F.sequence(F.lit(0), F.lit(98))).alias("i"),
                    F.col("id").alias("c"))
            .select(
                (F.col("c") * 1000 + F.col("i")).alias("doc_a"),
                (F.col("c") * 1000 + F.col("i") + 1).alias("doc_b"),
            )
        )
        # cliques: 5 nodes each, offset into a disjoint id space
        base = 10_000_000
        cliq = (
            spark.range(n_cliques)
            .select(F.col("id").alias("k"))
            .crossJoin(
                spark.range(5).select(F.col("id").alias("i"))
            )
            .crossJoin(spark.range(5).select(F.col("id").alias("j")))
            .filter(F.col("i") < F.col("j"))
            .select(
                (base + F.col("k") * 10 + F.col("i")).alias("doc_a"),
                (base + F.col("k") * 10 + F.col("j")).alias("doc_b"),
            )
        )
        return chains.unionByName(cliq)

    rows = []
    for name, n_chains, n_cliques in (
        ("cc_1x", 50, 500),      # ~5k chain edges + 5k clique edges
        ("cc_100x", 5_000, 50_000),  # ~495k + 500k edges
    ):
        pairs = chain_clique_pairs(n_chains, n_cliques)
        n_edges = pairs.count()
        stats: dict = {}
        t0 = time.time()
        # local_cap=None: measure the DISTRIBUTED pointer-jumping path
        # (the claim under test); the r6 default gates graphs this size
        # to the driver-side solve
        out = duplicate_clusters(pairs, stats=stats, local_cap=None)
        # correctness probe rides along: every chain collapses to its
        # head, every clique to its smallest member
        n_comp = out.select("canonical_id").distinct().count()
        el = time.time() - t0
        assert n_comp == n_chains + n_cliques, (n_comp, n_chains, n_cliques)
        # gated default (r6): bounded driver-side union-find under the
        # 2M-edge cap — same components, scheduler jobs collapsed
        t1 = time.time()
        out2 = duplicate_clusters(pairs)
        n2 = out2.select("canonical_id").distinct().count()
        el2 = time.time() - t1
        assert n2 == n_comp, (n2, n_comp)
        rows.append((name, n_edges, stats["rounds"], el, el2))
        print(
            f"{name:10s} edges {n_edges:8d}  rounds {stats['rounds']:2d}  "
            f"{el:6.2f}s  gated {el2:6.2f}s",
            flush=True,
        )
    return rows


def pr_rehearsal(spark) -> list[tuple]:
    """PageRank on synthetic chain+clique graphs at 1x and 100x
    edges — isolates the operator's cost law (one join + one groupBy
    per iteration, linear in |E|) from the pagerank_invariants demo's
    per-group-quadratic edge derivation. The invariant probe rides
    along: per-iteration mass == 1 and L1 contraction."""
    import time

    from pyspark.sql import functions as F

    from sensomics_data_pipeline_spark.operators.graph import pagerank

    def chain_clique_pairs(n_chains: int, n_cliques: int):
        chains = (
            spark.range(n_chains)
            .select(F.explode(F.sequence(F.lit(0), F.lit(98))).alias("i"),
                    F.col("id").alias("c"))
            .select(
                (F.col("c") * 1000 + F.col("i")).alias("src"),
                (F.col("c") * 1000 + F.col("i") + 1).alias("dst"),
            )
        )
        base = 10_000_000
        cliq = (
            spark.range(n_cliques)
            .select(F.col("id").alias("k"))
            .crossJoin(spark.range(5).select(F.col("id").alias("i")))
            .crossJoin(spark.range(5).select(F.col("id").alias("j")))
            .filter(F.col("i") < F.col("j"))
            .select(
                (base + F.col("k") * 10 + F.col("i")).alias("src"),
                (base + F.col("k") * 10 + F.col("j")).alias("dst"),
            )
        )
        return chains.unionByName(cliq)

    rows = []
    for name, n_chains, n_cliques in (
        ("pr_1x", 50, 500),
        ("pr_100x", 5_000, 50_000),
    ):
        pairs = chain_clique_pairs(n_chains, n_cliques)
        n_edges = pairs.count()
        t0 = time.time()
        ranks, hist = pagerank(pairs, n_iter=6, damping=0.85)
        n_nodes = ranks.count()
        el = time.time() - t0
        assert all(abs(m - 1.0) < 1e-6 for m, _ in hist), hist
        assert all(
            r1 <= 0.85 * r0 + 1e-9
            for (_, r0), (_, r1) in zip(hist, hist[1:])
        ), hist
        rows.append((name, n_edges, n_nodes, el))
        print(
            f"{name:10s} edges {n_edges:8d}  nodes {n_nodes:8d}  "
            f"{el:6.2f}s",
            flush=True,
        )
    return rows


def tri_kcore_rehearsal(spark) -> list[tuple]:
    """100x rehearsal for triangle_counts and k_core under HUB SKEW
    (r9 verdict ask #4) — the quadratic failure mode for wedge
    enumeration. Graph: a WHEEL (one hub adjacent to every rim node,
    rim closed into a cycle — naive wedge volume at the hub is
    C(d, 2), 5e9 pairs at d=100k) plus rank-8 cliques. Under degree
    ordering the hub's oriented out-degree is 0 and every rim node's
    is <= 3, so the measured oriented wedge volume stays ~|E| — the
    arboricity bound in action, and the law the wall-clock slope
    must follow.

    Closed-form truth asserted per size: total triangles =
    d + 56*n_cliques (one per rim edge + C(8,3) per clique); the hub
    participates in exactly d; the 3-core is the whole wheel + all
    cliques; the 4-core is the cliques alone (rim degree 3 < 4 peels
    in round 1, the hub cascades in round 2)."""
    import time

    from pyspark.sql import functions as F

    from sensomics_data_pipeline_spark.operators.graph import (
        k_core,
        triangle_counts,
    )

    def wheel_clique_pairs(d: int, n_cliques: int):
        hub = 0
        spokes = spark.range(d).select(
            F.lit(hub).alias("src"), (F.col("id") + 1).alias("dst")
        )
        rim = spark.range(d).select(
            (F.col("id") + 1).alias("src"),
            ((F.col("id") + 1) % d + 1).alias("dst"),
        )
        base = 10_000_000
        cliq = (
            spark.range(n_cliques)
            .select(F.col("id").alias("k"))
            .crossJoin(spark.range(8).select(F.col("id").alias("i")))
            .crossJoin(spark.range(8).select(F.col("id").alias("j")))
            .filter(F.col("i") < F.col("j"))
            .select(
                (base + F.col("k") * 10 + F.col("i")).alias("src"),
                (base + F.col("k") * 10 + F.col("j")).alias("dst"),
            )
        )
        return spokes.unionByName(rim).unionByName(cliq)

    def wedge_volumes(pairs):
        """(naive, oriented) wedge counts: sum C(deg,2) over nodes vs
        sum C(outdeg,2) under the operator's (degree, id) orientation."""
        e = pairs.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        ).filter(F.col("a") != F.col("b")).distinct()
        und = e.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
            e.select(F.col("b").alias("n"), F.col("a").alias("m"))
        )
        deg = und.groupBy("n").agg(F.count("*").alias("deg"))
        naive = deg.agg(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        ).first()[0]
        dd = und.join(deg, "n").join(
            deg.select(
                F.col("n").alias("m"), F.col("deg").alias("deg_m")
            ),
            "m",
        )
        oriented_src = dd.filter(
            (F.col("deg") < F.col("deg_m"))
            | ((F.col("deg") == F.col("deg_m")) & (F.col("n") < F.col("m")))
        )
        outdeg = oriented_src.groupBy("n").agg(F.count("*").alias("od"))
        oriented = outdeg.agg(
            F.sum(F.col("od") * (F.col("od") - 1) / 2)
        ).first()[0]
        return int(naive), int(oriented)

    rows = []
    for name, d, n_cliques in (
        ("graph_1x", 1_000, 200),
        ("graph_100x", 100_000, 20_000),
    ):
        pairs = wheel_clique_pairs(d, n_cliques)
        n_edges = pairs.count()
        naive_w, oriented_w = wedge_volumes(pairs)

        t0 = time.time()
        tri = triangle_counts(pairs).localCheckpoint(eager=True)
        el_tri = time.time() - t0
        agg = tri.agg(
            F.sum("n_triangles").alias("s"), F.max("n_triangles").alias("mx")
        ).first()
        total_tri = int(agg["s"]) // 3
        assert int(agg["s"]) % 3 == 0
        expect_tri = d + 56 * n_cliques
        assert total_tri == expect_tri, (total_tri, expect_tri)
        assert int(agg["mx"]) == d, (agg["mx"], d)  # the hub's count

        t0 = time.time()
        core3 = k_core(pairs, 3).localCheckpoint(eager=True)
        el_k3 = time.time() - t0
        n3 = core3.count()
        assert n3 == (d + 1) + 8 * n_cliques, (n3, d, n_cliques)
        t0 = time.time()
        core4 = k_core(pairs, 4).localCheckpoint(eager=True)
        el_k4 = time.time() - t0
        n4 = core4.count()
        assert n4 == 8 * n_cliques, (n4, n_cliques)

        rows.append(
            (name, n_edges, naive_w, oriented_w, el_tri, el_k3, el_k4)
        )
        print(
            f"{name:12s} edges {n_edges:8d}  naive_wedges {naive_w:12d}  "
            f"oriented {oriented_w:8d}  tri {el_tri:6.2f}s  "
            f"k3 {el_k3:6.2f}s  k4 {el_k4:6.2f}s",
            flush=True,
        )
    return rows


def rangejoin_rehearsal(spark, entrymod, replicas: int = 10) -> list[tuple]:
    """Binned vs broadcast containment semijoin at ``replicas``× events
    (late-r10 operator ``interval_semijoin_binned``): the law (both
    plans agree row-for-row on the aggregate) re-asserted at volume,
    plus walls for (a) the broadcast plan, (b) the binned plan with
    Catalyst free to choose, and (c) the binned plan with broadcast
    DISABLED — the true big-big path a 100-TB interval side forces."""
    import time as _time

    from pyspark.sql import functions as F

    from sensomics_data_pipeline_spark.operators import intervals as iv_ops

    big_dir = build_events_replica(spark, replicas)
    ev = spark.read.parquet(f"{big_dir}/events.parquet")
    intervals = entrymod.q_interval_merge(spark, big_dir)
    n_iv = intervals.count()

    def agg(kept):
        return kept.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )

    def run(fn):
        t0 = _time.time()
        out = sorted(map(tuple, agg(fn()).collect()))
        return out, _time.time() - t0

    bc, t_bc = run(
        lambda: iv_ops.interval_semijoin(ev, intervals, ["user_id"], ts_col="ts")
    )
    binned, t_binned = run(
        lambda: iv_ops.interval_semijoin_binned(
            ev, intervals, ["user_id"], ts_col="ts", bin_width_s=600
        )
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffled, t_shuffled = run(
            lambda: iv_ops.interval_semijoin_binned(
                ev, intervals, ["user_id"], ts_col="ts", bin_width_s=600
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert bc == binned == shuffled, "law violated at volume"
    n_kept = sum(r[1] for r in bc)
    return [(replicas, n_iv, n_kept, t_bc, t_binned, t_shuffled)]


def rangejoin_crossover(spark, replicas: int = 10) -> list[tuple]:
    """Find the broadcast→binned CROSSOVER for the containment
    semijoin (r10 verdict ask #6): the r10 rehearsal scaled DATA 10×
    (more users, constant intervals per user) and broadcast kept
    winning — correctly, because broadcast's probe cost is
    events × intervals_per_user and that axis never moved. This
    rehearsal scales INTERVALS PER USER (the axis that actually kills
    the broadcast plan: every probe row scans its user's whole
    interval list, while the binned plan only meets intervals sharing
    its time bin).

    Per K in a geometric ladder: build K synthetic half-covering
    intervals per user over the events time span (width = span/2K, so
    ~half the events stay kept at every K — constant output
    selectivity isolates the probe-cost axis), assert the law
    (broadcast ≡ binned ≡ binned-no-broadcast aggregates), and time
    all three plans. Returns (K, n_intervals, t_bc, t_binned,
    t_shuffle) rows."""
    import time as _time

    from pyspark.sql import functions as F

    from sensomics_data_pipeline_spark.operators import intervals as iv_ops

    big_dir = build_events_replica(spark, replicas)
    ev = spark.read.parquet(f"{big_dir}/events.parquet")
    tmin, tmax = ev.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    span = max(int(tmax) - int(tmin), 1)
    # FRESH scan for the interval side: deriving it from `ev` makes the
    # semijoin a self-join lineage-wise and Spark rejects the build-side
    # column refs as ambiguous
    users = (
        spark.read.parquet(f"{big_dir}/events.parquet")
        .select("user_id")
        .distinct()
    )

    def agg(kept):
        return sorted(
            map(
                tuple,
                kept.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect(),
            )
        )

    rows = []
    bc_dnf = False  # once broadcast blows a soft budget, stop re-timing it
    for k in (256, 2048, 16384):
        gap = max(span // k, 2)
        width = max(gap // 2, 1)
        iv = (
            users.withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            .select(
                "user_id",
                F.timestamp_seconds(
                    F.lit(int(tmin)) + F.col("_i") * gap
                ).alias("start_time"),
                F.timestamp_seconds(
                    F.lit(int(tmin)) + F.col("_i") * gap + width
                ).alias("end_time"),
            )
            .localCheckpoint(eager=True)  # build once; time only the joins
        )
        n_iv = iv.count()

        def run(fn):
            t0 = _time.time()
            out = agg(fn())
            return out, _time.time() - t0

        if bc_dnf:
            # broadcast already blew the soft budget at a smaller K; at
            # this K the build side also exceeds driver.maxResultSize,
            # so BOTH broadcast-shaped plans (the range join and the
            # Catalyst-free binned run, which would auto-broadcast or
            # die the same way) are recorded as DNF — which is itself
            # the result: only the shuffle plan exists in this regime.
            bc, t_bc = None, float("nan")
            binned, t_binned = None, float("nan")
        else:
            bc, t_bc = run(
                lambda: iv_ops.interval_semijoin(
                    ev, iv, ["user_id"], ts_col="ts"
                )
            )
            if t_bc > 150:
                bc_dnf = True  # budget blown: crossover already proven
            binned, t_binned = run(
                lambda: iv_ops.interval_semijoin_binned(
                    ev, iv, ["user_id"], ts_col="ts", bin_width_s=gap
                )
            )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            shuffled, t_shuffled = run(
                lambda: iv_ops.interval_semijoin_binned(
                    ev, iv, ["user_id"], ts_col="ts", bin_width_s=gap
                )
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if bc is not None:
            assert bc == binned == shuffled, f"law violated at K={k}"
        rows.append((k, n_iv, t_bc, t_binned, t_shuffled))
        print(
            f"crossover K={k}: iv={n_iv} bc={t_bc:.2f}s "
            f"binned={t_binned:.2f}s shuffle={t_shuffled:.2f}s",
            flush=True,
        )
    return rows


def bpe_rehearsal(spark, replicas: int = 10) -> list[tuple]:
    """BPE trainer at 1x vs ``replicas``x documents with LINEARLY
    GROWING vocabulary (the grow-vocab replica suffixes every word per
    replica — the regime that stresses the trainer, since its state is
    the word table, not the corpus). Reports vocabulary size, total
    words, and wall for 8 merges; the scaling claim is that cost
    follows VOCABULARY (the word table), not raw corpus bytes."""
    import time as _time

    from sensomics_data_pipeline_spark.operators import tokenizer as tok_ops

    rows = []
    for label, sf_dir in (
        ("1x", BASE),
        (f"{replicas}x", build_replica(spark, replicas)),
    ):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = _time.time()
        merges, words = tok_ops.bpe_train(spark, docs, "text", n_merges=8)
        vocab = words.count()
        wall = _time.time() - t0
        assert len(merges) == 8
        rows.append((label, vocab, wall, merges[0][3], merges[0][4]))
    return rows


def main() -> None:
    import __spark_entry__ as entrymod
    from sensomics_data_pipeline_spark.session import get_spark

    if len(sys.argv) > 1 and sys.argv[1] == "bpe_10x":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r10.md"
        spark = get_spark("scale_rehearsal")
        rows = bpe_rehearsal(spark, replicas=10)
        with open(out_md, "a") as f:
            f.write(
                "\n## bpe_train 10x grow-vocab rehearsal\n\n"
                "10x documents with per-replica word suffixing => ~10x "
                "vocabulary (the trainer's actual state). 8 merges each; "
                "wall should track the word-table size, not corpus "
                "bytes.\n\n"
                "| corpus | vocabulary | wall 8 merges (s) | top merge | "
                "count |\n|---|---|---|---|---|\n"
            )
            for label, vocab, wall, top, cnt in rows:
                f.write(
                    f"| {label} | {vocab} | {wall:.2f} | {top} | {cnt} |\n"
                )
        print(f"appended bpe rehearsal table to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "bloomjoin_10x":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r10.md"
        spark = get_spark("scale_rehearsal")
        import time as _time

        from pyspark.sql import functions as F

        from sensomics_data_pipeline_spark.operators import skew as skew_ops

        big_dir = build_events_replica(spark, 10)
        fact = spark.read.parquet(f"{big_dir}/events.parquet")
        # selective dim: a 5%-of-users cohort chosen by user_id hash —
        # ACTIVITY-INDEPENDENT (e.g. a consent/holdout table), so its
        # share of events matches its share of users. (A first draft
        # selected users by max purchase value; that correlates with
        # per-user event volume and the "5%" of users held 87% of
        # events — selectivity claims need volume-independent dims.)
        dim = (
            fact.select("user_id")
            .distinct()
            .filter(F.pmod(F.xxhash64("user_id"), F.lit(100)) < 5)
            .withColumn("cohort", F.lit("holdout"))
        )
        n_fact = fact.count()
        n_dim = dim.count()

        def agg(j):
            return sorted(
                map(
                    tuple,
                    j.groupBy("event_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect(),
                )
            )

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t0 = _time.time()
            plain = agg(fact.join(dim, on="user_id", how="inner"))
            t_plain = _time.time() - t0
            t0 = _time.time()
            bloom = agg(
                skew_ops.bloom_prefilter_join(
                    fact, dim, "user_id", n_buckets=1 << 16
                )
            )
            t_bloom = _time.time() - t0
            # rows surviving the prefilter = rows entering the fact
            # exchange under the bloom plan
            pre = fact.join(
                F.broadcast(
                    dim.select(
                        F.pmod(
                            F.xxhash64(F.col("user_id").cast("string")),
                            F.lit(1 << 16),
                        ).alias("_bkt")
                    ).distinct()
                ),
                F.pmod(
                    F.xxhash64(F.col("user_id").cast("string")),
                    F.lit(1 << 16),
                )
                == F.col("_bkt"),
                "left_semi",
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert plain == bloom, "bloom law violated at volume"
        with open(out_md, "a") as f:
            f.write(
                "\n## bloom_prefilter_join 10x rehearsal (broadcast off — "
                "the big-big regime)\n\n"
                f"10x events fact ({n_fact} rows) joined to a selective "
                f"dim ({n_dim} hash-cohort users); results "
                "cell-identical plain vs bloom (asserted in-harness). "
                "The prefilter bounds what enters the fact-side "
                "exchange:\n\n"
                "| fact rows | dim rows | rows entering fact exchange "
                "(bloom) | reduction | plain join (s) | bloom join (s) |\n"
                "|---|---|---|---|---|---|\n"
                f"| {n_fact} | {n_dim} | {pre} | "
                f"{1 - pre / n_fact:.1%} | {t_plain:.2f} | {t_bloom:.2f} |\n"
            )
        print(f"appended bloomjoin rehearsal to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "rangejoin_crossover":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r11.md"
        spark = get_spark("scale_rehearsal")
        rows = rangejoin_crossover(spark, replicas=10)
        with open(out_md, "a") as f:
            f.write(
                "\n## interval containment semijoin: broadcast vs binned "
                "crossover (intervals-per-user axis)\n\n"
                "10x events (150 users); K synthetic half-covering "
                "intervals PER USER. Broadcast probe cost is events x K "
                "(each probe row scans its user's whole broadcast "
                "interval list); the binned plan only meets intervals "
                "sharing a time bin, so its cost is flat in K. All "
                "three plans assert cell-identical aggregates "
                "in-harness at every K.\n\n"
                "| K per user | interval rows | broadcast (s) | binned, "
                "Catalyst free (s) | binned, broadcast off (s) |\n"
                "|---|---|---|---|---|\n"
            )
            for k, n_iv, t_bc, t_binned, t_shuffled in rows:
                f.write(
                    f"| {k} | {n_iv} | {t_bc:.2f} | {t_binned:.2f} | "
                    f"{t_shuffled:.2f} |\n"
                )
            f.write(
                "\nPlan-choice rule derived from the table: prefer the "
                "binned/shuffle plan once expected intervals-per-"
                "partition-key exceeds the crossover K above (or "
                "whenever the interval side exceeds the broadcast "
                "threshold at all, where the broadcast plan is simply "
                "unavailable); below that, broadcast wins on shuffle "
                "avoidance.\n"
            )
        print(f"appended rangejoin crossover table to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "rangejoin_10x":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r10.md"
        spark = get_spark("scale_rehearsal")
        rows = rangejoin_rehearsal(spark, entrymod, replicas=10)
        with open(out_md, "a") as f:
            f.write(
                "\n## interval_semijoin_binned 10x rehearsal "
                "(binned vs broadcast containment semijoin)\n\n"
                "10x users => 10x interval rows; the three plans "
                "(broadcast range join; binned equi-join with Catalyst "
                "free to broadcast the exploded side; binned equi-join "
                "with broadcast DISABLED — the forced big-big shuffle "
                "path) agree cell-for-cell on the aggregate "
                "(asserted in-harness).\n\n"
                "| replicas | interval rows | events kept | broadcast "
                "(s) | binned/auto (s) | binned/shuffle (s) |\n"
                "|---|---|---|---|---|---|\n"
            )
            for rep, n_iv, n_kept, t_bc, t_b, t_s in rows:
                f.write(
                    f"| {rep} | {n_iv} | {n_kept} | {t_bc:.2f} | "
                    f"{t_b:.2f} | {t_s:.2f} |\n"
                )
        print(f"appended rangejoin rehearsal table to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "graphs_100x":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r10.md"
        spark = get_spark("scale_rehearsal")
        rows = tri_kcore_rehearsal(spark)
        with open(out_md, "a") as f:
            f.write(
                "\n## triangle_counts / k_core 100x hub-skew rehearsal\n\n"
                "Wheel graph (hub degree d, rim cycle) + rank-8 cliques; "
                "closed-form triangle totals, hub participation, and "
                "3-/4-core membership asserted in-harness (all passed). "
                "naive_wedges = sum C(deg,2) (what a non-degree-ordered "
                "enumeration would generate); oriented_wedges = sum "
                "C(outdeg,2) under the operator's (degree, id) "
                "orientation — the volume the wedge join actually "
                "materializes.\n\n"
                "| graph | edges | naive wedges | oriented wedges | "
                "triangles (s) | 3-core (s) | 4-core (s) |\n"
                "|---|---|---|---|---|---|---|\n"
            )
            for name, ne, nw, ow, t, k3, k4 in rows:
                f.write(
                    f"| {name} | {ne} | {nw} | {ow} | {t:.2f} | "
                    f"{k3:.2f} | {k4:.2f} |\n"
                )
        print(f"appended graph rehearsal table to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "embeddings_100x":
        # 100x embeddings rehearsal (r7 verdict ask): (a) WALLS of the
        # auto-knob scale paths on 100x the sf0.1 vectors (500k —
        # rotated+negated novel replicas, near-dup structure per
        # replica like the original); (b) RECALL floors with zero
        # knobs at 100x the sf0.001 base (50k noisy copies, the same
        # construction as test_ivf_auto_probe_recall_holds_at_10x) vs
        # chunked exact brute force. Brute force at 500k would be
        # 2.5e11 pair sims — recall is measured at the 50k point, the
        # largest exact ground truth this box computes in minutes.
        import numpy as np
        import pandas as pd

        from sensomics_data_pipeline_spark.operators import (
            similarity as sim_ops,
        )

        phase = sys.argv[2] if len(sys.argv) > 2 else "both"
        out_md = sys.argv[3] if len(sys.argv) > 3 else "docs/SCALE_r08.md"
        spark = get_spark("scale_rehearsal")
        if phase in ("walls", "both"):
            big_dir = build_embeddings_replica(spark, 100)
            rows = []
            for name, fn in emb_scaled_variants():
                fn(spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
                t100 = time_query(spark, fn, big_dir)
                rows.append((name, t100))
                print(f"{name:28s} 100x {t100:7.2f}s", flush=True)
            with open(out_md, "a") as f:
                f.write(
                    "\n## Embeddings-family 100x rehearsal\n\n"
                    "Auto-capacity walls at 100x sf0.1 (500,000 rotated+"
                    "negated novel vectors), no explicit knobs:\n\n"
                    "| variant | 100x (s) |\n|---|---|\n"
                )
                for name, t100 in rows:
                    f.write(f"| {name} | {t100:.2f} |\n")
            print(f"appended 100x walls table to {out_md}")
        if phase not in ("recall", "both"):
            return

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        pdf = emb.toPandas()
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        rng = np.random.default_rng(7)
        reps = [mat] + [
            mat + rng.normal(0, 0.08, mat.shape) for _ in range(99)
        ]
        big = np.concatenate(reps)
        big_df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(len(big)),
                    "embedding": [r.astype("float32") for r in big],
                }
            )
        ).repartition(32)
        t0 = time.time()
        b1 = sim_ops.brute_force_topk(big_df, k=1, n_chunks=64).toPandas()
        t_truth1 = time.time() - t0
        truth1 = dict(zip(b1["query_id"], b1["neighbor_id"]))
        ivf = sim_ops.ivf_topk(big_df, k=1).toPandas()
        r1 = sum(
            truth1.get(q) == n for q, n in zip(ivf.query_id, ivf.neighbor_id)
        ) / len(truth1)
        t0 = time.time()
        b5 = sim_ops.brute_force_topk(big_df, k=5, n_chunks=64).toPandas()
        t_truth5 = time.time() - t0
        t5 = set(zip(b5.query_id, b5.neighbor_id))
        pq = sim_ops.ivf_pq_topk(big_df, k=5, m=16, n_codes=32).toPandas()
        r5 = len(t5 & set(zip(pq.query_id, pq.neighbor_id))) / len(t5)
        # zero-knob rerank: auto_rerank sizes the nomination depth from
        # the sampled near-tie multiplicity (r8 measured the pinned
        # R=25 nomination-limited at 0.755 against ~100-sibling groups)
        auto_r = sim_ops.auto_rerank(big_df, k=5)
        rr = sim_ops.ivf_pq_topk(
            big_df, k=5, m=16, n_codes=32, rerank="auto"
        ).toPandas()
        r5_rr = len(t5 & set(zip(rr.query_id, rr.neighbor_id))) / len(t5)
        print(
            f"recall@1 IVF(auto) {r1:.3f}  recall@5 IVF-PQ(auto) {r5:.3f}"
            f"  rerank=auto({auto_r}) {r5_rr:.3f}"
            f"  (truth walls {t_truth1:.1f}s / {t_truth5:.1f}s)",
            flush=True,
        )
        with open(out_md, "a") as f:
            f.write(
                "\nRecall with ZERO knobs at 100x sf0.001 (50,000 "
                "noisy-copy vectors, exact chunked brute-force ground "
                "truth):\n\n"
                "| metric | value | truth wall (s) |\n|---|---|---|\n"
                f"| IVF recall@1 (auto lists/probe) | {r1:.3f} "
                f"| {t_truth1:.1f} |\n"
                f"| IVF-PQ recall@5 (auto, m=16 x 32) | {r5:.3f} "
                f"| {t_truth5:.1f} |\n"
                f"| IVF-PQ recall@5 + rerank=auto (IVFADC+R, "
                f"auto R={auto_r}) | {r5_rr:.3f} "
                f"| {t_truth5:.1f} |\n"
            )
        print(f"appended 100x recall table to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "events":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r04.md"
        replicas = 10
        spark = get_spark("scale_rehearsal")
        big_dir = build_events_replica(spark, replicas)
        run_queries(
            spark, entrymod, EVENT_QUERIES, big_dir, replicas, out_md,
            "Events-family 10x rehearsal (10x users, per-user volume "
            "constant)",
        )
        return

    if len(sys.argv) > 1 and sys.argv[1] == "r4new":
        # focused pass over only the operators added late in round 4,
        # against BOTH replica kinds (documents + events)
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r04.md"
        replicas = 10
        spark = get_spark("scale_rehearsal")
        docs_dir = build_replica(spark, replicas)
        run_queries(
            spark, entrymod, ["lexical_stats", "weighted_sample"],
            docs_dir, replicas, out_md,
            "Round-4 new documents operators, 10x growing-vocab replica",
        )
        ev_dir = build_events_replica(spark, replicas)
        run_queries(
            spark, entrymod,
            [
                "overlap_join", "mad_outliers", "funnel",
                "cohort_retention", "trend_slope", "cusum_changepoint",
            ],
            ev_dir, replicas, out_md,
            "Round-4 new events operators, 10x users replica",
        )
        return

    if len(sys.argv) > 1 and sys.argv[1] == "r7new2":
        # focused pass over the sketch/clustering operators added late
        # in round 7, against their respective replica kinds
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r07.md"
        replicas = 10
        spark = get_spark("scale_rehearsal")
        docs_dir = build_replica(spark, replicas)
        run_queries(
            spark, entrymod, ["cms_invariants"], docs_dir, replicas,
            out_md,
            "Count-min sketch certification, 10x growing-vocab replica",
        )
        emb_dir = build_embeddings_replica(spark, replicas)
        run_queries(
            spark, entrymod, ["kmeans_invariants"], emb_dir, replicas,
            out_md,
            "Distributed k-means certification, 10x rotated-vector "
            "replica",
        )
        ev_dir = build_events_replica(spark, replicas)
        run_queries(
            spark, entrymod, ["scd2_history"], ev_dir, replicas, out_md,
            "SCD2 history build, 10x users replica",
        )
        return

    if len(sys.argv) > 1 and sys.argv[1] == "pagerank":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r07.md"
        spark = get_spark("scale_rehearsal")
        rows = pr_rehearsal(spark)
        with open(out_md, "a") as f:
            f.write("\n## PageRank edge-scaling rehearsal "
                    "(synthetic chain+clique graphs, 6 iterations)\n\n")
            f.write("| graph | edges | nodes | wall (s) |\n")
            f.write("|---|---|---|---|\n")
            for name, n_edges, n_nodes, el in rows:
                f.write(f"| {name} | {n_edges} | {n_nodes} | {el:.2f} |\n")
        print(f"appended PageRank rehearsal to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "r7new2_100x":
        # 100x stress for the round-7 sketch/clustering/SCD2 ops: the
        # 10x slopes are fixed-overhead-dominated, so this is the run
        # that shows the actual cost law (expected ~linear: every one
        # of these plans is single-pass-per-stage with bounded driver
        # traffic)
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r07.md"
        replicas = 100
        spark = get_spark("scale_rehearsal")
        docs_dir = build_replica(spark, replicas)
        run_queries(
            spark, entrymod, ["cms_invariants"], docs_dir, replicas,
            out_md,
            "Count-min sketch certification, 100x growing-vocab replica",
        )
        emb_dir = build_embeddings_replica(spark, replicas)
        run_queries(
            spark, entrymod, ["kmeans_invariants"], emb_dir, replicas,
            out_md,
            "Distributed k-means certification, 100x rotated-vector "
            "replica",
        )
        ev_dir = build_events_replica(spark, replicas)
        run_queries(
            spark, entrymod, ["scd2_history"], ev_dir, replicas, out_md,
            "SCD2 history build, 100x users replica",
        )
        return

    if len(sys.argv) > 1 and sys.argv[1] == "embeddings":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r04.md"
        replicas = 10
        spark = get_spark("scale_rehearsal")
        big_dir = build_embeddings_replica(spark, replicas)
        run_queries(
            spark, entrymod, EMB_QUERIES, big_dir, replicas, out_md,
            "Embeddings-family 10x rehearsal (rotated-vector replicas)",
        )
        # scaled-parameter variants: measured at 10x ONLY (their 1x
        # numbers would compare different configs, not scaling)
        rows = []
        for name, fn in emb_scaled_variants():
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
            t10 = time_query(spark, fn, big_dir)
            rows.append((name, t10))
            print(f"{name:24s} {replicas}x {t10:7.2f}s", flush=True)
        with open(out_md, "a") as f:
            f.write(
                "\nAuto-capacity variants at 10x — NO explicit knobs "
                "(since r6 `n_planes=None`/`n_lists=None` auto-size "
                "from a count: constant bucket occupancy / sqrt-n "
                "lists), so this is default out-of-the-box behavior, "
                "not a manually retuned mitigation.\n\n"
                "| variant | 10x (s) |\n|---|---|\n"
            )
            for name, t10 in rows:
                f.write(f"| {name} | {t10:.2f} |\n")
        print(f"appended embeddings tables to {out_md}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "lineitem":
        # lineitem-family rehearsal (currently: the quantile sketch) —
        # 10x rows via replica-offset order keys; the sketch reads only
        # l_extendedprice, so replication preserves the value
        # distribution while growing n (the axis the rank-error bound
        # and the per-partition buffers must survive)
        from pyspark.sql import functions as F

        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r07.md"
        replicas = 10
        spark = get_spark("scale_rehearsal")
        out_dir = f"{WORK}/li1x{replicas}"
        marker = f"{out_dir}/lineitem.parquet"
        if not os.path.exists(marker):
            li = spark.read.parquet(f"{BASE}/lineitem.parquet")
            max_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
            parts = [li]
            for r in range(1, replicas):
                parts.append(
                    li.withColumn(
                        "l_orderkey", F.col("l_orderkey") + F.lit(r * max_ok)
                    )
                )
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            os.makedirs(out_dir, exist_ok=True)
            big.repartition(32).write.mode("overwrite").parquet(marker)
            for t in (
                "region nation customer supplier part orders events "
                "documents embeddings".split()
            ):
                dst = f"{out_dir}/{t}.parquet"
                if not os.path.exists(dst):
                    os.symlink(f"{BASE}/{t}.parquet", dst)
        run_queries(
            spark, entrymod, ["qsketch_invariants"], out_dir, replicas,
            out_md,
            "Lineitem-family 10x rehearsal (replica-offset order keys)",
        )
        return

    if len(sys.argv) > 1 and sys.argv[1] == "cc":
        out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r04.md"
        spark = get_spark("scale_rehearsal")
        cc_rows = cc_rehearsal(spark)
        with open(out_md, "a") as f:
            f.write(
                "\n## Connected-components 100x rehearsal\n\n"
                "Synthetic chains (diameter 100) + 5-cliques; `rounds` "
                "is read from the duplicate_clusters stats hook. The "
                "pointer-jumping O(log d) claim holds iff rounds is a "
                "function of DIAMETER, not edge count — i.e. identical "
                "at 1x and 100x.\n\n"
                "| graph | edges | rounds | distributed (s) | gated default (s) |\n"
                "|---|---|---|---|---|\n"
            )
            for name, n_edges, rounds, el, el2 in cc_rows:
                f.write(
                    f"| {name} | {n_edges} | {rounds} | {el:.2f} | {el2:.2f} |\n"
                )
        print(f"appended CC table to {out_md}")
        return

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_md = sys.argv[2] if len(sys.argv) > 2 else "docs/SCALE_r04.md"

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

    with open(out_md, "a") as f:
        f.write(
            f"\n## Documents-family rehearsal (growing vocabulary)\n\n"
            f"sf0.1 documents (5k docs) vs a {replicas}x replica "
            f"(50k docs) built with per-replica token-space suffixes, "
            f"so the VOCABULARY grows {replicas}x with the corpus — "
            f"the realistic regime for the pair-generation family "
            f"(the round-3 rehearsal held a 31-word vocabulary fixed, "
            f"which measured a degenerate cross-replica collision "
            f"regime). local[32], min-of-2 after a JIT warm pass. "
            f"`slope` = t({replicas}x)/t(1x); linear scaling at "
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
