"""Iterative graph algorithms over edge lists (the family the
dedup layer's pointer-jumping connected components belongs to).

PageRank here serves the training-data pipeline directly: after
near-dup clustering, rank the members of each duplicate cluster by
link centrality and keep the top-ranked document as the cluster's
canonical representative — a principled alternative to "keep the
longest" heuristics.

Scale shape shared by every iteration: ranks live in a DataFrame
(node, rank), contributions flow through one shuffle equi-join with
the weighted edge list plus one groupBy — the GraphX/Pregel dataflow
re-expressed relationally, with AQE free to re-plan each step. The
driver sees only per-iteration SCALARS (total mass, L1 residual);
no per-node data ever leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_positive_weights(e: DataFrame) -> None:
    """Upfront guard for the ``weight_col`` path (the sssp_distances
    pattern): NULL or non-positive transition weights would silently
    leak mass through ``w = out_mass / _deg`` (or raise an opaque
    DIVIDE_BY_ZERO under ANSI mode) and break the certified
    mass-conservation invariant, so reject them loudly instead.
    One single-row aggregate; only runs when weights were asked for.

    NaN is rejected explicitly: Spark's ``min()`` sorts NaN greater
    than every number, so an all-NaN (or mixed-NaN) weight column
    would otherwise sail past the ``min <= 0`` test and silently
    produce NaN ranks — the exact corruption class this guard exists
    to reject."""
    row = e.agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_ew").alias("_mn"),
        F.sum(F.col("_ew").isNull().cast("long")).alias("_nulls"),
        F.sum(F.isnan(F.col("_ew").cast("double")).cast("long")).alias(
            "_nans"
        ),
    ).first()
    if row["_n"] and (
        (row["_nulls"] or 0) > 0
        or (row["_nans"] or 0) > 0
        or row["_mn"] <= 0.0
    ):
        raise ValueError(
            "pagerank weight_col requires strictly positive, finite, "
            "non-NULL edge weights (found min=%s, nulls=%s, nans=%s)"
            % (row["_mn"], row["_nulls"], row["_nans"])
        )


def _empty_ranks(edges: DataFrame, src_col: str) -> DataFrame:
    """Empty-graph result whose node type MATCHES the input edge
    schema (string ids get a string node column, not a hardcoded
    long — keeps the empty path union-compatible with the non-empty
    one)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField("node", edges.schema[src_col].dataType),
            StructField("rank", DoubleType()),
        ]
    )
    return edges.sparkSession.createDataFrame([], schema)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    undirected: bool = True,
    weight_col: str | None = None,
    tol: float | None = None,
):
    """Power-iteration PageRank over an edge list. Returns
    ``(ranks, history)`` — a ``(node, rank)`` DataFrame summing to 1
    and a per-iteration list of ``(total_mass, l1_residual)``.

    Guarantees (what ``pagerank_invariants`` pins at zero):

    - mass conservation: with ``undirected=True`` every node has
      out-edges (no dangling mass), so each iteration's total rank is
      EXACTLY 1 up to float reduce order;
    - L1 contraction: the update is ``r' = (1-d)/n + d·Pᵀr`` with
      column-stochastic P, so ``‖r_{t+1} − r_t‖₁ ≤ d·‖r_t − r_{t−1}‖₁``
      — residuals shrink geometrically, every iteration, worst case
      (Cormen-style contraction-mapping argument, not an average);
    - teleport floor: every node's final rank is ≥ ``(1−d)/n``;
    - early exit: with ``tol`` set, iteration stops at the FIRST
      recorded residual ≤ tol — ``history`` has at most one entry
      at-or-below tol, and it is the last.

    Per iteration: ONE shuffle join (weighted edges ⋈ ranks on src,
    both sides hash-partitioned on the join key) + ONE groupBy(dst)
    with map-side partial sums; the convergence stats are a 1-row
    aggregate. Driver traffic is O(1) per iteration at any graph
    size. Directed inputs with dangling nodes are supported
    (``undirected=False``): dangling mass re-enters via the uniform
    teleport renormalization each step, keeping total mass 1 — the
    damped-mass frame is the lazily checkpointed one, so the
    surviving-mass probe and the convergence stats share a single
    materialization of the join+groupBy instead of running it twice.

    ``weight_col`` names a positive edge-weight column: each source's
    out-mass splits proportionally to weight (``w = weight /
    sum(weight) over src``) instead of uniformly — the transition
    matrix stays column-stochastic, so every invariant above holds
    unchanged. ``tol`` (L1 residual threshold) adds a convergence
    early exit: the loop stops after the iteration whose residual
    drops to ``tol`` or below, so ``n_iter`` becomes a cap rather
    than an exact count (the same contract as ``kmeans_fit``'s
    ``tol``, similarity.py).
    """
    n_iter = int(n_iter)
    d = float(damping)
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("_ew"))
    e = edges.select(*cols)
    if undirected:
        back = [F.col("dst").alias("src"), F.col("src").alias("dst")]
        if weight_col is not None:
            back.append(F.col("_ew"))
        e = e.unionByName(e.select(*back))
    if weight_col is None:
        deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    else:
        _check_positive_weights(e)
        deg = e.groupBy("src").agg(F.sum("_ew").alias("_deg"))
    # localCheckpoint (the connected-components idiom, dedup.py:885)
    # truncates lineage so iteration t's plan does not embed every
    # prior iteration — without it analysis cost grows superlinearly
    # with n_iter
    out_mass = F.lit(1.0) if weight_col is None else F.col("_ew")
    ew = (
        e.join(deg, "src")
        .select("src", "dst", (out_mass / F.col("_deg")).alias("w"))
        .localCheckpoint(eager=False)  # materialized by iteration 1
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # materializes the nodes checkpoint
    if n == 0:
        return (_empty_ranks(edges, src_col), [])
    # initial ranks are a one-deep projection of the checkpointed
    # node set — no truncation needed yet
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    history: list[tuple[float, float]] = []
    # With no early-exit decision and no dangling-mass probe
    # (tol=None, undirected), NOTHING needs a driver round-trip
    # between iterations: build every iteration lazily and fold all
    # per-iteration stats into ONE action (the checkpointed frames
    # are shared plan nodes — each join+groupBy still executes
    # exactly once, its blocks cached mid-job). n_iter driver syncs
    # → 1; at bench scale this halves the wall of the invariants
    # certifications, and on a real cluster it removes n_iter
    # scheduler round-trips from the critical path.
    batched = tol is None and undirected
    stats_frames: list[DataFrame] = []
    for it in range(n_iter):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # left join from the node set so nodes with no in-links (only
        # possible in the directed case) still receive teleport mass;
        # renormalize by the surviving mass so dangling leakage
        # re-enters uniformly and the total stays exactly 1.
        # The LAZY checkpoint sits HERE, on the damped-mass frame: in
        # directed mode the surviving-mass probe materializes it and
        # the stats aggregate below re-reads the checkpoint blocks —
        # one execution of the join+groupBy per iteration, not two.
        # In undirected mode the stats action is the materializer.
        dmass = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("_in"), F.lit(0.0)) * F.lit(d)).alias(
                    "_dmass"
                ),
            )
            .localCheckpoint(eager=False)
        )
        if undirected:
            # every node has out-edges by construction: no dangling
            # mass, skip the extra aggregation job
            leaked = 0.0
        else:
            surviving = dmass.agg(F.sum("_dmass")).first()[0] or 0.0
            leaked = d - surviving
        new = dmass.select(
            "node",
            (
                F.col("_dmass")
                + F.lit((1.0 - d + leaked) / n)
            ).alias("rank"),
        )
        stats_df = new.join(
            ranks.withColumnRenamed("rank", "_old"), "node"
        ).agg(
            F.sum("rank").alias("_mass"),
            F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("_res"),
        )
        if batched:
            stats_frames.append(
                stats_df.select(F.lit(it).alias("_t"), "_mass", "_res")
            )
        else:
            stats = stats_df.first()
            history.append((float(stats["_mass"]), float(stats["_res"])))
        ranks = new
        if tol is not None and history and history[-1][1] <= tol:
            break
    if batched and stats_frames:
        from functools import reduce

        rows = reduce(
            lambda a, b: a.unionByName(b), stats_frames
        ).collect()
        history = [
            (float(r["_mass"]), float(r["_res"]))
            for r in sorted(rows, key=lambda r: r["_t"])
        ]
    return ranks, history


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    weight_col: str | None = None,
    n_iter: int = 10,
    damping: float = 0.85,
    undirected: bool = True,
    tol: float | None = None,
):
    """Personalized PageRank: the teleport distribution is uniform
    over ``seeds`` instead of over all nodes — ranks measure proximity
    TO THE SEED SET, the similarity-search/recommendation variant of
    :func:`pagerank` (same power iteration, same plan shape: one
    shuffle join + one groupBy per iteration, plus one broadcast join
    of the seed mass — seed sets are small by definition).

    Returns ``(ranks, history)`` with the same laws ``pagerank``
    certifies, personalized: total mass 1 per iteration (dangling /
    non-seed-reachable leakage re-enters via the SEED teleport),
    L1 contraction, and the floor ``rank(s) ≥ (1−d)/|seeds|`` for
    every seed (non-seed nodes have no floor — unreachable ones
    converge to 0, which is the point).
    """
    n_iter = int(n_iter)
    d = float(damping)
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("_ew"))
    e = edges.select(*cols)
    if undirected:
        back = [F.col("dst").alias("src"), F.col("src").alias("dst")]
        if weight_col is not None:
            back.append(F.col("_ew"))
        e = e.unionByName(e.select(*back))
    if weight_col is None:
        deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    else:
        _check_positive_weights(e)
        deg = e.groupBy("src").agg(F.sum("_ew").alias("_deg"))
    out_mass = F.lit(1.0) if weight_col is None else F.col("_ew")
    ew = (
        e.join(deg, "src")
        .select("src", "dst", (out_mass / F.col("_deg")).alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed_set = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .localCheckpoint(eager=False)
    )
    # one action for BOTH graph-size scalars: |nodes| and |seeds ∩
    # nodes| (a broadcast-marked left join folded into a single agg,
    # which also materializes both checkpoints)
    sizes = (
        nodes.join(
            F.broadcast(seed_set.withColumn("_s", F.lit(1))),
            "node",
            "left",
        )
        .agg(
            F.count("*").alias("_n"), F.sum("_s").alias("_ns")
        )
        .first()
    )
    n = int(sizes["_n"] or 0)
    n_seeds = int(sizes["_ns"] or 0)
    if n == 0 or n_seeds == 0:
        return (_empty_ranks(edges, src_col), [])
    # teleport mass per node: 1/|seeds| on seeds, 0 elsewhere — kept
    # as a broadcastable column on the node set
    p = nodes.join(
        F.broadcast(seed_set.withColumn("_p", F.lit(1.0 / n_seeds))),
        "node",
        "left",
    ).select("node", F.coalesce(F.col("_p"), F.lit(0.0)).alias("_p"))
    ranks = p.select("node", F.col("_p").alias("rank"))
    history: list[tuple[float, float]] = []
    # one-action stats batching, same contract as pagerank's: valid
    # exactly when no driver decision separates iterations
    batched = tol is None and undirected
    stats_frames: list[DataFrame] = []
    for it in range(n_iter):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        dmass = (
            p.join(contrib, "node", "left")
            .select(
                "node",
                "_p",
                (F.coalesce(F.col("_in"), F.lit(0.0)) * F.lit(d)).alias(
                    "_dmass"
                ),
            )
            .localCheckpoint(eager=False)
        )
        if undirected:
            leaked = 0.0
        else:
            surviving = dmass.agg(F.sum("_dmass")).first()[0] or 0.0
            leaked = d - surviving
        new = dmass.select(
            "node",
            (
                F.col("_dmass") + F.lit(1.0 - d + leaked) * F.col("_p")
            ).alias("rank"),
        )
        stats_df = new.join(
            ranks.withColumnRenamed("rank", "_old"), "node"
        ).agg(
            F.sum("rank").alias("_mass"),
            F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("_res"),
        )
        if batched:
            stats_frames.append(
                stats_df.select(F.lit(it).alias("_t"), "_mass", "_res")
            )
        else:
            stats = stats_df.first()
            history.append((float(stats["_mass"]), float(stats["_res"])))
        ranks = new
        if tol is not None and history and history[-1][1] <= tol:
            break
    if batched and stats_frames:
        from functools import reduce

        rows = reduce(
            lambda a, b: a.unionByName(b), stats_frames
        ).collect()
        history = [
            (float(r["_mass"]), float(r["_res"]))
            for r in sorted(rows, key=lambda r: r["_t"])
        ]
    return ranks, history


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    undirected: bool = True,
    include_self: bool = True,
):
    """Deterministic SYNCHRONOUS label propagation (community
    detection): every node starts labeled with its own id; each
    iteration it adopts the most frequent label among its neighbors
    (plus, with ``include_self=True`` — the default — one vote for
    its own current label, the standard stabilized variant: pure
    neighbor voting 2-cycles on bipartite structures as small as a
    single edge, self-voting converges cliques of EVERY size to
    their minimum id), ties broken by the SMALLEST label (the
    repo-wide deterministic tie-break rule); isolated or
    in-edge-less nodes keep their current label. Returns
    ``(labels, history)`` — a ``(node, label)`` DataFrame and the
    per-iteration count of nodes that changed label (0 = converged;
    ``n_iter`` is a hard cap, not a promise).

    The training-data use is the same as :func:`pagerank`'s: community
    structure over near-dup / citation / co-occurrence graphs, e.g.
    grouping duplicate-cluster members beyond connected components.

    Scale shape per iteration: one shuffle join (edges ⋈ labels on
    src) + one groupBy((node, label)) count + one per-node window
    top-1 — all hash-partitioned on the node key; driver traffic is
    the single changed-count scalar. Labels can only travel along
    edges, so a node's label always names a node in its own connected
    component (the containment law ``lpa_invariants``-style checks
    rely on)."""
    from pyspark.sql import Window

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    history: list[int] = []
    w = Window.partitionBy("node").orderBy(
        F.col("_cnt").desc(), F.col("label").asc()
    )
    for _ in range(int(n_iter)):
        votes = e.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        if include_self:
            votes = votes.unionByName(labels)
        neigh = votes.groupBy("node", "label").agg(
            F.count("*").alias("_cnt")
        )
        top = (
            neigh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        stepped = (
            labels.join(top, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
                (~F.col("_new").eqNullSafe(F.col("label"))
                 & F.col("_new").isNotNull()).cast("long").alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = stepped.agg(F.sum("_chg")).first()[0] or 0
        history.append(int(n_changed))
        labels = stepped.select("node", "label")
        if n_changed == 0:
            break
    return labels, history


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_iter: int = 20,
    undirected: bool = True,
):
    """Multi-source BFS over an edge list: returns ``(labels, history)``
    where labels is a ``(node, dist)`` DataFrame of every node
    REACHABLE from the seed set within ``max_iter`` hops (seeds at
    dist 0; unreachable nodes are simply absent — the relational
    convention, mirrored by the oracle) and history is the
    per-iteration newly-reached count (0-terminated unless the cap
    hit first).

    The frontier-expansion shape every iterative-graph op here shares:
    per hop, ONE shuffle join (frontier ⋈ edges on src) + ONE
    left-anti join against the known set + distinct — all
    hash-partitioned on the node key; the driver sees only the
    frontier-size scalar. ``localCheckpoint`` truncates lineage per
    hop (the pagerank/CC idiom). Hop count bounds the iteration, so
    wall-clock is O(diameter) rounds like the reference-free CC
    operator — use ``duplicate_clusters``'s pointer jumping when you
    need components, BFS when you need DEPTH from a seed set."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    known = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .select("node", F.lit(0).alias("dist"))
        .localCheckpoint(eager=False)
    )
    frontier = known
    history: list[int] = []
    for depth in range(1, int(max_iter) + 1):
        nxt = (
            e.join(
                frontier.withColumnRenamed("node", "src").drop("dist"),
                "src",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(known, "node", "left_anti")
            .select("node", F.lit(depth).alias("dist"))
            .localCheckpoint(eager=False)
        )
        n_new = nxt.count()
        history.append(int(n_new))
        if n_new == 0:
            break
        known = known.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return known, history


def sssp_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    seed_col: str = "node",
    max_iter: int = 20,
    undirected: bool = True,
):
    """Multi-source WEIGHTED shortest paths (non-negative weights):
    relational Bellman-Ford — per iteration every known distance
    relaxes across its out-edges (``dist(dst) ← min(dist(dst),
    dist(src) + w)``), converging in at most `longest shortest path
    in hops` iterations. Returns ``(labels, history)``: a ``(node,
    dist)`` DataFrame of reachable nodes (seeds at 0.0, unreachable
    absent — the :func:`bfs_distances` convention) and the
    per-iteration count of improved nodes (0-terminated unless the
    ``max_iter`` cap hit first).

    Plan shape per iteration: ONE shuffle join (known ⋈ edges on src)
    + ONE groupBy(node) min folding candidates into the running
    table + a changed-count aggregate — all hash-partitioned on the
    node key, O(1) driver traffic, ``localCheckpoint`` lineage
    truncation per hop. Negative weights are rejected (Bellman-Ford
    detects negative cycles only with |V| iterations; this operator
    targets the non-negative metric/latency/cost case).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    if undirected:
        e = e.unionByName(
            e.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col("w"),
            )
        )
    e = e.localCheckpoint(eager=False)
    if (e.agg(F.min("w")).first()[0] or 0.0) < 0.0:
        raise ValueError("sssp_distances requires non-negative weights")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    known = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .select("node", F.lit(0.0).alias("dist"))
        .localCheckpoint(eager=False)
    )
    history: list[int] = []
    for _ in range(int(max_iter)):
        relaxed = (
            e.join(
                known.withColumnRenamed("node", "src")
                .withColumnRenamed("dist", "_sd"),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("_sd") + F.col("w")).alias("dist"),
            )
        )
        new = (
            known.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        n_improved = (
            new.join(
                known.withColumnRenamed("dist", "_old"), "node", "left"
            )
            .filter(
                F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
            )
            .count()
        )
        history.append(int(n_improved))
        known = new
        if n_improved == 0:
            break
    return known, history


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts — the clustering /
    community-density primitive (how interlinked a near-dup cluster
    or citation neighborhood is). Returns ``(node, n_triangles)``
    with zero-triangle nodes ABSENT (the relational convention
    :func:`bfs_distances` set).

    DEGREE-ORDERED node-iterator (Schank & Wagner 2005, the public
    algorithm every distributed triangle count builds on): orient
    every undirected edge from the endpoint with the smaller
    ``(degree, id)`` to the larger, enumerate wedges as pairs of
    out-edges of the same source, and keep the wedges whose far
    endpoints are themselves an oriented edge. Each triangle
    ``{a,b,c}`` (ordered by degree) is generated EXACTLY ONCE — as
    the wedge at its lowest-degree corner — so no post-dedup.

    Why this survives 100 TB graphs: under degree orientation every
    node's out-degree is bounded by O(√|E|) (the arboricity bound),
    so the wedge join's output is O(|E|^1.5) worst case and far less
    on real skewed graphs — a hub with degree 10^6 contributes
    wedges only through its (few) higher-degree neighbors, not
    deg² pairs. The plan is three hash joins + one groupBy, all
    partitioned on node keys; no driver state."""
    a, b = F.col(src_col), F.col(dst_col)
    e = (
        edges.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    # orient each edge toward the larger (degree, id); carry the far
    # endpoint's order key so the wedge join can order its two legs
    # without re-joining degrees
    ed = (
        e.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("_deg", "_da")
        .join(
            deg.withColumnRenamed("node", "b").withColumnRenamed(
                "_deg", "_db"
            ),
            "b",
        )
    )
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dv"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select("u", F.col("v").alias("x"), F.col("_dv").alias("_dx"))
    o2 = oriented.select("u", F.col("v").alias("y"), F.col("_dv").alias("_dy"))
    wedges = o1.join(o2, "u").filter(
        (F.col("_dx") < F.col("_dy"))
        | ((F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y")))
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("x").alias("node")))
        .unionByName(tri.select(F.col("y").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").alias("n_triangles")
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node has degree ≥ k — the standard density filter for graph
    cleanup (drop weakly-connected riffraff before community
    detection / PageRank; in the training-data setting, isolate the
    densely-interlinked portion of a near-dup or citation graph).
    Returns ``(node, core_degree)`` — surviving nodes with their
    degree INSIDE the core (nodes peeled away are absent, the
    relational convention).

    Iterative peeling (the textbook fixpoint, run relationally):
    per round, compute degrees over the surviving edge set, drop
    nodes below k, and semi-join the edge set down to survivors —
    one groupBy + two semi-joins + one count scalar per round,
    hash-partitioned on node keys, lazy ``localCheckpoint`` lineage
    truncation. Converges in O(peel depth) rounds (each round
    removes EVERY currently-under-k node, not one) — bounded by
    ``max_iter`` as a safety cap. Driver traffic is one scalar per
    round at any graph size."""
    a, b = F.col(src_col), F.col(dst_col)
    e = (
        edges.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # doubled form: one row per (node, neighbor) — degrees are a
    # plain groupBy count
    alive = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        .localCheckpoint(eager=False)
    )
    n_alive = alive.count()  # materializes the doubled-edge checkpoint
    for _ in range(int(max_iter)):
        deg = alive.groupBy("u").agg(F.count("*").alias("_deg"))
        keep = deg.filter(F.col("_deg") >= k).select("u")
        nxt = (
            alive.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
        # ONE scalar per round: the surviving edge count (carried
        # across rounds — edge-count stability ⟺ node-set stability,
        # since a peeled node removes its incident edges)
        n_nxt = nxt.count()
        alive = nxt
        if n_nxt == n_alive or n_nxt == 0:
            break
        n_alive = n_nxt
    return (
        alive.groupBy("u")
        .agg(F.count("*").alias("core_degree"))
        .withColumnRenamed("u", "node")
    )


def top_ranked_per_group(
    ranks: DataFrame,
    members: DataFrame,
    node_col: str = "node",
    group_col: str = "cluster",
) -> DataFrame:
    """Join PageRank scores onto a (node, group) membership table and
    keep each group's top-ranked node — the canonical-representative
    selection step for duplicate clusters (rank ties break on the
    smaller node id, the repo-wide deterministic tie-break rule)."""
    from pyspark.sql import Window

    joined = members.join(
        ranks.withColumnRenamed("node", node_col), node_col
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("rank").desc(), F.col(node_col).asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
