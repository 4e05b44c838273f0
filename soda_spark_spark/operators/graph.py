"""Link-graph operators for web-corpus curation — PageRank on the exact
integer channel.

Why in a training-data engine: crawl-graph centrality is a standard
document-quality prior (the Common Crawl ranking pipelines score hosts
by centrality before content filters ever run); a corpus carrying a
(src, dst) link table can rank its documents with nothing but joins and
aggregations.

Spark-first shape: one iteration = ranks ⋈ edges on src (shuffle on the
edge key), one groupBy(dst) sum, plus a 1-row dangling-mass aggregate
cross-joined broadcast — the classic Pregel step expressed as plain
DataFrame ops, shuffle keys stable across iterations. All arithmetic is
BIGINT with explicit integer division (`DIV`), so every iteration — and
the final ranking — is bit-replayable by an external engine (registry
row `pagerank_topk` replays the whole n_iter loop in chained SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# rank mass is tracked in parts-per-trillion: enough headroom that the
# per-iteration integer-division truncation (at most 1 ppt per edge)
# never disturbs rankings of realistically-sized graphs
RANK_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    n_iter: int = 5,
    damping_m: int = 850,
    dedupe_edges: bool = True,
    cache_iterations: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over a (src, dst) edge table on the exact integer
    channel. `damping_m` is the damping factor in thousandths (850 =
    the canonical 0.85). Per iteration, with SCALE = 1e12 and N nodes:

      base       = ((1000 - dm) * SCALE) DIV (1000 * N)
      dangling   = sum of ranks of nodes with out-degree 0
      r'(v)      = base + (dm * dangling) DIV (1000 * N)
                   + sum over edges u->v of (dm * r(u)) DIV (1000 * deg(u))

    — every quantity a BIGINT, every division an explicit integer DIV,
    so the n_iter-step fixpoint is bit-identical in any engine (each
    DIV truncates <= 1 ppt, so total mass conservation is approximate
    by design; rankings are unaffected at SCALE = 1e12). Nodes are the
    union of both endpoint columns; `dedupe_edges` (default) collapses
    parallel edges first (count-weighted PageRank wants them kept —
    pass False).

    Returns (node, rank_ppt long).

    `cache_iterations` (default) runs the REAL Pregel superstep shape:
    each iteration's ranks are eagerly `localCheckpoint`ed — one
    bounded node-sized job per iteration that BOTH materializes the
    superstep and TRUNCATES its lineage to the stored partitions —
    and the static edge/degree/node frames are cached for the loop's
    duration and released before return. Cost is LINEAR in n_iter;
    superseded checkpoint storage is reclaimed by Spark's
    ContextCleaner as the old frames drop out of reference, so there
    is no caller-owned cache handle. Both halves matter because each
    iteration references the prior ranks TWICE (the dangling-mass
    aggregate and the contribution join): without materialization the
    un-cached chain re-EXECUTES the prior iteration per reference,
    and without lineage truncation even a persisted chain re-ANALYZES
    a logical tree that doubles per iteration — measured on the
    fixture graph either way: n_iter=4 ~9 s, n_iter=6 did not finish
    in 8 min; with superstep checkpoints n_iter=32 runs in seconds.
    `cache_iterations=False` keeps the fully lazy, side-effect-free
    chain — only sane for small n_iter (<= 4) in strictly-lazy
    compositions (it remains the engine-replayability reference: both
    modes are bit-identical, pytest-pinned).

    `checkpoint_dir` selects WHERE superstep materializations live
    (see `_util.materialize_step`): None (default) = executor-local
    `localCheckpoint` — fastest, but an executor loss kills a long job;
    a path = reliable `checkpoint()` against that HDFS/S3/local dir,
    the right choice for multi-hour 100-TB runs. Bit-identical results
    either way (pytest-pinned)."""
    from pyspark.storagelevel import StorageLevel

    from ._util import materialize_step

    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    if not (0 <= damping_m <= 1000):
        raise ValueError("damping_m must be in [0, 1000] (thousandths)")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if dedupe_edges:
        e = e.distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    static_caches: list[DataFrame] = []
    if cache_iterations and n_iter > 0:
        for frame in (e, nodes, deg):
            frame.persist(StorageLevel.MEMORY_AND_DISK)
            static_caches.append(frame)
    # N as a lazy 1-row broadcast (no driver action; the scan-engine
    # meta-row idiom). The iteration loop runs under try/finally so a
    # failed superstep job (e.g. a checkpoint write error) cannot leak
    # the three static caches in a long-lived session.
    try:
        ncnt = nodes.agg(F.count(F.lit(1)).alias("__n"))
        ranks = nodes.crossJoin(F.broadcast(ncnt)).select(
            "node",
            F.expr(f"CAST({RANK_SCALE} DIV __n AS BIGINT)").alias("rank_ppt"),
        )
        for _ in range(n_iter):
            with_deg = ranks.join(deg, ranks["node"] == deg["src"], "left")
            dangling = with_deg.filter(F.col("deg").isNull()).agg(
                F.coalesce(F.sum("rank_ppt"), F.lit(0)).alias("__dang")
            )
            contrib = (
                ranks.join(e, ranks["node"] == e["src"])
                .join(deg, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"CAST(({damping_m} * rank_ppt) DIV (1000 * deg) "
                        "AS BIGINT)"
                    ).alias("__c"),
                )
                .groupBy("node")
                .agg(F.sum("__c").alias("__in"))
            )
            ranks = (
                nodes.join(contrib, "node", "left")
                .crossJoin(F.broadcast(ncnt))
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.expr(
                            f"CAST(((1000 - {damping_m}) * {RANK_SCALE}) "
                            "DIV (1000 * __n) AS BIGINT)"
                        )
                        + F.expr(
                            f"CAST(({damping_m} * __dang) DIV (1000 * __n) "
                            "AS BIGINT)"
                        )
                        + F.coalesce(F.col("__in"), F.lit(0))
                    ).cast("long").alias("rank_ppt"),
                )
            )
            if cache_iterations:
                # materialize the superstep AND truncate lineage: without
                # this, the next iteration's two references to `ranks`
                # double both execution and Catalyst-analysis work
                ranks = materialize_step(ranks, checkpoint_dir)
    finally:
        for frame in static_caches:
            frame.unpersist()
    return ranks


def degree_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node (node, out_degree, in_degree) for a link table — the
    cheap graph-health companion (dangling fraction, hub skew) to read
    before committing a PageRank sweep. One aggregation per direction,
    full-outer merged on the node key."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("out_degree")
    )
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


# HITS scores are tracked in parts-per-million: hub/authority sums reach
# N * SCALE before normalization, and the normalization multiplies by
# SCALE again — ppm keeps that product (N * 1e12 at N ~ 1e6 nodes...
# N * 1e12 <= 9.2e18) inside a signed 64-bit long for graphs up to
# millions of nodes, where the ppt scale PageRank uses would overflow.
HITS_SCALE = 1_000_000


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    n_iter: int = 5,
    dedupe_edges: bool = True,
    cache_iterations: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) on the exact integer
    channel — PageRank's complement for crawl curation: PageRank finds
    globally central pages; HITS separates DIRECTORY pages (hubs: link
    to many good authorities — link farms and index pages score here)
    from CONTENT pages (authorities: linked by many good hubs), the
    distinction a frontier scheduler and a quality prior both want.

    Per iteration, with SCALE = 1e6 and the L1 normalization (the sum-
    normalized variant: rankings are identical to the classic L2 form,
    which needs a square root and therefore floats — L1 keeps every
    step in BIGINT):

      a_raw(v) = sum over edges u->v of hub(u)
      auth(v)  = (a_raw(v) * SCALE) DIV sum(a_raw)      -- 0 if sum = 0
      h_raw(u) = sum over edges u->v of auth(v)         -- the NEW auth
      hub(u)   = (h_raw(u) * SCALE) DIV sum(h_raw)

    starting from hub = max(SCALE DIV N, 1) on every node (the clamp
    keeps graphs with more than SCALE nodes from seeding all-zero;
    any constant positive seed normalizes to identical scores, since
    (c*a*S) DIV (c*A) == (a*S) DIV A exactly). Every quantity is a
    BIGINT, every division explicit integer DIV, so the n_iter
    fixpoint is bit-replayable in any engine. Nodes with no in-edges
    hold authority 0; no out-edges, hub 0.

    Plan shape: one iteration = two edge joins + two groupBys (shuffle
    keys are the edge endpoints, stable across iterations) and two
    1-row total aggregates cross-joined broadcast. `cache_iterations`
    /`checkpoint_dir` follow `pagerank`'s superstep contract: each
    iteration's (node, hub, auth) frame is eagerly materialized and
    its lineage truncated (the prior scores are referenced four times
    per iteration — the un-materialized chain is exponential in
    n_iter), executor-local by default, reliable `checkpoint()` under
    `checkpoint_dir` for multi-hour runs. Bit-identical either way.

    Returns (node, hub_ppm long, auth_ppm long).
    """
    from pyspark.storagelevel import StorageLevel

    from ._util import materialize_step

    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if dedupe_edges:
        e = e.distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    static_caches: list[DataFrame] = []
    if cache_iterations and n_iter > 0:
        for frame in (e, nodes):
            frame.persist(StorageLevel.MEMORY_AND_DISK)
            static_caches.append(frame)
    try:
        ncnt = nodes.agg(F.count(F.lit(1)).alias("__n"))
        scores = nodes.crossJoin(F.broadcast(ncnt)).select(
            "node",
            # GREATEST(..., 1): for N > HITS_SCALE the integer seed
            # SCALE DIV N is 0 and every iteration would stay all-zero
            # (silent zero scores on >1M-node graphs). Any constant
            # positive seed yields bit-identical normalized scores —
            # (c*a*S) DIV (c*A) == (a*S) DIV A exactly, floor of the
            # same rational — so clamping to 1 fixes the huge-graph
            # case without changing results for N <= HITS_SCALE, and
            # keeps the first iteration's __a * SCALE bounded by
            # in_degree * SCALE (no overflow until in_deg ~ 9.2e12).
            F.expr(
                f"GREATEST(CAST({HITS_SCALE} DIV __n AS BIGINT), "
                "CAST(1 AS BIGINT))"
            ).alias("hub_ppm"),
            F.lit(0).cast("long").alias("auth_ppm"),
        )
        for _ in range(n_iter):
            a_raw = (
                scores.join(e, scores["node"] == e["src"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub_ppm").alias("__a"))
            )
            a_tot = a_raw.agg(
                F.coalesce(F.sum("__a"), F.lit(0)).alias("__at")
            )
            auth = a_raw.crossJoin(F.broadcast(a_tot)).select(
                "node",
                F.expr(
                    f"CAST(CASE WHEN __at > 0 THEN (__a * {HITS_SCALE}) "
                    "DIV __at ELSE 0 END AS BIGINT)"
                ).alias("__auth"),
            )
            h_raw = (
                auth.join(e, auth["node"] == e["dst"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("__auth").alias("__h"))
            )
            h_tot = h_raw.agg(
                F.coalesce(F.sum("__h"), F.lit(0)).alias("__ht")
            )
            hub = h_raw.crossJoin(F.broadcast(h_tot)).select(
                "node",
                F.expr(
                    f"CAST(CASE WHEN __ht > 0 THEN (__h * {HITS_SCALE}) "
                    "DIV __ht ELSE 0 END AS BIGINT)"
                ).alias("__hub"),
            )
            scores = (
                nodes.join(hub, "node", "left")
                .join(auth, "node", "left")
                .select(
                    "node",
                    F.coalesce("__hub", F.lit(0)).cast("long").alias("hub_ppm"),
                    F.coalesce("__auth", F.lit(0))
                    .cast("long")
                    .alias("auth_ppm"),
                )
            )
            if cache_iterations:
                scores = materialize_step(scores, checkpoint_dir)
    finally:
        for frame in static_caches:
            frame.unpersist()
    return scores


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    n_iter: int = 5,
    directed: bool = False,
    dedupe_edges: bool = True,
    cache_iterations: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) with
    deterministic tie-breaks — community detection for host/domain
    clustering (group sites that densely interlink before applying
    per-community caps or mixture weights; connected components
    over-merge through single bridge edges, LPA's majority vote does
    not). Labels start as node ids; each SYNCHRONOUS round every node
    adopts the most frequent label among its neighbors (ties -> the
    SMALLEST label; isolated nodes keep their label). Synchronous +
    smallest-label ties makes the n_iter fixpoint a pure function of
    the graph — bit-replayable by an external engine, unlike the
    asynchronous random-order variant the paper defaults to.

    `directed=False` (default) symmetrizes the edge set first
    (communities are about mutual linkage); True propagates along
    edge direction only. Per round: one edges x labels join (shuffle
    on the stable edge key), one (node, label) count aggregate, one
    argmax window per node — all keys uniform. Supersteps follow the
    `pagerank`/`hits` materialization contract (each round's labels
    are referenced by join AND fallback-coalesce; the lazy chain is
    exponential), executor-local by default, reliable under
    `checkpoint_dir`, bit-identical either way.

    Returns (node, community long) — community = the converged label.
    """
    from pyspark.storagelevel import StorageLevel

    from ._util import materialize_step

    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    if dedupe_edges:
        e = e.distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    static_caches: list[DataFrame] = []
    if cache_iterations and n_iter > 0:
        for frame in (e, nodes):
            frame.persist(StorageLevel.MEMORY_AND_DISK)
            static_caches.append(frame)
    try:
        labels = nodes.select("node", F.col("node").alias("community"))
        for _ in range(n_iter):
            nbr = (
                e.join(labels, e["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node"), F.col("community"))
                .agg(F.count(F.lit(1)).alias("__c"))
            )
            w = Window.partitionBy("node").orderBy(
                F.desc("__c"), F.asc("community")
            )
            best = (
                nbr.withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") == 1)
                .select("node", F.col("community").alias("__new"))
            )
            labels = (
                labels.join(best, "node", "left")
                .select(
                    "node",
                    F.coalesce("__new", "community").alias("community"),
                )
            )
            if cache_iterations:
                labels = materialize_step(labels, checkpoint_dir)
    finally:
        for frame in static_caches:
            frame.unpersist()
    return labels
