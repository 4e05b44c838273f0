"""Similarity search over embedding columns (array<float>).

Two paths, one semantics:

- `brute_force_topk`: exact top-k by cosine — broadcast the (small) query
  set against the corpus, score with Catalyst higher-order functions
  (zip_with/aggregate: sequential fold, fully deterministic), rank with a
  per-query window. The correctness baseline.
- `brute_force_topk_numpy`: the same exact computation via mapInPandas +
  numpy matmul (Arrow-batched) — the throughput path for benchmarks; ~10-50x
  faster per core but float summation order differs from the fold.
- `lsh_topk`: random-hyperplane LSH bucketing — the 100TB scale path; probes
  only same/nearby-bucket candidates, trading recall for a ~buckets-fold
  candidate reduction. Recall is measured against brute force in tests.
- `embedding_near_dup_pairs`: all corpus pairs with cosine >= threshold via
  hyperplane-bucket self-join + exact verification.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._util import ensure_parallelism


DEFAULT_QUERY_ROW_BUDGET = 100_000


def _guard_query_side(queries: DataFrame, budget: int | None, op: str) -> None:
    """The top-k operators collect or broadcast the query side BY CONTRACT —
    that contract silently breaks when a caller feeds a huge query table
    (driver OOM / broadcast limit). Enforce a row budget before doing so:
    `limit(budget+1).count()` bounds the check's own cost (it early-exits
    after budget+1 rows; no full scan of a large query side). Pass
    `max_query_rows=None` to skip the check when the caller has already
    sized the input."""
    if budget is None:
        return
    n = queries.limit(budget + 1).count()
    if n > budget:
        raise ValueError(
            f"{op}: query side exceeds max_query_rows={budget} — this "
            "operator collects/broadcasts the query side by contract. Use "
            "knn_join_lsh (distributed shuffle join, no collect) for large "
            "query sides, or raise max_query_rows explicitly."
        )


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in doubles (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast (it must be
    small); scoring runs data-parallel over the corpus with no shuffle, and
    only the rank-k cut shuffles (corpus_rows x n_queries) scored pairs.

    Returns (query_id, neighbor_id, cosine) with rank <= k per query,
    deterministic tie-break on neighbor id. Self-pairs are excluded.
    A query side above `max_query_rows` raises (use `knn_join_lsh`).
    """
    _guard_query_side(queries, max_query_rows, "brute_force_topk")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def brute_force_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    parallelism: int | None = None,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul.

    The query matrix is collected and closure-broadcast; each Arrow batch of
    the corpus computes a (batch x queries) similarity block and keeps its
    local top-k per query; the global rank-k cut shuffles only
    (n_partitions x n_queries x k) rows. Same result set as
    `brute_force_topk` up to float-summation order.

    `parallelism` repartitions a narrow corpus first; leave None for small
    corpora (Python-worker spin-up would dominate) and for sources that are
    already wide.
    """
    import numpy as np
    import pandas as pd

    _guard_query_side(queries, max_query_rows, "brute_force_topk_numpy")
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                continue
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qmat.T  # (batch, queries)
            sims[ids[:, None] == qids[None, :]] = -np.inf  # drop self-pairs
            top = min(k, sims.shape[0])
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]  # per query
            rows = {
                "query_id": np.repeat(qids[None, :], top, axis=0).ravel(),
                "neighbor_id": ids[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=0).ravel(),
            }
            yield pd.DataFrame(rows)

    src = corpus.select(id_col, vec_col)
    if parallelism:
        src = ensure_parallelism(src, parallelism)
    local = src.mapInPandas(score, schema=out_schema)
    local = local.filter(F.col("cosine") != float("-inf"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def exact_near_dup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All corpus pairs with cosine >= threshold, computed exactly via an
    O(n^2) self-join — the verification baseline for the LSH variant. Only
    for small corpora / sampled verification at scale."""
    corpus = ensure_parallelism(corpus)
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine_similarity(F.col("va"), F.col("vb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_signature(
    vec: Column, dim: int, *, planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id: bit_j = sign(v . r_j) packed into a
    long. Hyperplanes are a deterministic seeded pseudo-random matrix baked
    into the plan as literals — no fitting step, same buckets on any cluster.
    """
    rng = random.Random(seed)
    sig = F.lit(0).cast("long")
    for j in range(planes):
        plane = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def _lsh_bucketed_numpy(
    df: DataFrame,
    role_id: str,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int,
    tables: int,
    seed: int,
) -> DataFrame:
    """Arrow/numpy variant of `_lsh_bucketed`: the catalyst melter bakes
    tables x planes x dim literal terms into ONE expression tree (4096
    interpreted HOF multiplies per row at 8x8x64 — measured as the
    dominant cost of `knn_join_lsh`); here the same seeded plane matrix
    computes all signatures per Arrow batch with one einsum. Bucket
    GEOMETRY is identical — same planes, same bit packing — but the
    projection sums in BLAS order, so a dot product sitting exactly on
    the sign boundary can bucket differently from the fold (the
    `brute_force_topk_numpy` float-summation caveat, here once per
    (row, plane)); for an approximate index that is sub-noise."""
    import numpy as np
    import pandas as pd

    mats = []
    for t in range(tables):
        rng = random.Random(seed + t * 7919)
        mats.append(
            [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]
        )
    P = np.array(mats, dtype=np.float64)  # (tables, planes, dim)
    weights = 1 << np.arange(planes, dtype=np.int64)
    vtype = dict(df.dtypes)[vec_col]
    schema = f"{role_id} long, __{role_id}_v {vtype}, tbl int, bkt long"

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            proj = np.einsum("nd,tpd->ntp", X, P)
            sig = ((proj > 0).astype(np.int64) * weights[None, None, :]).sum(
                axis=2
            )  # (n, tables)
            n, T = sig.shape
            yield pd.DataFrame(
                {
                    role_id: np.repeat(ids, T),
                    f"__{role_id}_v": [
                        v for v in pdf[vec_col] for _ in range(T)
                    ],
                    "tbl": np.tile(np.arange(T, dtype=np.int32), n),
                    "bkt": sig.ravel(),
                }
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema=schema
    )


def _lsh_bucketed(
    df: DataFrame,
    role_id: str,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int,
    tables: int,
    seed: int,
) -> DataFrame:
    """Melt a vector table to (role_id, vec, tbl, bkt) — one row per LSH
    table, bucket = packed hyperplane sign bits. Shared by `lsh_topk`
    (broadcast probe) and `knn_join_lsh` (distributed join)."""
    sigs = [
        hyperplane_signature(F.col(vec_col), dim, planes=planes, seed=seed + t * 7919)
        .alias(f"sig{t}")
        for t in range(tables)
    ]
    tagged = df.select(F.col(id_col).alias(role_id), F.col(vec_col).alias(f"__{role_id}_v"), *sigs)
    bands = F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), F.col(f"sig{t}").alias("bkt"))
            for t in range(tables)
        ]
    )
    return tagged.select(
        role_id, f"__{role_id}_v", F.explode(bands).alias("kb")
    ).select(role_id, f"__{role_id}_v", F.col("kb.tbl").alias("tbl"), F.col("kb.bkt").alias("bkt"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 10,
    planes: int = 12,
    tables: int = 4,
    seed: int = 42,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
) -> DataFrame:
    """Approximate top-k: `tables` independent hyperplane signatures; a query
    probes the union of its buckets across tables, then exact-scores only
    those candidates. Candidate volume ~ corpus/2^planes per table.

    The query side is BROADCAST; above `max_query_rows` this raises and
    points at `knn_join_lsh` — the same bucketing as a distributed shuffle
    join, identical results when uncapped.
    """
    _guard_query_side(queries, max_query_rows, "lsh_topk")
    cb = _lsh_bucketed(corpus, "neighbor_id", id_col, vec_col, dim, planes, tables, seed)
    qb = _lsh_bucketed(queries, "query_id", id_col, vec_col, dim, planes, tables, seed)
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__query_id_v", "__neighbor_id_v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__query_id_v"), F.col("__neighbor_id_v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def knn_join_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 10,
    planes: int = 12,
    tables: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = None,
    impl: str = "catalyst",
) -> DataFrame:
    """Distributed approximate k-NN JOIN: both sides may be arbitrarily large
    — no driver collect, no broadcast. Same bucketing and tie-breaks as
    `lsh_topk` (identical results when `max_bucket_size` is None), but the
    bucket join is a shuffle join on (tbl, bkt) and candidates are cut to
    the per-bucket top-k BEFORE the cross-table dedup shuffle: a candidate
    outside the top-k of its own bucket can never enter the global top-k
    (cosine is bucket-independent), so the pre-cut is lossless while
    bounding the dedup input to k * tables rows per query.

    The pre-cut window partitions by (query_id, tbl, bkt) — a superset of
    the join keys — so it rides the join's existing (tbl, bkt) hash
    partitioning with no additional exchange.

    `max_bucket_size` caps corpus rows per (tbl, bkt), dropping rows by
    xxhash64 rank (deterministic): the skew guard for degenerate buckets
    (e.g. all-zero embeddings at 100 TB); recall-lossy only inside
    over-full buckets.
    """
    if impl not in ("catalyst", "numpy"):
        raise ValueError(f"impl must be 'catalyst' or 'numpy', got {impl!r}")
    # impl='numpy': the Arrow signature kernel (`_lsh_bucketed_numpy`) —
    # the throughput path; the catalyst melter remains the
    # oracle-replayable certification configuration (same geometry,
    # float-summation order differs only AT the sign boundary)
    melt = _lsh_bucketed_numpy if impl == "numpy" else _lsh_bucketed
    cb = melt(corpus, "neighbor_id", id_col, vec_col, dim, planes, tables, seed)
    qb = melt(queries, "query_id", id_col, vec_col, dim, planes, tables, seed)
    if max_bucket_size is not None:
        wb = Window.partitionBy("tbl", "bkt").orderBy(
            F.xxhash64("neighbor_id"), F.asc("neighbor_id")
        )
        cb = (
            cb.withColumn("__bn", F.row_number().over(wb))
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    in_bucket = (
        cb.join(qb, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "tbl",
            "bkt",
            cosine_similarity(
                F.col("__query_id_v"), F.col("__neighbor_id_v")
            ).alias("cosine"),
        )
    )
    wpre = Window.partitionBy("query_id", "tbl", "bkt").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    precut = (
        in_bucket.withColumn("__r", F.row_number().over(wpre))
        .filter(F.col("__r") <= k)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        precut.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def ivf_index(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Persistable IVF index — the WRITE side of scalable ANN over a
    growing vector table: fit k-means ONCE, assign every corpus vector
    to its list, and return one self-contained DataFrame holding both
    the assignment rows and the centroid rows (marked `is_centroid`,
    with `vec_id` = list id). Write it to parquet; `ivf_topk(...,
    index=)` then serves queries from the materialized index without
    refitting k-means or re-scanning raw vectors, and `ivf_assign`
    routes NEW vectors to the existing lists so ingestion appends are
    O(new) (same contract as `minhash_band_tags` for dedup).

    Schema: (vec_id, list int, embedding, is_centroid boolean)."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = ensure_parallelism(corpus)
    with_vec = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="__features").fit(with_vec)
    assigned = model.transform(with_vec).select(
        "vec_id",
        F.col("prediction").cast("int").alias("list"),
        "embedding",
        F.lit(False).alias("is_centroid"),
    )
    centers = [
        (int(i), [float(x) for x in np.asarray(c)])
        for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = corpus.sparkSession.createDataFrame(
        [(i, i, v, True) for i, v in centers],
        "vec_id long, list int, embedding array<float>, is_centroid boolean",
    ).select(
        F.col("vec_id").cast(assigned.schema["vec_id"].dataType),
        "list",
        F.col("embedding").cast(assigned.schema["embedding"].dataType),
        "is_centroid",
    )
    return assigned.unionByName(cent_df)


def ivf_assign(
    new: DataFrame,
    index: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Route NEW vectors to an existing `ivf_index`'s lists (nearest
    centroid by L2, ties to the lower list id) — returns rows in the
    index schema, ready to APPEND to the persisted index table. Pure
    Catalyst: broadcast the tiny centroid set, crossJoin, one ranked
    window per new vector. Ingestion cost is O(new x n_lists)."""
    cents = index.filter(F.col("is_centroid")).select(
        F.col("list").alias("__list"), F.col("embedding").alias("__cv")
    )
    v, c = F.col("__v"), F.col("__cv")
    dist2 = _dot(v, v) + _dot(c, c) - F.lit(2.0) * _dot(v, c)
    w = Window.partitionBy("__id").orderBy(dist2.asc(), F.col("__list").asc())
    return (
        ensure_parallelism(new)
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__id").alias("vec_id"),
            F.col("__list").alias("list"),
            F.col("__v").alias("embedding"),
            F.lit(False).alias("is_centroid"),
        )
    )


def ivf_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: cluster the corpus with
    k-means (`n_lists` centroids), then each query exactly scores only the
    vectors in its `n_probe` nearest lists — a corpus/(n_lists/n_probe)
    candidate reduction. The standard ANN scale path next to `lsh_topk`.

    Uses MLlib KMeans (seeded, deterministic per environment); probing joins
    are broadcast on the query side. Centroids are collected to the driver
    (n_lists x dim floats — tiny).

    `index`: a persisted `ivf_index` DataFrame (typically read back from
    parquet). When given, `corpus` is ignored (pass None), NOTHING is
    fitted or re-assigned — assignments and centroids are served from
    the materialized index, so per-query-batch cost is the probe joins
    alone. `n_lists`/`seed` are ignored in that mode.
    """
    import numpy as np

    _guard_query_side(queries, max_query_rows, "ivf_topk")
    if index is not None:
        missing = {"vec_id", "list", "embedding", "is_centroid"} - set(index.columns)
        if missing:
            raise ValueError(
                f"index is missing column(s) {sorted(missing)}; expected an "
                "ivf_index DataFrame (vec_id, list, embedding, is_centroid)"
            )
        assigned = index.filter(~F.col("is_centroid")).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cv"),
            F.col("list").alias("__list"),
        )
        cent_rows = sorted(
            index.filter(F.col("is_centroid")).select("list", "embedding").collect(),
            key=lambda r: r["list"],
        )
        centers = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in cent_rows])
        spark_session = index.sparkSession
    else:
        if corpus is None:
            raise ValueError("corpus is required unless index is given")
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        corpus = ensure_parallelism(corpus)
        with_vec = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
        )
        model = KMeans(k=n_lists, seed=seed, featuresCol="__features").fit(with_vec)
        assigned = model.transform(with_vec).select(
            "neighbor_id", "__cv", F.col("prediction").alias("__list")
        )
        centers = np.array([np.asarray(c) for c in model.clusterCenters()])
        spark_session = corpus.sparkSession

    qrows = queries.select(id_col, vec_col).collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(r[1], dtype=np.float64)
        dists = np.linalg.norm(centers - qv[None, :], axis=1)
        for lst in np.argsort(dists)[:n_probe]:
            probe_rows.append((r[0], list(map(float, r[1])), int(lst)))
    probes = spark_session.createDataFrame(
        probe_rows, "query_id long, __qv array<double>, __list int"
    )

    cand = assigned.join(F.broadcast(probes), "__list").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def ivf_topk_deterministic(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
) -> DataFrame:
    """IVF top-k with DETERMINISTIC centroids: the `n_lists` lowest-id
    vectors serve as list centroids (no k-means fit). Same IVF mechanism as
    `ivf_topk` — assign each corpus vector to its nearest centroid, probe
    the `n_probe` nearest lists per query, exact-score only those — but
    every step is a pure composition of joins/windows over the data, so an
    external engine can replay it exactly (this is the oracle-certifiable
    variant; `ivf_topk` with fitted k-means centroids is the quality path).

    Distances use the expansion |v-c|^2 = v.v + c.c - 2 v.c with sequential
    -fold dot products; ties broken by list id, then neighbor id — fully
    deterministic.
    """
    _guard_query_side(queries, max_query_rows, "ivf_topk_deterministic")
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_lists)
        .select(F.col(id_col).alias("__list_id"), F.col(vec_col).alias("__cv"))
    )

    def dist2(v: Column, c: Column) -> Column:
        return _dot(v, v) + _dot(c, c) - F.lit(2.0) * _dot(v, c)

    def nearest_lists(df: DataFrame, role: str, n: int) -> DataFrame:
        joined = df.select(
            F.col(id_col).alias(role), F.col(vec_col).alias(f"__{role}_v")
        ).crossJoin(F.broadcast(cents))
        w = Window.partitionBy(role).orderBy(
            dist2(F.col(f"__{role}_v"), F.col("__cv")).asc(), F.col("__list_id").asc()
        )
        return (
            joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .select(role, f"__{role}_v", "__list_id")
        )

    assigned = nearest_lists(ensure_parallelism(corpus), "neighbor_id", 1)
    probes = nearest_lists(queries, "query_id", n_probe)
    scored = (
        assigned.join(F.broadcast(probes), "__list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(
                F.col("__query_id_v"), F.col("__neighbor_id_v")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    planes: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Corpus pairs with cosine >= threshold: hyperplane-bucket self-join for
    candidates, exact cosine verification. For threshold t, a pair collides
    in one table with prob (1 - acos(t)/pi)^planes; `tables` independent
    tables drive recall toward 1."""
    sigs_df = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        *[
            hyperplane_signature(F.col(vec_col), dim, planes=planes, seed=seed + t * 104729)
            .alias(f"sig{t}")
            for t in range(tables)
        ],
    )
    bands = F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), F.col(f"sig{t}").alias("bkt"))
            for t in range(tables)
        ]
    )
    buckets = sigs_df.select("id", "v", F.explode(bands).alias("kb")).select(
        "id", "v", F.col("kb.tbl").alias("tbl"), F.col("kb.bkt").alias("bkt")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "id_a", "id_b", cosine_similarity(F.col("va"), F.col("vb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Corpus-level health report for an embedding column — the check a
    training pipeline runs before trusting 100 TB of vectors: count, null
    vectors, dimension drift (min/max length), degenerate all-zero vectors,
    and the norm distribution (min / max / mean).

    One fused aggregation pass (map-side partial agg, no shuffle beyond the
    final single-row combine). Norms are sequential-fold doubles per row
    (deterministic); the cross-row mean uses an exact DECIMAL(38,6) sum of
    norms rounded to 6 places, so the result is partition-count invariant
    and bit-reproducible in any engine (`avg_norm = CAST(sum AS DOUBLE)/n`).

    The per-row fold is an interpreted higher-order function, so the input
    is spread across the cluster first (`ensure_parallelism`).
    """
    from ._util import ensure_parallelism

    v = F.col(vec_col)
    df = ensure_parallelism(df)
    norm = F.when(v.isNotNull(), _norm(v))
    norm6 = F.round(norm, 6).cast("decimal(38,6)")
    zero = F.when(
        v.isNotNull() & (F.size(F.filter(v, lambda x: x != 0.0)) == 0), 1
    ).otherwise(0)
    n_valid = F.count(norm)
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long").alias("null_vecs"),
        F.min(F.size(v)).cast("long").alias("min_dims"),
        F.max(F.size(v)).cast("long").alias("max_dims"),
        F.sum(zero).cast("long").alias("zero_vecs"),
        F.min(norm).alias("min_norm"),
        F.max(norm).alias("max_norm"),
        (F.sum(norm6).cast("double") / n_valid).alias("avg_norm"),
    )


def kmeans_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    *,
    n_iter: int = 3,
    impl: str = "kernel",
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's k-means over INTEGER vectors with an exact
    arithmetic channel — cluster quantized embeddings
    (`quantize_embeddings` int8 qvecs, or any array<int/long> column)
    deterministically enough that an external engine replays the
    identical clustering: squared-Euclidean distances are integer sums
    (order-independent, no float-accumulation divergence), centroid
    updates are floor(sum/count) (exact while |sum| < 2^53 — holds
    through ~7e10 int8 values per cluster), argmin ties break to the
    lowest cluster id, and initialization is the k vectors with the
    smallest ids (pure function of the data, no RNG). Floating-point
    k-means is NOT reproducible across engines or even partitionings
    (FP addition is order-dependent); quantize-then-cluster buys
    bit-stable assignments for the price quantization already paid.

    Iteration t: assign every vector to its nearest centroid, then
    recompute each centroid as the per-dimension floored mean of its
    members (clusters that lose all members keep their previous
    centroid). After `n_iter` cycles the FINAL centroids produce the
    returned assignment. Returns (assignments, centroids):
    assignments = (id_col, cluster, dist) under the final centroids,
    centroids = (cluster, centroid array<long>).

    Scale shape: the per-iteration driver state is the k x dim centroid
    table (KBs — the classic Lloyd contract); the update is one
    (cluster, dim) aggregation. Assignment impls, BIT-IDENTICAL by
    construction (pytest-pinned):

    - impl='kernel' (default): Arrow-batched numpy matmul over the
      |v-c|^2 = v.v + c.c - 2 v.c expansion. Every intermediate is an
      integer below 2^53 for int8-range vectors (|x| <= 127, dim into
      the thousands), so float64 matmul is EXACT — no float-edge caveat
      like the raw-float operators — and numpy argmin's first-minimum
      IS the lowest-cluster tie-break. The 100-TB default: one matmul
      pass per batch instead of n*dim*k generated rows.
    - impl='catalyst': posexplode + broadcast-centroid join + map-side-
      combined (id, cluster) sums, all whole-stage codegen — the pure
      cross-engine reference the `kmeans_clusters` oracle row replays
      to the last tie in SQL."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    if impl not in ("kernel", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    spark = df.sparkSession
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<long>").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    expl = ensure_parallelism(pts).select(
        "__id", F.posexplode("__v").alias("__pos", "__x")
    )
    init = pts.orderBy(F.asc("__id")).limit(k).collect()
    if not init:
        raise ValueError("no non-null vectors to cluster")
    cents: list[tuple[int, list[int]]] = [
        (cid, list(r["__v"])) for cid, r in enumerate(init)
    ]

    def _cent_rows(cs):
        return spark.createDataFrame(
            [(cid, pos, int(val)) for cid, v in cs for pos, val in enumerate(v)],
            "cluster int, __pos int, __c long",
        )

    def _assign_catalyst(cs):
        d = (
            expl.join(F.broadcast(_cent_rows(cs)), "__pos")
            .groupBy("__id", "cluster")
            .agg(
                F.sum(
                    (F.col("__x") - F.col("__c")) * (F.col("__x") - F.col("__c"))
                ).alias("__d")
            )
        )
        w = Window.partitionBy("__id").orderBy(F.asc("__d"), F.asc("cluster"))
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__id", "cluster", "__d")
        )

    def _assign_kernel(cs):
        import numpy as np  # noqa: F401 — import check before plan build
        import pandas as pd  # noqa: F401

        cmat = [list(v) for _, v in cs]
        id_type = dict(pts.dtypes)["__id"]

        def run(batches):
            import numpy as np
            import pandas as pd

            C = np.asarray(cmat, dtype=np.float64)  # (k, dim)
            cc = (C * C).sum(axis=1)  # exact: ints < 2^53
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["__v"].to_numpy().tolist()).astype(np.float64)
                xx = (X * X).sum(axis=1)
                d = xx[:, None] + cc[None, :] - 2.0 * (X @ C.T)
                best = d.argmin(axis=1)  # first min == lowest cluster id
                yield pd.DataFrame(
                    {
                        "__id": pdf["__id"],
                        "cluster": best.astype(np.int32),
                        "__d": d[np.arange(len(best)), best].astype(np.int64),
                    }
                )

        return pts.mapInPandas(
            run, schema=f"__id {id_type}, cluster int, __d long"
        )

    _assign = _assign_kernel if impl == "kernel" else _assign_catalyst

    for _ in range(n_iter):
        sums = (
            _assign(cents)
            .join(expl, "__id")
            .groupBy("cluster", "__pos")
            .agg(F.sum("__x").alias("__s"), F.count(F.lit(1)).alias("__n"))
        )
        new_rows = sums.select(
            "cluster", "__pos",
            F.floor(F.col("__s") / F.col("__n")).cast("long").alias("__c"),
        ).collect()  # k x dim rows — bounded driver state (Lloyd contract)
        by_cid: dict[int, dict[int, int]] = {}
        for r in new_rows:
            by_cid.setdefault(r["cluster"], {})[r["__pos"]] = r["__c"]
        cents = [
            (
                cid,
                [by_cid[cid][p] for p in range(len(v))]
                if cid in by_cid
                else v,  # empty cluster keeps its previous centroid
            )
            for cid, v in cents
        ]
    assignments = _assign(cents).select(
        F.col("__id").alias(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.col("__d").alias("dist"),
    )
    centroids = spark.createDataFrame(
        [(cid, v) for cid, v in cents], "cluster long, centroid array<long>"
    )
    return assignments, centroids


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, *, impl: str = "kernel"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the standard
    4x storage/IO compression for 100 TB vector tables (scan half the
    bytes, dequantize on the fly as q * scale; max elementwise error is
    scale/2).

    Per vector: scale = max|v| / 127; q[i] = floor(v[i]/scale + 0.5),
    which lands in [-127, 127] with no clamp (|v| <= max|v| by
    definition). The explicit floor(x + 0.5) formula — rather than an
    engine round() — keeps the result bit-reproducible across engines
    AND implementations: every path evaluates the identical IEEE double
    expression, so there is no round-half-to-even vs half-away
    disagreement to hit. All-zero (or empty) vectors get scale 0.0 and
    an all-zero qvec; a null vector gets scale 0.0 and a null qvec.

    impl='kernel' (default): Arrow-batched numpy `mapInPandas` — rows are
    grouped by vector length into (n, dims) float64 matrices and
    quantized with whole-matrix ops (same strategy as
    `functions/xxhash.py`). The Catalyst formulation runs the per-element
    arithmetic through interpreted `transform` lambdas (ArrayTransform is
    outside whole-stage codegen — the hazard class PLANS §14 measured at
    ~9x), so the kernel is the 100-TB default; bit-parity between the two
    impls is pytest-pinned.

    impl='catalyst': pure Catalyst array transform — no Python workers,
    cross-engine oracle reference. No shuffle, no collect in either path.
    Returns (id, scale, qvec array<int>)."""
    if impl == "catalyst":
        v = F.col(vec_col)
        ma = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        scale = F.when(ma > 0, ma / F.lit(127.0)).otherwise(F.lit(0.0))
        qvec = F.when(
            ma > 0,
            F.transform(
                v,
                lambda x: F.floor(
                    x.cast("double") / (ma / F.lit(127.0)) + F.lit(0.5)
                ).cast("int"),
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0)))
        return df.select(
            F.col(id_col), scale.alias("scale"), qvec.alias("qvec")
        )
    if impl != "kernel":
        raise ValueError(f"unknown impl {impl!r}")

    import numpy as np
    import pandas as pd

    def _quantize(batches):
        for pdf in batches:
            vals = pdf[vec_col].to_numpy()
            n = len(vals)
            scales = np.zeros(n, dtype=np.float64)
            qvecs: list = [None] * n
            lens = np.fromiter(
                (-1 if v is None else len(v) for v in vals), np.int64, n
            )
            for length in np.unique(lens):
                idx = np.nonzero(lens == length)[0]
                if length == -1:
                    continue  # null vec: scale 0.0, qvec null
                if length == 0:
                    for i in idx:
                        qvecs[i] = np.empty(0, dtype=np.int32)
                    continue
                # C-level stack of the (already-numpy) Arrow list values;
                # float32 -> float64 widening is exact
                mat = np.stack(vals[idx].tolist()).astype(np.float64, copy=False)
                ma = np.abs(mat).max(axis=1)
                pos = ma > 0
                scales[idx] = np.where(pos, ma / 127.0, 0.0)
                q = np.zeros_like(mat, dtype=np.int32)
                if pos.any():
                    # identical IEEE sequence to the Catalyst expression:
                    # divide by (ma/127.0), add 0.5, floor
                    q[pos] = np.floor(
                        mat[pos] / (ma[pos] / 127.0)[:, None] + 0.5
                    ).astype(np.int32)
                for j, i in enumerate(idx):
                    qvecs[i] = q[j]
            yield pd.DataFrame(
                {"id": pdf[id_col], "scale": scales, "qvec": qvecs}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    out = ensure_parallelism(df.select(F.col(id_col), F.col(vec_col))).mapInPandas(
        _quantize, schema=f"id {id_type}, scale double, qvec array<int>"
    )
    return out.withColumnRenamed("id", id_col)


# ---------------------------------------------------------------------------
# sparse token-vector document similarity (the TF/TF-IDF classic)
# ---------------------------------------------------------------------------


def token_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lowercase: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """Sparse bag-of-words vectors as a (id, tok, tf) table — the join-
    friendly sparse representation (one row per nonzero coordinate), the
    input to `sparse_cosine_pairs`/`sparse_cosine_topk`.

    `max_df` drops tokens whose DOCUMENT frequency exceeds the cutoff —
    the stop-token prune every sparse all-pairs similarity join needs at
    scale: a token appearing in d documents contributes d*(d-1)/2
    candidate pairs, so the Zipf head ('the': d ~ corpus size) is both a
    quadratic blowup and a near-zero-information coordinate. With
    max_df = D the per-token fanout is bounded by D^2 pairs.

    Plan: explode -> per-(id, tok) count (one shuffle on (id, tok) —
    uniformly hashed, skew-free) -> optional document-frequency prune
    (groupBy tok + semi-join; map-side partials absorb the Zipf head)."""
    occ = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(
                    F.trim(F.lower(F.col(text_col)) if lowercase else F.col(text_col)),
                    r"\s+",
                )
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("__id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_df is not None:
        keep = (
            occ.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("tok")
        )
        occ = occ.join(keep, "tok", "left_semi")
    return occ.withColumnRenamed("__id", id_col)


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_cosine: float = 0.5,
    max_df: int | None = 1000,
    lowercase: bool = True,
) -> DataFrame:
    """All document pairs with bag-of-words cosine similarity >=
    `min_cosine` — the sparse-vector complement to the dense
    `embedding_near_dup_pairs` (no embeddings needed; catches lexical
    near-dups that MinHash's set-Jaccard misses when term FREQUENCY
    matters, e.g. log spam with permuted repetition).

    cosine(a, b) = dot(tf_a, tf_b) / (||tf_a|| * ||tf_b||), computed as
    exact BIGINT dot/norm sums with one final fixed-order double step
    (dot / (sqrt(na) * sqrt(nb))) — correctly-rounded IEEE ops, so any
    engine reproduces the value bit-for-bit.

    Plan (round 20): token_vectors (with the `max_df` stop-token prune —
    REQUIRED at scale, see token_vectors; pass None only on
    verification-sized corpora) -> per-doc squared norm as a window sum
    over the id partition, RIDING the melted rows as one long -> self-
    join on tok with id_a < id_b -> ONE groupBy pair for the dot product
    AND both norms (min() — constant within the pair group) -> threshold
    filter. The old shape aggregated a separate norm table and joined it
    onto the PAIR-grain result twice; the pair table dwarfs the melt on
    near-dup-heavy corpora (measured 490k pairs from a 1000-doc slice),
    so carrying one extra long through the tok exchange is strictly
    cheaper (6 -> 4 jobs, 13 -> 9 stages, 4.2 -> 2.9 s at that slice).
    The pair shuffle key (id_a, id_b) is uniformly hashed; per-token
    fanout is bounded by max_df^2."""
    occ = token_vectors(
        df, id_col, text_col, lowercase=lowercase, max_df=max_df
    )
    occ = occ.withColumn(
        "__n2",
        F.sum(F.col("tf") * F.col("tf")).over(Window.partitionBy(id_col)),
    )
    a = occ.select(
        F.col(id_col).alias("id_a"), "tok",
        F.col("tf").alias("tf_a"), F.col("__n2").alias("__na"),
    )
    b = occ.select(
        F.col(id_col).alias("id_b"), "tok",
        F.col("tf").alias("tf_b"), F.col("__n2").alias("__nb"),
    )
    dots = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("tf_a") * F.col("tf_b")).alias("__dot"),
            F.min("__na").alias("__na"),
            F.min("__nb").alias("__nb"),
        )
    )
    cos = (
        F.col("__dot").cast("double")
        / (F.sqrt(F.col("__na").cast("double")) * F.sqrt(F.col("__nb").cast("double")))
    )
    return dots.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= min_cosine
    )


def sparse_cosine_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    min_cosine: float = 0.0,
    max_df: int | None = 1000,
    lowercase: bool = True,
) -> DataFrame:
    """Top-k most-similar documents per document under bag-of-words
    cosine (symmetric: each pair feeds both endpoints' rankings).
    Deterministic tie-break (cosine desc, neighbor id asc). One window
    per direction over the pair table — the pair table is already
    max_df-bounded, so the window partitions are small."""
    pairs = sparse_cosine_pairs(
        df,
        id_col,
        text_col,
        min_cosine=min_cosine,
        max_df=max_df,
        lowercase=lowercase,
    )
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("neighbor_id"), "cosine"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("id"), F.col("id_a").alias("neighbor_id"), "cosine"
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication over embeddings
# ---------------------------------------------------------------------------


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    max_cluster_size: int | None = 100_000,
    impl: str = "kernel",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) semantic dedup:
    cluster the embedding space, then — within each cluster only — drop
    every vector whose cosine similarity to a LOWER-ID cluster member is
    >= `threshold`. Near-duplicate *meaning* (paraphrases, templated
    rewrites) is removed without any pairwise pass over the full corpus:
    candidate pairs exist only inside a cluster, so total pair work is
    sum(|cluster|^2) instead of |corpus|^2.

    Deterministic contract (the oracle-replayable configuration, same as
    `ivf_topk_deterministic`): centroids are the `n_clusters` lowest-id
    vectors; assignment ranks by the |v-c|^2 = v.v + c.c - 2 v.c
    expansion with (distance, list_id) ties; removal is greedy-by-id —
    a vector is dropped iff ANY lower-id member of its cluster is
    >= threshold similar, regardless of whether that member is itself
    dropped (no transitive chasing — pure self-join semantics an
    external engine replays exactly). Extends the reference's
    single-table scan surface (reference `src/sodaspark/scan.py:424-474`)
    with the corpus-curation pass its data model never had.

    Scale: assignment is a broadcast-centroid crossJoin + per-vector
    rank (no corpus shuffle beyond the window); the pair stage shuffles
    on cluster id. A degenerate corpus that lands everything in one
    cluster would pay O(n^2) — `max_cluster_size` bounds that: clusters
    larger than the cap keep ALL members (conservative: dedup is skipped
    there, never silently dropped rows) and are reported via the
    `cluster_capped` output column so the caller can re-run those
    clusters at higher `n_clusters`. At 100 TB, size n_clusters so the
    expected cluster is ~1-10k vectors (the paper uses ~sqrt(n) to
    n/1000 clusters) and the per-cluster self-join stays executor-local.

    impl='kernel' (default): Arrow-batched numpy — centroid assignment
    is one `mapInPandas` matmul over the corpus (centroids collected
    once, bounded by `n_clusters`), in-cluster pair checking one
    `applyInPandas` blocked Gram-matrix pass per cluster. The Catalyst
    formulation's sequential-fold dot products are interpreted
    per-element (the PLANS §14 hazard class; measured ~10x slower at
    40k x 64-dim), so the kernel is the scale default. impl='catalyst'
    is the pure-Catalyst cross-engine certification reference; the two
    agree exactly away from float-tie edges (numpy matmul sums in a
    different order than the fold — survivor parity on real corpora is
    pytest-pinned, exact tie-breaks are only contractual under
    'catalyst'). Both impls require uniform vector dims and non-null
    vectors.

    Returns the surviving (id_col, cluster_id, cluster_capped) rows.
    """
    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    if impl not in ("kernel", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "kernel":
        return _semantic_dedup_kernel(
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            n_clusters=n_clusters,
            threshold=threshold,
            max_cluster_size=max_cluster_size,
        )
    # Centroids are the n_clusters lowest-id vectors — a BOUNDED collect
    # (the kernel impl already collects exactly these), which lets the
    # per-centroid distances be evaluated as ONE literal-array argmin
    # per corpus row instead of a broadcast crossJoin. The old shape
    # paid the n x k row blowup TWICE (a min(struct) SortAggregate for
    # the meta branches, a ranked-window pass for the Gram pair
    # branches) and shipped the embedding payload through TWO exchanges
    # (the window's __vid shuffle, then the pair stage's cluster_id
    # shuffle). With the argmin inline, assignment is a map-side
    # projection: the payload crosses exactly one exchange (cluster_id)
    # and the meta branches shuffle (id, cluster) only.
    #
    # Exactness: literal doubles are bit-equal to the old
    # cast(float-as-double) column values, __cv.__cv is pre-folded in
    # Python with the same left-fold add/mul order `_dot` uses, v.v is
    # hoisted (same value, evaluated once instead of once per
    # centroid), and array_min on struct(__d, __list_id) is the same
    # (distance asc, list asc) total order min(struct)/the ranked
    # window used — assignments are bit-identical (pytest-pinned vs the
    # kernel reference and the oracle).
    cent_rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_clusters)
        .select(F.col(id_col).alias("__list_id"), F.col(vec_col).alias("__cv"))
        .collect()
    )
    if not cent_rows:
        # empty corpus: zero rows, same schema/types as the main path
        return corpus.select(
            F.col(id_col),
            F.col(id_col).alias("cluster_id"),
            F.lit(False).alias("cluster_capped"),
        ).limit(0)
    id_type = corpus.schema[id_col].dataType

    def _py_selfdot(vec) -> float:
        # replicate _dot(c, c)'s sequential fold exactly: per element one
        # double*double product, accumulated left-to-right in doubles
        acc = 0.0
        for x in vec:
            acc = acc + float(x) * float(x)
        return acc

    # one literal array of (list_id, centroid, centroid.centroid) structs,
    # consumed by a single transform lambda: the dist2 fold appears ONCE
    # in the expression tree however large n_clusters is (an unrolled
    # per-centroid struct list at n_clusters=64 made analysis/codegen
    # time visible in the A/B)
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(r["__list_id"]).cast(id_type).alias("__list_id"),
                F.lit([float(x) for x in r["__cv"]]).alias("__cv"),
                F.lit(_py_selfdot(r["__cv"])).alias("__cc"),
            )
            for r in cent_rows
        ]
    )
    cands = F.transform(
        cent_lit,
        lambda c: F.struct(
            (
                F.col("__vv")
                + c["__cc"]
                - F.lit(2.0) * _dot(F.col("__v"), c["__cv"])
            ).alias("__d"),
            c["__list_id"].alias("__list_id"),
        ),
    )
    base = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v"))
        .withColumn("__vv", _dot(F.col("__v"), F.col("__v")))
        .select("__vid", "__v", F.array_min(cands).alias("__best"))
    )
    # META branches (size census + survivor projection): aggregate per id
    # so duplicate-id inputs keep the old min-over-all-pairs semantics;
    # the exchange carries (id, best) only and is AQE-reused by both.
    assigned_meta = (
        base.groupBy("__vid")
        .agg(F.min("__best").alias("__best"))
        .select("__vid", F.col("__best.__list_id").alias("cluster_id"))
    )
    # FULL branch (Gram pairs): plain projection — no window, no extra
    # exchange; the pair stage's own cluster_id shuffle is the only one
    # the payload crosses.
    assigned = base.select(
        "__vid", "__v", F.col("__best.__list_id").alias("cluster_id")
    )
    sizes = assigned_meta.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("__csize")
    )
    if max_cluster_size is not None:
        sizes = sizes.withColumn(
            "cluster_capped", F.col("__csize") > F.lit(max_cluster_size)
        )
    else:
        sizes = sizes.withColumn("cluster_capped", F.lit(False))
    eligible = assigned.join(F.broadcast(sizes), "cluster_id").filter(
        ~F.col("cluster_capped")
    )
    a = eligible.select(
        "cluster_id", F.col("__vid").alias("__ida"), F.col("__v").alias("__va")
    )
    b = eligible.select(
        "cluster_id", F.col("__vid").alias("__idb"), F.col("__v").alias("__vb")
    )
    removed = (
        a.join(b, "cluster_id")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(
            cosine_similarity(F.col("__va"), F.col("__vb")) >= F.lit(threshold)
        )
        .select(F.col("__idb").alias("__vid"))
        .distinct()
    )
    return (
        assigned_meta.join(F.broadcast(sizes), "cluster_id")
        .join(removed, "__vid", "left_anti")
        .select(
            F.col("__vid").alias(id_col), "cluster_id", "cluster_capped"
        )
    )


def _semantic_dedup_kernel(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    threshold: float,
    max_cluster_size: int | None,
) -> DataFrame:
    """numpy implementation of `semantic_dedup` (see its docstring).
    Assignment: centroids (the n_clusters lowest-id vectors — bounded
    collect) broadcast in the task closure, one matmul per Arrow batch,
    argmin ties to the lowest list id like the Catalyst window. Pair
    stage: per-cluster blocked Gram matrix in id-sorted order — a
    member is removed iff any lower-id member scores >= threshold; peak
    memory per task is block_rows x |cluster| floats, with |cluster|
    bounded by `max_cluster_size`.

    The assignment runs in two Arrow shapes: a META variant emitting
    only (id, cluster) — serving the cluster-size census and the final
    survivor projection, where the vector is dead weight — and a FULL
    variant that carries the vector through to the Gram stage. The
    embedding payload crosses the Python->JVM boundary exactly once
    (the Gram branch) instead of on every consumer of the assignment."""
    import numpy as np
    import pandas as pd

    cent_rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_clusters)
        .select(F.col(id_col), F.col(vec_col))
        .collect()
    )
    if not cent_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster_id long, cluster_capped boolean"
        )
    list_ids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    C = np.array([list(r[1]) for r in cent_rows], dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    def _nearest(pdf) -> "np.ndarray":
        # Series.tolist() + one np.array call: the row loop stays in C
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        d2 = (X * X).sum(axis=1)[:, None] + c2[None, :] - 2.0 * (X @ C.T)
        return d2.argmin(axis=1)  # first min -> lowest list id

    def _assign_meta(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "__vid": pdf[id_col].to_numpy(),
                    "cluster_id": list_ids[_nearest(pdf)],
                }
            )

    def _assign_full(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "__vid": pdf[id_col].to_numpy(),
                    "__v": pdf[vec_col],
                    "cluster_id": list_ids[_nearest(pdf)],
                }
            )

    src = ensure_parallelism(corpus)
    assigned = src.mapInPandas(
        _assign_meta, schema="__vid long, cluster_id long"
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__csize"))
    if max_cluster_size is not None:
        sizes = sizes.withColumn(
            "cluster_capped", F.col("__csize") > F.lit(max_cluster_size)
        )
    else:
        sizes = sizes.withColumn("cluster_capped", F.lit(False))
    assigned = assigned.join(F.broadcast(sizes), "cluster_id")
    eligible = (
        src.mapInPandas(
            _assign_full,
            schema=(
                f"__vid long, __v {dict(corpus.dtypes)[vec_col]}, "
                "cluster_id long"
            ),
        )
        .join(F.broadcast(sizes), "cluster_id")
        .filter(~F.col("cluster_capped"))
        .select("cluster_id", "__vid", "__v")
    )

    BLOCK = 1024

    def _removed(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"__vid": np.empty(0, dtype=np.int64)})
        pdf = pdf.sort_values("__vid")
        ids = pdf["__vid"].to_numpy()
        V = np.array(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0.0] = 1.0
        V = V / norms[:, None]
        out: list = []
        for s in range(1, n, BLOCK):
            e = min(s + BLOCK, n)
            sims = V[s:e] @ V[:e].T  # rows s..e vs ALL lower-or-equal rows
            # row r checks columns < s+r (strictly lower ids): mask the
            # upper-triangle-plus-diagonal away and reduce per row in C
            valid = np.arange(e)[None, :] < (s + np.arange(e - s))[:, None]
            hit = ((sims >= threshold) & valid).any(axis=1)
            out.extend(ids[s:e][hit])
        return pd.DataFrame({"__vid": np.array(out, dtype=np.int64)})

    removed = eligible.groupBy("cluster_id").applyInPandas(
        _removed, schema="__vid long"
    )
    return (
        assigned.join(removed, "__vid", "left_anti")
        .select(F.col("__vid").alias(id_col), "cluster_id", "cluster_capped")
    )


# ---------------------------------------------------------------------------
# BM25 full-text retrieval — persisted inverted-index artifact + search
# ---------------------------------------------------------------------------


def bm25_index(df: DataFrame, id_col: str, text_col: str,
               *, lowercase: bool = True) -> DataFrame:
    """Build the BM25 inverted-index artifact for a document corpus.
    Three row kinds share one schema (term, id, tf, dl, df):

    - postings: one row per (term, doc) with the term frequency `tf`
      and the doc's token length `dl` (df NULL);
    - term dictionary: one row per DISTINCT term (id NULL) carrying the
      term's document frequency `df` — known at build time, so searches
      resolve df for their query terms from this tiny section instead
      of re-aggregating the postings, and a `max_df` stop term drops
      out of the search's term list BEFORE its postings are ever read;
    - ONE metadata row (term NULL) carrying the corpus totals (n_docs
      in `tf`, total token count in `dl`).

    Persist the result to parquet and hand it to `bm25_search` — the
    index is built once per corpus snapshot, searches never re-read the
    raw text (the same persisted-artifact contract as the dedup
    sketches and the n-gram LM model). Sort by term on write
    (`.repartition("term").sortWithinPartitions("term")`) so the
    search's pushed term IN-filter skips whole row groups. v1 indexes
    (no `df` column) stay readable — `bm25_search` falls back to the
    per-search df aggregation. Extends the reference's single-table
    scan surface (reference `src/sodaspark/scan.py:424-474`) with the
    retrieval pass its data model never had.

    Tokenization is the corpus-wide idiom shared with
    `sparse_cosine_pairs`: lower, trim, split on whitespace runs, drop
    empties — exactly replayable in ANSI SQL.

    Scale shape: explode -> one (id, term) aggregation (map-side
    combined) -> per-doc length folded in as a window sum over the
    (id)-partitioned postings (a doc's posting list is bounded by its
    distinct-term count, so the window partition is always small — no
    separate corpus-sized aggregation or shuffle join) + one (term)
    aggregation for df; the metadata totals aggregate the per-doc token
    counts directly off the token stream. No driver-side state."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(
                F.trim(F.lower(F.col(text_col)) if lowercase else F.col(text_col)),
                r"\s+",
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    occ = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    id_type = dict(occ.dtypes)["id"]
    postings = occ.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("id")).cast("long")
    ).select(
        "term", "id", "tf", "dl", F.lit(None).cast("long").alias("df")
    )
    dictionary = occ.groupBy("term").agg(
        F.lit(None).cast(id_type).alias("id"),
        F.lit(None).cast("long").alias("tf"),
        F.lit(None).cast("long").alias("dl"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    meta = dl.agg(
        F.lit(None).cast("string").alias("term"),
        F.lit(None).cast(id_type).alias("id"),
        F.count(F.lit(1)).cast("long").alias("tf"),   # n_docs
        F.sum("dl").cast("long").alias("dl"),          # total tokens
        F.lit(None).cast("long").alias("df"),
    )
    return postings.unionByName(dictionary).unionByName(meta)


def bm25_search(
    index: DataFrame,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    term_col: str = "term",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    rank_by: str = "exact",
    max_query_rows: int | None = 10_000,
) -> DataFrame:
    """Top-k BM25 retrieval against a `bm25_index` artifact. `queries`
    is a (query_id, term) long-format table — small BY CONTRACT (it is
    collected/broadcast against the postings; `_guard_query_side`
    enforces `max_query_rows`, default 10k query-term rows).

    Two score channels per (query, doc):

    - `score_p12` (BIGINT, certified): the exact-replay channel.
      k1/b are taken at 3-decimal precision (k1m = round(1000*k1)):
        idf_ppm = floor(1e6 * (2N - 2df + 1) / (2df + 1))
                  -- the BM25+ odds ratio (N - df + .5)/(df + .5),
                     cleared of halves; monotone in the log idf;
                     exact BIGINTs finished by one correctly-rounded
                     double divide
        tfn_ppm = floor(1e6 * num / den) with num/den evaluated as a
                  FIXED left-associated chain of IEEE doubles:
                  num = tf * (1000+k1m) * 1000 * TL
                  den = 1000000*TL*tf + k1m*(1000-bm)*TL + k1m*bm*dl*N
                  -- == tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                     with avgdl = TL/N. The double chain (rather than
                     BIGINT products) is deliberate: the TL factors
                     overflow int64 once the corpus passes ~4e12 total
                     tokens (a few TB of text), while every IEEE engine
                     rounds the identical expression tree identically —
                     so the channel stays engine-replayable AND safe at
                     100 TB.
      contribution = idf_ppm * tfn_ppm, summed as BIGINTs (associative,
      order-free). The idf_ppm*tfn_ppm BIGINT product bounds the
      certified channel to corpora where the rarest scored term has
      df >~ N/4e6 (product < 2^63); beyond that use the float channel
      (rank_by='bm25'). The bound is ENFORCED at runtime: tfn_ppm <=
      (1000+k1m)*1000 by construction, so any idf_ppm above
      (2^63-1)/that raises a clear error under rank_by='exact' instead
      of wrapping to a negative score and ranking wrong; under
      rank_by='bm25' (where score_p12 is informational, not the
      ranking key) the affected (query_id, id) groups emit NULL
      score_p12 and the query keeps running on the float channel.
    - `bm25` (DOUBLE): the textbook Robertson/Sparck-Jones score
      ln(1 + (N-df+.5)/(df+.5)) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)),
      for production ranking; transcendental, so pytest-pinned against
      an independent Python implementation rather than oracle-hashed.

    `rank_by` selects the ranking channel: 'exact' (default, certified)
    orders by score_p12 DESC, doc id ASC. NOTE: score_p12 sums the RAW
    odds-ratio idf (no log), so for MULTI-term queries its ranking can
    diverge from textbook BM25 (rare terms dominate more than the log
    intends); per-term it is monotone in BM25. 'bm25' orders by the
    float channel (textbook order) — the production choice; it is not
    oracle-hashed because ln() is engine-specific in the last ulp.

    `max_df` drops query terms whose document frequency exceeds the
    cutoff (stop-term prune — the standard way to bound the candidate
    set at corpus scale; a term matching half of 100 TB is not a
    discriminative term). Against a v2 index the per-term df comes from
    the index's term-dictionary rows, so a stop term is pruned from the
    literal term IN-filter BEFORE the postings scan — its postings are
    never read (with term-sorted parquet, their row groups are
    skipped). Against a v1 index (no df column) df is re-aggregated
    from the matched postings, which must read the stop term's postings
    first.

    Scale shape: the bounded query side + dictionary df collect to the
    driver; postings are filtered by a LITERAL IN on the query's
    surviving terms (pushed into the parquet scan), the candidate set
    is bounded by max_df x n_query_terms, and top-k is one window per
    query partition over that bounded set."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rank_by not in ("exact", "bm25"):
        raise ValueError(f"unknown rank_by {rank_by!r}")
    k1m = int(round(1000 * k1))
    bm = int(round(1000 * b))
    if not (0 <= bm <= 1000) or k1m < 0:
        raise ValueError("need k1 >= 0 and 0 <= b <= 1")
    spark = index.sparkSession
    has_dict = "df" in index.columns
    meta = index.filter(F.col("term").isNull()).select(
        F.col("tf").alias("__n"), F.col("dl").alias("__tl")
    )
    # the query side is collected BY CONTRACT — one bounded collect
    # serves as the row guard AND yields the literal term list that the
    # dictionary/postings scans push down (no extra guard action)
    qplan = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(term_col).alias("term")
    )
    if max_query_rows is not None:
        # raw-row limit + Python-side dedupe: a narrow one-stage job
        # (a .distinct() here would shuffle just to guard 30 rows)
        raw = qplan.limit(int(max_query_rows) + 1).collect()
        if len(raw) > max_query_rows:
            raise ValueError(
                f"bm25_search: query side exceeds max_query_rows="
                f"{max_query_rows} (raw rows) — this operator collects/"
                "broadcasts the query side by contract. Raise "
                "max_query_rows explicitly if the query batch is really "
                "this large."
            )
    else:
        raw = qplan.collect()
    qpairs = sorted(
        {(r["query_id"], r["term"]) for r in raw},
        key=lambda p: (str(p[0]), str(p[1])),
    )
    qid_type = dict(qplan.dtypes)["query_id"]
    id_type = dict(index.dtypes)["id"]
    empty_schema = (
        f"query_id {qid_type}, id {id_type}, n_terms long, "
        "score_p12 long, bm25 double, rank long"
    )
    if not qpairs:
        return spark.createDataFrame([], empty_schema)
    qt = F.broadcast(spark.createDataFrame(
        qpairs, f"query_id {qid_type}, term string"))
    qterms = sorted({t for _, t in qpairs if t is not None})
    if has_dict:
        post = index.filter(
            F.col("term").isNotNull() & F.col("id").isNotNull()
        ).drop("df")
        # dictionary section: literal term filter reaches the parquet
        # scan; stop terms fall out HERE, before any postings are read
        drows = index.filter(
            F.col("term").isin(qterms) & F.col("id").isNull()
        ).select("term", "df").collect()
        if max_df is not None:
            drows = [r for r in drows if r["df"] <= int(max_df)]
        if not drows:
            return spark.createDataFrame([], empty_schema)
        dft = spark.createDataFrame(
            [(r["term"], int(r["df"])) for r in drows], "term string, df long"
        )
        matched = post.filter(
            F.col("term").isin([r["term"] for r in drows])
        ).join(F.broadcast(dft), "term")
    else:
        post = index.filter(F.col("term").isNotNull())
        cand = post.filter(F.col("term").isin(qterms))
        dft = cand.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        )
        if max_df is not None:
            dft = dft.filter(F.col("df") <= int(max_df))
        matched = cand.join(F.broadcast(dft), "term")
    scored = matched.join(qt, "term").crossJoin(F.broadcast(meta))
    n, tl = F.col("__n"), F.col("__tl")
    tf, dfc, dl = F.col("tf"), F.col("df"), F.col("dl")
    idf_ppm = F.floor(
        F.lit(1000000.0)
        * (
            (F.lit(2) * n - F.lit(2) * dfc + F.lit(1)).cast("double")
            / (F.lit(2) * dfc + F.lit(1)).cast("double")
        )
    )
    # double chain, fixed left association — replayed verbatim by the
    # oracle SQL; see the docstring for why this is not BIGINT math
    tfd, dld = tf.cast("double"), dl.cast("double")
    tld, nd = tl.cast("double"), n.cast("double")
    num = tfd * F.lit(float(1000 + k1m)) * F.lit(1000.0) * tld
    den = (
        F.lit(1000000.0) * tld * tfd
        + F.lit(float(k1m)) * F.lit(float(1000 - bm)) * tld
        + F.lit(float(k1m)) * F.lit(float(bm)) * dld * nd
    )
    tfn_ppm = F.floor(F.lit(1000000.0) * (num / den))
    avgdl = tl.cast("double") / n.cast("double")
    fidf = F.log(
        F.lit(1.0)
        + (n.cast("double") - dfc.cast("double") + F.lit(0.5))
        / (dfc.cast("double") + F.lit(0.5))
    )
    ftfn = (tf.cast("double") * F.lit(1.0 + k1)) / (
        tf.cast("double")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / avgdl)
    )
    # Overflow guard for the certified channel: tfn_ppm is bounded by
    # (1000+k1m)*1000 (num/den <= (1000+k1m)/1000 by construction), so
    # the BIGINT product idf_ppm * tfn_ppm is exact iff idf_ppm stays
    # under (2^63-1) / that bound. A term rarer than ~N/4.2e6 docs at
    # huge N would silently wrap to a negative score and rank WRONG.
    # What happens at the cliff depends on the RANKING channel:
    # - rank_by='exact' ranks by score_p12, so a wrapped product would
    #   rank wrong — fail loudly in-plan.
    # - rank_by='bm25' ranks by the float channel, which has no cliff;
    #   score_p12 is then informational only, so the affected
    #   (query, id) groups emit NULL score_p12 instead of crashing the
    #   whole query (the documented float-channel fallback must keep
    #   working on corpora beyond the exact bound).
    idf_ppm_limit = (2**63 - 1) // ((1000 + int(k1m)) * 1000)
    overflow = idf_ppm > F.lit(idf_ppm_limit)
    if rank_by == "exact":
        idf_ppm = F.when(~overflow, idf_ppm).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("bm25_search: idf_ppm "),
                    idf_ppm.cast("string"),
                    F.lit(
                        f" exceeds {idf_ppm_limit} — the exact integer"
                        " score channel would overflow BIGINT for this"
                        " (n, df); use rank_by='bm25' or drop ultra-rare"
                        " terms"
                    ),
                )
            ).cast("long")
        )
    else:
        idf_ppm = F.when(~overflow, idf_ppm)
    per_term = scored.select(
        "query_id",
        "id",
        (idf_ppm * tfn_ppm).cast("long").alias("__c"),
        overflow.alias("__of"),
        (fidf * ftfn).alias("__f"),
    )
    agg = per_term.groupBy("query_id", "id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        # any overflowing term NULLs the whole group's score_p12 —
        # a partial sum over the surviving terms would look exact
        F.when(
            F.max("__of"), F.lit(None).cast("long")
        ).otherwise(F.sum("__c").cast("long")).alias("score_p12"),
        F.sum("__f").alias("bm25"),
    )
    order = (
        [F.desc("score_p12"), F.asc("id")]
        if rank_by == "exact"
        else [F.desc("bm25"), F.asc("id")]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "n_terms", "score_p12", "bm25",
                F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — train / encode / ADC search
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 4,
    k: int = 8,
    n_iter: int = 1,
    impl: str = "kernel",
) -> DataFrame:
    """Train a product-quantization codebook (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search") over INTEGER vectors
    (quantize with `quantize_embeddings` first): the vector is split
    into `m` contiguous subspaces and each subspace gets its own
    `kmeans_exact` codebook of `k` centroids. Because the base
    clustering is the exact integer channel (integer distances,
    floor-mean updates, lowest-id init, lowest-cluster ties), the whole
    codebook — and therefore every code assignment and every ADC
    distance downstream — is bit-replayable by an external engine; the
    float PQ of production libraries can never be (FP sum order).

    Returns the codebook frame (subspace int, cluster long,
    centroid array<long>) — m*k rows, KBs; broadcast it everywhere.
    All vectors must share one dimension divisible by m; null vectors
    are excluded (the kmeans_exact contract).

    impl='kernel' (default): JOINT Lloyd — every iteration is ONE
    Arrow `mapInPandas` pass over the corpus that assigns codes for all
    m subspaces and emits the batch-partial (subspace, cluster, pos)
    sums directly (numpy scatter-add), finished by one m*k*subdim-row
    aggregation. The corpus is scanned n_iter times total, not
    m*n_iter*2 times; per-iteration driver state is the m x k x subdim
    codebook (KBs — the Lloyd contract).
    impl='catalyst': m independent `kmeans_exact(impl='catalyst')`
    runs, the pure-Catalyst cross-engine reference the `ann_topk_pq`
    oracle replays. The two are BIT-IDENTICAL (same lowest-id init,
    integer distances, first-min/lowest-cluster ties, floor-mean
    updates — Python's s//n floor-division equals FLOOR of the true
    rational exactly); parity is pytest-pinned."""
    if m < 1:
        raise ValueError("m must be >= 1")
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    if impl not in ("kernel", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    spark = df.sparkSession
    if impl == "catalyst":
        dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if dim_row is None or dim_row["d"] is None:
            raise ValueError("no vectors to train on")
        dim = dim_row["d"]
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        sub = dim // m
        parts = []
        for s in range(m):
            sliced = df.select(
                F.col(id_col),
                F.slice(F.col(vec_col), s * sub + 1, sub).alias("__sv"),
            )
            _, cents = kmeans_exact(
                sliced, id_col, "__sv", k, n_iter=n_iter, impl=impl
            )
            parts.append(
                cents.select(
                    F.lit(s).cast("int").alias("subspace"),
                    "cluster",
                    "centroid",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<long>").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    pts = ensure_parallelism(pts)
    init = pts.orderBy(F.asc("__id")).limit(k).collect()
    if not init:
        raise ValueError("no vectors to train on")
    # dim comes from the init rows already collected — no separate
    # dimension-probe job (the kernel path's init is the k lowest-id
    # non-null vectors, so its first row always carries the dimension)
    dim = len(init[0]["__v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    # cents[s] = list of k centroid lists for subspace s
    cents: list[list[list[int]]] = [
        [list(r["__v"])[s * sub:(s + 1) * sub] for r in init]
        for s in range(m)
    ]

    def _partials(cs):
        def run(batches):
            import numpy as np
            import pandas as pd

            mats = [np.asarray(c, dtype=np.float64) for c in cs]  # (k, sub)
            ccs = [(C * C).sum(axis=1) for C in mats]
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["__v"].to_numpy().tolist()).astype(np.float64)
                subspace, cluster, pos, sm, n = [], [], [], [], []
                for s in range(m):
                    Xs = X[:, s * sub:(s + 1) * sub]
                    d = ((Xs * Xs).sum(1)[:, None] + ccs[s][None, :]
                         - 2.0 * (Xs @ mats[s].T))
                    codes = d.argmin(axis=1)  # first min == lowest cluster
                    sums = np.zeros((k, sub), dtype=np.int64)
                    np.add.at(sums, codes, Xs.astype(np.int64))
                    cnts = np.bincount(codes, minlength=k)
                    for cid in range(k):
                        if cnts[cid] == 0:
                            continue
                        for p_ in range(sub):
                            subspace.append(s)
                            cluster.append(cid)
                            pos.append(p_)
                            sm.append(int(sums[cid, p_]))
                            n.append(int(cnts[cid]))
                yield pd.DataFrame(
                    {"subspace": subspace, "cluster": cluster,
                     "pos": pos, "sm": sm, "n": n}
                )

        return pts.mapInPandas(
            run,
            schema="subspace int, cluster int, pos int, sm long, n long",
        )

    for _ in range(n_iter):
        rows = (
            _partials(cents)
            .groupBy("subspace", "cluster", "pos")
            .agg(F.sum("sm").alias("sm"), F.sum("n").alias("n"))
            .collect()  # m*k*subdim rows — bounded driver state
        )
        upd: dict[tuple[int, int], dict[int, int]] = {}
        for r in rows:
            # exact floor of the true mean: Python // floors toward -inf,
            # identical to FLOOR(s/n) in the SQL replay
            upd.setdefault((r["subspace"], r["cluster"]), {})[r["pos"]] = (
                r["sm"] // r["n"]
            )
        cents = [
            [
                [upd[(s, cid)][p] for p in range(sub)]
                if (s, cid) in upd
                else v  # empty cluster keeps its previous centroid
                for cid, v in enumerate(cents[s])
            ]
            for s in range(m)
        ]
    return spark.createDataFrame(
        [
            (s, cid, v)
            for s in range(m)
            for cid, v in enumerate(cents[s])
        ],
        "subspace int, cluster long, centroid array<long>",
    )


def _pq_subdim(codebook: DataFrame) -> tuple[int, int]:
    """(m, subdim) from a codebook frame (tiny — one collect)."""
    row = codebook.agg(
        (F.max("subspace") + 1).alias("m"),
        F.max(F.size("centroid")).alias("sub"),
    ).first()
    if row["m"] is None:
        raise ValueError("empty codebook")
    return int(row["m"]), int(row["sub"])


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    impl: str = "kernel",
) -> DataFrame:
    """Encode integer vectors against a `pq_train` codebook: per
    subspace, the code is the centroid with the smallest integer squared
    distance (ties to the lowest cluster id — the kmeans_exact
    contract). Returns (id_col, codes array<int>) with codes ordered by
    subspace — m bytes of addressable meaning per vector, the 100-TB
    storage shape (a 64-dim float corpus compresses 64x).

    impl='kernel' (default): one Arrow batch pass, numpy argmin per
    subspace (same exactness argument as kmeans_exact: int8-range
    integers keep every float64 intermediate below 2^53).
    impl='catalyst': broadcast-codebook join + min_by struct — the pure
    cross-engine reference the oracle replays."""
    if impl not in ("kernel", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<long>").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    if impl == "kernel":
        cb = [
            (int(r["subspace"]), int(r["cluster"]), list(r["centroid"]))
            for r in codebook.collect()
        ]
        # (m, subdim) from the rows just collected — no separate
        # _pq_subdim probe job on the kernel path
        if not cb:
            raise ValueError("empty codebook")
        mm = 1 + max(s for s, _, _ in cb)
        sub = max(len(v) for _, _, v in cb)
        id_type = dict(pts.dtypes)["__id"]

        def run(batches):
            import numpy as np
            import pandas as pd

            mats = {}
            for s in range(mm):
                rows = sorted((c, v) for ss, c, v in cb if ss == s)
                mats[s] = np.asarray([v for _, v in rows], dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["__v"].to_numpy().tolist()).astype(np.float64)
                codes = np.empty((len(X), mm), dtype=np.int32)
                for s in range(mm):
                    Xs = X[:, s * sub:(s + 1) * sub]
                    C = mats[s]
                    d = ((Xs * Xs).sum(1)[:, None] + (C * C).sum(1)[None, :]
                         - 2.0 * (Xs @ C.T))
                    codes[:, s] = d.argmin(axis=1)  # first min == lowest id
                yield pd.DataFrame(
                    {"__id": pdf["__id"], "codes": list(codes)}
                )

        out = pts.mapInPandas(run, schema=f"__id {id_type}, codes array<int>")
        return out.select(F.col("__id").alias(id_col), "codes")
    mm, sub = _pq_subdim(codebook)
    subs = pts.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(mm - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("subspace"),
                    F.slice(F.col("__v"), s * sub + 1, sub).alias("sv"),
                ),
            )
        ).alias("e"),
    ).select("__id", "e.subspace", "e.sv")
    d2 = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("centroid"), lambda a, c: (a - c) * (a - c)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    best = (
        subs.join(F.broadcast(codebook), "subspace")
        .select(
            "__id", "subspace",
            F.struct(d2.alias("d"), F.col("cluster").alias("c")).alias("dc"),
        )
        .groupBy("__id", "subspace")
        .agg(F.min("dc").alias("dc"))
        .select("__id", "subspace", F.col("dc.c").cast("int").alias("code"))
    )
    return (
        best.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("subspace", "code"))
                ),
                lambda x: x["code"],
            ).alias("codes")
        )
        .select(F.col("__id").alias(id_col), "codes")
    )


def pq_search(
    encoded: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    query_id_col: str | None = None,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
    impl: str = "kernel",
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over a PQ-encoded
    corpus: for each query, precompute the m x k table of integer
    squared distances from the query's subvectors to every codebook
    centroid, then score a corpus vector as the SUM of m table lookups
    addressed by its codes — no corpus-side vector math at all. The
    distance is integer (order-free sum), so ranking (adist ASC, id
    ASC) is bit-replayable externally.

    `queries` carries raw integer vectors (query_id via
    `query_id_col`, default the corpus id column name). The query side
    is broadcast BY CONTRACT (`_guard_query_side`). At 100 TB the scan
    reads ONLY the m-byte codes column (column pruning), which is the
    entire point of PQ.

    impl='kernel' (default): the nq x m x k lookup table is built
    driver-side (bounded by the query contract) and shipped into one
    Arrow `mapInPandas` pass over the codes; each batch scores all
    queries with numpy gathers and emits only its PARTIAL top-k per
    query ((adist, id) lexsort — the exact tie-break), so the final
    window ranks nq * k * n_batches rows, never the corpus. No
    corpus-side explode, no nq-fold join blowup.
    impl='catalyst': posexplode (m rows per vector) -> broadcast
    lookup-table join -> map-side-combined (query, id) sum -> window;
    the pure cross-engine reference the oracle replays. Results are
    identical (integer distances, same tie-break; pytest-pinned)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if impl not in ("kernel", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    qid = query_id_col or id_col
    _guard_query_side(queries, max_query_rows, "pq_search")
    if impl == "kernel":
        import numpy as np

        cb = {}
        for r in codebook.collect():
            cb[(int(r["subspace"]), int(r["cluster"]))] = list(r["centroid"])
        # (m, subdim, k) from the rows just collected — no separate
        # _pq_subdim probe job on the kernel path
        if not cb:
            raise ValueError("empty codebook")
        mm = 1 + max(s for s, _ in cb)
        sub = max(len(v) for v in cb.values())
        kk = 1 + max(c for _, c in cb)
        qrows = queries.select(
            F.col(qid).alias("query_id"),
            F.col(vec_col).cast("array<long>").alias("__qv"),
        ).filter(F.col("__qv").isNotNull()).collect()
        if not qrows:
            return (
                encoded.sparkSession.createDataFrame(
                    [],
                    f"query_id {dict(queries.dtypes).get(qid, 'long')}, "
                    f"id {dict(encoded.dtypes)[id_col]}, "
                    "adist long, rank long",
                )
            )
        qids = [r["query_id"] for r in qrows]
        Q = np.stack([np.asarray(r["__qv"], dtype=np.int64) for r in qrows])
        DT = np.zeros((len(qids), mm, kk), dtype=np.int64)
        for (s, c), cent in cb.items():
            dv = Q[:, s * sub:(s + 1) * sub] - np.asarray(cent, dtype=np.int64)
            DT[:, s, c] = (dv * dv).sum(axis=1)
        id_type = dict(encoded.dtypes)[id_col]
        qid_type = dict(queries.dtypes).get(qid, "long")
        kcap = k

        def run(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                C = np.stack(
                    pdf["codes"].to_numpy().tolist()
                ).astype(np.int64)  # (n, m)
                ids = pdf["__cid"].to_numpy()
                ad = np.zeros((len(qids), len(C)), dtype=np.int64)
                for s in range(mm):
                    ad += DT[:, s, :][:, C[:, s]]
                out_q, out_i, out_d = [], [], []
                take = min(kcap, len(C))
                for qi in range(len(qids)):
                    order = np.lexsort((ids, ad[qi]))[:take]
                    out_q.extend([qids[qi]] * take)
                    out_i.extend(ids[order])
                    out_d.extend(ad[qi][order])
                yield pd.DataFrame(
                    {"query_id": out_q, "id": out_i, "adist": out_d}
                )

        partial = encoded.select(
            F.col(id_col).alias("__cid"), "codes"
        ).mapInPandas(
            run,
            schema=f"query_id {qid_type}, id {id_type}, adist long",
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("adist"), F.asc("id")
        )
        return (
            partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "id", "adist",
                    F.col("rank").cast("long").alias("rank"))
        )
    mm, sub = _pq_subdim(codebook)
    qsubs = queries.select(
        F.col(qid).alias("query_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(mm - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("subspace"),
                    F.slice(
                        F.col(vec_col).cast("array<long>"), s * sub + 1, sub
                    ).alias("qv"),
                ),
            )
        ).alias("e"),
    ).select("query_id", "e.subspace", "e.qv")
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("centroid"), lambda a, c: (a - c) * (a - c)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dtable = qsubs.join(codebook, "subspace").select(
        "query_id", "subspace",
        F.col("cluster").cast("int").alias("code"), d2.alias("d"),
    )
    corpus = encoded.select(
        F.col(id_col).alias("id"),
        F.posexplode("codes").alias("subspace", "code"),
    ).withColumn("subspace", F.col("subspace").cast("int"))
    adist = (
        corpus.join(F.broadcast(dtable), ["subspace", "code"])
        .groupBy("query_id", "id")
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("id"))
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "adist",
                F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ — coarse inverted lists + PQ-coded residuals (the FAISS-style
# composite scale path), entirely on the exact integer channel
# ---------------------------------------------------------------------------


def ivfpq_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_lists: int = 16,
    m: int = 4,
    k: int = 16,
    n_iter: int = 1,
    impl: str = "kernel",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build an IVF-PQ index over INTEGER vectors: a coarse
    `kmeans_exact` quantizer partitions the corpus into `n_lists`
    inverted lists, every vector's RESIDUAL against its list centroid
    (integer subtraction — exact) is PQ-encoded with `pq_train`/
    `pq_encode`, and the searchable artifact is (id, list_id, codes) —
    m bytes + a list id per vector. Residual encoding is what makes
    PQ codes sharp at scale: within a list the residual magnitudes are
    small, so the same codebook budget buys much finer cells (Jegou et
    al. 2011 §IV). Because BOTH trainings ride the exact integer
    channel (integer distances, floor means, lowest-id init,
    lowest-cluster ties), every artifact — and every ADC distance
    downstream — is bit-replayable by an external engine.

    Returns (coarse, codebook, codes):
      coarse   = (cluster long, centroid array<long>)         [n_lists rows]
      codebook = (subspace int, cluster long, centroid array<long>) [m*k]
      codes    = (id_col, list_id long, codes array<int>)
    Persist all three; searches never read raw vectors.

    Scale shape: coarse train is Lloyd (bounded driver state), list
    assignment + residual is one kernel pass over the corpus, PQ train
    is the joint-Lloyd pass (PLANS §33), encode one more kernel pass.
    All shuffles key on the vector id."""
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<long>").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    assignments, coarse = kmeans_exact(
        pts, "__id", "__v", n_lists, n_iter=n_iter, impl=impl
    )
    cents = {int(r["cluster"]): list(r["centroid"]) for r in coarse.collect()}
    joined = pts.join(
        assignments.select("__id", F.col("cluster").alias("list_id")), "__id"
    )
    if impl == "kernel":
        import numpy as np  # noqa: F401 — availability check

        id_type = dict(pts.dtypes)["__id"]
        cmat_items = sorted(cents.items())
        cmat = [v for _, v in cmat_items]
        cids = [c for c, _ in cmat_items]

        def run(batches):
            import numpy as np
            import pandas as pd

            C = np.asarray(cmat, dtype=np.int64)
            pos = {cid: i for i, cid in enumerate(cids)}
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["__v"].to_numpy().tolist()).astype(np.int64)
                li = pdf["list_id"].to_numpy()
                R = X - C[[pos[int(c)] for c in li]]
                yield pd.DataFrame(
                    {"__id": pdf["__id"], "list_id": li, "rvec": list(R)}
                )

        rdf = joined.mapInPandas(
            run, schema=f"__id {id_type}, list_id long, rvec array<long>"
        )
    else:
        rdf = joined.join(F.broadcast(coarse),
                          joined["list_id"] == coarse["cluster"]).select(
            "__id", "list_id",
            F.zip_with("__v", "centroid", lambda a, c: a - c).alias("rvec"),
        )
    codebook = pq_train(rdf, "__id", "rvec", m=m, k=k, n_iter=n_iter,
                        impl=impl)
    codes = pq_encode(rdf, codebook, "__id", "rvec", impl=impl).join(
        rdf.select("__id", "list_id"), "__id"
    ).select(F.col("__id").alias(id_col), "list_id", "codes")
    return coarse, codebook, codes


def ivfpq_search(
    codes: DataFrame,
    coarse: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    nprobe: int = 2,
    query_id_col: str | None = None,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
) -> DataFrame:
    """ADC top-k over an `ivfpq_build` index: each query probes its
    `nprobe` nearest coarse lists (integer distance, ties to the lower
    list id), the query RESIDUAL against each probed centroid addresses
    a per-(query, list) m x k lookup table, and a corpus vector's
    distance is the integer sum of code lookups — ranked (adist ASC,
    id ASC), bit-replayable externally.

    The probe tables are built driver-side from the bounded query set
    and the bounded coarse/codebook artifacts, then shipped into one
    Arrow pass over the codes that emits per-batch partial top-k per
    query (only probed lists are scored). At 100 TB, write the codes
    table partitioned by list_id so the probe prunes partitions — each
    query then touches nprobe/n_lists of the corpus, the entire point
    of IVF."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    qid = query_id_col or id_col
    _guard_query_side(queries, max_query_rows, "ivfpq_search")
    import numpy as np

    mm, sub = _pq_subdim(codebook)
    cents = sorted(
        (int(r["cluster"]), list(r["centroid"])) for r in coarse.collect()
    )
    cb = {
        (int(r["subspace"]), int(r["cluster"])): list(r["centroid"])
        for r in codebook.collect()
    }
    kk = 1 + max(c for _, c in cb)
    qrows = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).cast("array<long>").alias("__qv"),
    ).filter(F.col("__qv").isNotNull()).collect()
    qid_type = dict(queries.dtypes).get(qid, "long")
    id_type = dict(codes.dtypes)[id_col]
    spark = codes.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], f"query_id {qid_type}, id {id_type}, adist long, rank long"
        )
    C = np.asarray([v for _, v in cents], dtype=np.int64)
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    # per (query, probed list): residual lookup table (m, kk)
    tables: dict[int, list[tuple[object, np.ndarray]]] = {}
    for r in qrows:
        qv = np.asarray(r["__qv"], dtype=np.int64)
        d = ((C - qv) ** 2).sum(axis=1)
        order = np.lexsort((cids, d))[:nprobe]  # ties -> lower list id
        for li in order:
            lid = int(cids[li])
            rq = qv - C[li]
            dt = np.zeros((mm, kk), dtype=np.int64)
            for (s, c), cent in cb.items():
                dv = rq[s * sub:(s + 1) * sub] - np.asarray(cent,
                                                            dtype=np.int64)
                dt[s, c] = (dv * dv).sum()
            tables.setdefault(lid, []).append((r["query_id"], dt))
    probed = sorted(tables)
    kcap = k

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out_q, out_i, out_d = [], [], []
            lids = pdf["list_id"].to_numpy()
            allC = np.stack(pdf["codes"].to_numpy().tolist()).astype(np.int64)
            allI = pdf["__cid"].to_numpy()
            for lid in probed:
                mask = lids == lid
                if not mask.any():
                    continue
                Cc = allC[mask]
                ids = allI[mask]
                take = min(kcap, len(Cc))
                for q, dt in tables[lid]:
                    ad = np.zeros(len(Cc), dtype=np.int64)
                    for s in range(mm):
                        ad += dt[s][Cc[:, s]]
                    order = np.lexsort((ids, ad))[:take]
                    out_q.extend([q] * take)
                    out_i.extend(ids[order])
                    out_d.extend(ad[order])
            yield pd.DataFrame({"query_id": out_q, "id": out_i,
                                "adist": out_d})

    lid_df = spark.createDataFrame([(l,) for l in probed], "list_id long")
    partial = (
        codes.join(F.broadcast(lid_df), "list_id")  # prune unprobed lists
        .select(F.col(id_col).alias("__cid"), "list_id", "codes")
        .mapInPandas(
            run, schema=f"query_id {qid_type}, id {id_type}, adist long"
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "adist",
                F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Feature-hashed document embeddings — model-free text -> integer vectors
# ---------------------------------------------------------------------------


def token_signs(tokens: DataFrame, *, dim: int = 64,
                token_col: str = "token") -> DataFrame:
    """Deterministic hashed sign vector per DISTINCT token (the feature-
    hashing trick, Weinberger et al. 2009): component j of a token's
    vector is +1/-1 by the parity of md5(token || ':' || j). Persist the
    result once per vocabulary (the artifact pattern) — snapshots reuse
    it, and md5 makes it replayable in any engine. Returns
    (token string, signs array<long>) with `dim` components."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    toks = tokens.select(F.col(token_col).alias("token")).distinct()
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("token"), F.lit(":"),
                                   j.cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % 2 == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).cast("long"),
    )
    return toks.select("token", signs.alias("signs"))


def hashed_embedding(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 64,
    signs: DataFrame | None = None,
    lowercase: bool = True,
    broadcast_signs: bool = True,
    impl: str = "kernel",
    sign_memo_cap: int = 1_000_000,
) -> DataFrame:
    """Model-free document embeddings by feature hashing: embedding[j] =
    sum over tokens of tf * sign_j(token) — an INTEGER vector (exact,
    order-free sums, engine-replayable), cheap enough to compute for
    100 TB of text with no model download, and random-projection-like
    enough that cosine over it tracks bag-of-words similarity
    (Johnson-Lindenstrauss flavor). The output plugs straight into the
    vector machinery: `semantic_dedup`, `kmeans_exact`, `pq_*`,
    `ivfpq_*` all accept integer vectors.

    Pass a persisted `token_signs` table via `signs` to reuse the
    vocabulary artifact across snapshots; tokens NOT in the table (new
    vocabulary in a later snapshot) get their sign rows derived in-plan
    via an anti-join + `token_signs` union, so a stale artifact can
    never silently drop tokens — the output is bit-identical to the
    no-artifact path by construction (md5 signs either way). By default
    the sign table is derived in-plan from the corpus's own distinct
    tokens. Tokenization is the corpus-wide whitespace idiom.

    impl='kernel' (default): the embedding is a PER-DOC local
    computation, so the kernel does it with ZERO shuffle — one Arrow
    `mapInPandas` pass that tokenizes each batch, md5-hashes each
    NEW token's d-dim sign row into a per-task memo (real
    vocabularies repeat heavily, so the md5 cost amortizes to the
    distinct-token count per executor), and emits tf-weighted numpy
    row sums. The memo is CAPPED at `sign_memo_cap` entries
    (clear-on-full; evicted tokens just recompute their md5, so the
    output is unchanged) — a web corpus's long tail of URLs/hashes/
    typos is effectively unbounded vocabulary, and an uncapped memo
    would grow executor RSS for the process lifetime on a 100-TB
    sweep. PLANS §35: 313.9 s -> 9.2 s at 100k docs x 64 dims.
    impl='catalyst': tokens -> (id, token, tf) aggregation ->
    broadcast sign-table join + posexplode -> (id, j) aggregation ->
    sorted array_agg; the pure-Catalyst cross-engine reference the
    `hashed_embeddings`/`text_hash_ann` oracles replay (two shuffles —
    the d-fold explode makes it the slow path). Bit-identical
    (integer sums; pytest-pinned). An explicit `signs` table forces
    the catalyst path (the kernel derives signs from md5 directly —
    same values by construction).

    Returns (id_col, embedding array<long>); docs with no tokens emit
    no row."""
    if impl not in ("kernel", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if sign_memo_cap < 1:
        raise ValueError("sign_memo_cap must be >= 1")
    if impl == "kernel" and signs is None:
        id_type = dict(df.dtypes)[id_col]
        src = df.select(
            F.col(id_col).alias("__id"),
            (F.lower(F.col(text_col)) if lowercase
             else F.col(text_col)).alias("__t"),
        )

        def run(batches):
            import hashlib
            import re

            import numpy as np
            import pandas as pd

            # Java's \s is ASCII-only; Python's str.split() splits on ALL
            # Unicode whitespace — re.ASCII pins the exact same token
            # boundaries as the catalyst path's F.split(..., r"\s+")
            ws = re.compile(r"\s+", re.ASCII)
            memo: dict[str, np.ndarray] = {}

            def sign_row(tok: str) -> np.ndarray:
                v = memo.get(tok)
                if v is None:
                    if len(memo) >= sign_memo_cap:
                        memo.clear()  # long-tail vocab: bound executor RSS
                    v = np.fromiter(
                        (
                            1
                            if int(
                                hashlib.md5(
                                    f"{tok}:{j}".encode()
                                ).hexdigest()[:8],
                                16,
                            ) % 2 == 0
                            else -1
                            for j in range(dim)
                        ),
                        dtype=np.int64,
                        count=dim,
                    )
                    memo[tok] = v
                return v

            for pdf in batches:
                if not len(pdf):
                    continue
                ids, embs = [], []
                for rid, text in zip(pdf["__id"], pdf["__t"]):
                    if text is None:
                        continue
                    toks = [t for t in ws.split(text) if t]
                    if not toks:
                        continue
                    from collections import Counter

                    acc = np.zeros(dim, dtype=np.int64)
                    for tok, tf in Counter(toks).items():
                        acc += tf * sign_row(tok)
                    ids.append(rid)
                    embs.append(acc.tolist())
                if not ids:
                    continue  # empty frame infers float64 cols -> Arrow cast error
                yield pd.DataFrame({"__id": ids, "embedding": embs})

        return src.mapInPandas(
            run, schema=f"__id {id_type}, embedding array<long>"
        ).select(F.col("__id").alias(id_col), "embedding")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(
                F.trim(
                    F.lower(F.col(text_col)) if lowercase
                    else F.col(text_col)
                ),
                r"\s+",
            )
        ).alias("token"),
    ).filter(F.col("token") != "")
    occ = toks.groupBy("__id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    if signs is None:
        signs = token_signs(occ, dim=dim)
    else:
        # a stale vocabulary artifact must not silently drop NEW tokens:
        # hash the missing ones in-plan (same md5 derivation, so the
        # result is identical to what a refreshed artifact would hold)
        provided = signs.select("token", "signs")
        missing = occ.select("token").distinct().join(
            provided.select("token"), "token", "left_anti"
        )
        signs = provided.unionByName(token_signs(missing, dim=dim))
    sgn = F.broadcast(signs) if broadcast_signs else signs
    comp = (
        occ.join(sgn, "token")
        .select(
            "__id",
            F.posexplode("signs").alias("j", "sign"),
            F.col("tf"),
        )
        .groupBy("__id", "j")
        .agg(F.sum(F.col("tf") * F.col("sign")).cast("long").alias("c"))
    )
    return (
        comp.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "c"))),
                lambda x: x["c"],
            ).alias("embedding")
        )
        .select(F.col("__id").alias(id_col), "embedding")
    )


def semantic_layout_key(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 16,
    k: int = 8,
    n_iter: int = 1,
    lowercase: bool = True,
    impl: str = "kernel",
) -> DataFrame:
    """In-context-pretraining layout key (Shi et al. 2023: co-locating
    RELATED documents in training sequences beats random order): hash-
    embed every document (model-free `hashed_embedding`), cluster with
    the exact integer channel (`kmeans_exact`), and emit
    sem_key = cluster * 2^40 + id — a PURE PROJECTION whose ordering
    places same-cluster documents adjacently, with no global window or
    sort anywhere. Feed the key straight into
    `packing.assign_shards(..., order='id')` (sem_key as the id axis)
    or any ordered writer: shards then hold topically-coherent runs.

    Ids must be integers in [0, 2^40) (enforced in-plan via
    raise_error — a silent wraparound would interleave clusters).
    Returns (id_col, cluster, sem_key); docs with no tokens emit no row
    (the `hashed_embedding` contract). Fully engine-replayable —
    registry row `semantic_layout` replays hash -> Lloyd -> key
    arithmetic in one generated SQL chain."""
    emb = hashed_embedding(
        df, id_col, text_col, dim=dim, lowercase=lowercase, impl=impl
    )
    assign, _ = kmeans_exact(
        emb, id_col, "embedding", k, n_iter=n_iter, impl=impl
    )
    idc = F.col(id_col).cast("long")
    guarded = F.when(
        (idc >= 0) & (idc < F.lit(1 << 40)), idc
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("semantic_layout_key: id "),
                idc.cast("string"),
                F.lit(" outside [0, 2^40) — sem_key would wrap"),
            )
        )
    )
    return assign.select(
        id_col,
        "cluster",
        (F.col("cluster") * F.lit(1 << 40) + guarded).cast("long")
        .alias("sem_key"),
    )


def exact_int_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    query_id_col: str | None = None,
    max_query_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
    impl: str = "kernel",
) -> DataFrame:
    """Exact top-k by integer squared L2 over integer vectors — the
    ground truth the approximate indexes (PQ / IVF-PQ) are measured
    against. Distances are integer sums (order-free), ranking is
    (dist ASC, id ASC): engine-replayable.

    impl='kernel' (default): one Arrow matmul pass with per-batch
    partial top-k (the pq_search kernel shape). impl='catalyst':
    broadcast-query join + HOF fold + window — the SQL-replayable
    reference; interpreted per element, certification sizes only."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if impl not in ("kernel", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    qid = query_id_col or id_col
    _guard_query_side(queries, max_query_rows, "exact_int_topk")
    qdf = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).cast("array<long>").alias("__qv"),
    ).filter(F.col("__qv").isNotNull())
    pts = corpus.select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).cast("array<long>").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    if impl == "kernel":
        import numpy as np

        qrows = qdf.collect()
        qid_type = dict(queries.dtypes).get(qid, "long")
        id_type = dict(corpus.dtypes)[id_col]
        spark = corpus.sparkSession
        if not qrows:
            return spark.createDataFrame(
                [], f"query_id {qid_type}, id {id_type}, dist long, rank long"
            )
        qids = [r["query_id"] for r in qrows]
        Q = np.stack([np.asarray(r["__qv"], dtype=np.float64) for r in qrows])
        qq = (Q * Q).sum(axis=1)
        kcap = k

        def run(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["__v"].to_numpy().tolist()).astype(np.float64)
                ids = pdf["__cid"].to_numpy()
                xx = (X * X).sum(axis=1)
                d = (qq[:, None] + xx[None, :] - 2.0 * (Q @ X.T)).astype(
                    np.int64
                )
                take = min(kcap, len(X))
                out_q, out_i, out_d = [], [], []
                for qi in range(len(qids)):
                    order = np.lexsort((ids, d[qi]))[:take]
                    out_q.extend([qids[qi]] * take)
                    out_i.extend(ids[order])
                    out_d.extend(d[qi][order])
                yield pd.DataFrame(
                    {"query_id": out_q, "id": out_i, "dist": out_d}
                )

        partial = pts.mapInPandas(
            run, schema=f"query_id {qid_type}, id {id_type}, dist long"
        )
    else:
        d2 = F.aggregate(
            F.zip_with(
                F.col("__qv"), F.col("__v"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        partial = pts.crossJoin(F.broadcast(qdf)).select(
            "query_id", F.col("__cid").alias("id"), d2.alias("dist")
        )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "dist",
                F.col("rank").cast("long").alias("rank"))
    )


def pq_recall_report(
    corpus: DataFrame,
    encoded: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Recall@k of the PQ index against exact integer search — the
    counted quality signal for the ANN family (the `lsh_bucket_stats`
    philosophy: an approximate operator ships with the instrument that
    measures what the approximation costs). For each query: the
    PQ-ADC top-k (over `encoded`) is intersected with the exact top-k
    (over `corpus`, same integer metric, same tie-break) and reported
    as (query_id, n_hits, recall_ppm) with
    recall_ppm = floor(1e6 * n_hits / k) — all integers, exact in any
    engine. Run it on a held-out query sample per corpus snapshot to
    decide m/k/nprobe before committing a 100-TB encode."""
    if k < 1:
        raise ValueError("k must be >= 1")
    approx = pq_search(
        encoded, codebook, queries, id_col, vec_col, k=k,
        query_id_col=query_id_col,
    ).select("query_id", "id")
    exact = exact_int_topk(
        corpus, queries, id_col, vec_col, k=k, query_id_col=query_id_col,
    ).select("query_id", "id")
    hits = approx.join(exact, ["query_id", "id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    all_q = exact.select("query_id").distinct()
    return (
        all_q.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.floor(
                F.lit(1000000)
                * F.coalesce(F.col("n_hits"), F.lit(0))
                / F.lit(k)
            ).cast("long").alias("recall_ppm"),
        )
    )


def int_moments(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Exact integer first/second moments of an integer-vector column —
    the distributed half of PCA/OPQ training, certifiable because every
    entry is an order-free BIGINT sum. One Arrow pass computes batch
    partials (X'X upper triangle, column sums, count), finished by one
    (i, j) aggregation; driver state is zero, output is d*(d+1)/2 + d +
    1 rows regardless of corpus size.

    Output rows (i long, j long, s long):
      i >= 0, j >= i : s = sum over vectors of v[i]*v[j]
      i >= 0, j = -1 : s = sum over vectors of v[i]
      i = -1, j = -1 : s = vector count
    Overflow bound: |v[i]| <= B needs N * B^2 < 2^63 — int8-quantized
    vectors (B=127) are safe past 5e14 rows."""
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<long>").alias("__v"),
    ).filter(F.col("__v").isNotNull())

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["__v"].to_numpy().tolist()).astype(np.int64)
            d = X.shape[1]
            G = X.T @ X
            iu, ju = np.triu_indices(d)
            s = X.sum(axis=0)
            yield pd.DataFrame({
                "i": np.concatenate([iu, np.arange(d), [-1]]),
                "j": np.concatenate([ju, np.full(d, -1), [-1]]),
                "s": np.concatenate([G[iu, ju], s, [len(X)]]),
            })

    part = pts.mapInPandas(run, schema="i long, j long, s long")
    return part.groupBy("i", "j").agg(F.sum("s").cast("long").alias("s"))


def pca_rotation(
    moments: DataFrame,
    *,
    m: int = 1,
) -> DataFrame:
    """Eigenvalue-balanced PCA rotation from `int_moments` output — the
    parametric OPQ initialization (Ge et al. 2013, "Optimized Product
    Quantization", section 4: PCA-align then balance per-subspace
    variance). The d x d covariance is assembled exactly from the
    integer moments (one correctly-rounded float64 op per entry), its
    eigendecomposition runs DRIVER-side (d x d is bounded — the Lloyd-
    contract shape, never distributed), components get a deterministic
    sign (largest-|x| entry positive, ties to the earlier index), and
    with m > 1 the components are permuted by the greedy balancing
    rule: descending eigenvalue, each assigned to the subspace with the
    smallest current log-variance product. PQ subspaces then carve
    equal-variance slices instead of whatever the raw coordinate order
    happened to encode — the standard recall lift at an unchanged code
    budget (PLANS section 40 measures it with `pq_recall_report`).

    Returns (component long, weights array<double>) — row r of the
    rotation matrix; feed to `rotate_vectors`. Transcendental (eigh),
    so production-channel: pytest-pinned for orthonormality and
    variance balance, not oracle-hashed — the exact distributed half is
    the certified `int_moments` (registry row `embedding_moments`)."""
    import numpy as np

    if m < 1:
        raise ValueError("m must be >= 1")
    rows = moments.collect()
    n = None
    sums = {}
    gram = {}
    for r in rows:
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        if i == -1:
            n = s
        elif j == -1:
            sums[i] = s
        else:
            gram[(i, j)] = s
    if not n:
        raise ValueError("int_moments has no vectors")
    d = len(sums)
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m {m}")
    mu = np.array([sums[i] for i in range(d)], dtype=np.float64) / n
    C = np.zeros((d, d), dtype=np.float64)
    for (i, j), s in gram.items():
        C[i, j] = C[j, i] = s / n - mu[i] * mu[j]
    w, V = np.linalg.eigh(C)          # ascending eigenvalues
    order = np.argsort(-w, kind="stable")
    w, V = w[order], V[:, order]      # descending
    for c in range(d):
        pivot = int(np.argmax(np.abs(V[:, c])))
        if V[pivot, c] < 0:
            V[:, c] = -V[:, c]
    if m > 1:
        sub = d // m
        slots = [[] for _ in range(m)]
        load = [0.0] * m
        for c in range(d):              # descending eigenvalue
            open_subs = [s_ for s_ in range(m) if len(slots[s_]) < sub]
            tgt = min(open_subs, key=lambda s_: (load[s_], s_))
            slots[tgt].append(c)
            load[tgt] += float(np.log(max(w[c], 1e-12)))
        perm = [c for slot in slots for c in slot]
        V = V[:, perm]
    R = V.T                            # row r = component r
    spark = moments.sparkSession
    return spark.createDataFrame(
        [(r, [float(x) for x in R[r]]) for r in range(d)],
        "component long, weights array<double>",
    )


def rotate_vectors(
    df: DataFrame,
    rotation: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    out_col: str = "rvec",
) -> DataFrame:
    """Apply a `pca_rotation` matrix to an integer-vector column and
    re-quantize to integers (floor(y + 0.5) per component — rotation is
    orthonormal, so the value range is preserved and the result feeds
    `pq_train`/`ivfpq_build` unchanged). One Arrow matmul pass, zero
    shuffle; the d x d matrix ships in the closure (bounded)."""
    import numpy as np

    R = None
    rrows = rotation.collect()
    d = len(rrows)
    R = np.zeros((d, d), dtype=np.float64)
    for r in rrows:
        R[int(r["component"])] = r["weights"]
    id_type = dict(df.dtypes)[id_col]
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<long>").alias("__v"),
    ).filter(F.col("__v").isNotNull())

    def run(batches):
        import numpy as np
        import pandas as pd

        Rl = np.asarray(R)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["__v"].to_numpy().tolist()).astype(np.float64)
            Y = np.floor(X @ Rl.T + 0.5).astype(np.int64)
            yield pd.DataFrame({"__id": pdf["__id"], "rv": list(Y)})

    return pts.mapInPandas(
        run, schema=f"__id {id_type}, rv array<long>"
    ).select(F.col("__id").alias(id_col), F.col("rv").alias(out_col))


def ivfpq_recall_report(
    corpus: DataFrame,
    codes: DataFrame,
    coarse: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    nprobes: list[int] | None = None,
    query_id_col: str | None = None,
) -> DataFrame:
    """Recall@k vs nprobe for an `ivfpq_build` index — the tuning
    instrument the 100-TB ANN operator ships with (the
    `pq_recall_report` contract, extended over the IVF probe axis).
    For each nprobe in `nprobes` (default 1, 2, 4, ... up to n_lists),
    the `ivfpq_search` top-k is intersected per query with the exact
    integer top-k over `corpus` (same metric, same tie-break); the
    report is one row per (nprobe, query): (nprobe, query_id, n_hits,
    recall_ppm), all integers — exact in any engine. Run it on a
    held-out query sample per corpus snapshot to pick the nprobe
    operating point (recall vs fraction-of-corpus-scanned) before
    committing a fleet-scale search campaign.

    The exact ground truth is computed ONCE and reused across the
    sweep; each nprobe point is one bounded `ivfpq_search` (probe
    tables from the bounded query set, one Arrow pass over the pruned
    codes)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if nprobes is None:
        n_lists = coarse.count()
        nprobes, p = [], 1
        while p < n_lists:
            nprobes.append(p)
            p *= 2
        nprobes.append(int(n_lists))
    if not nprobes or any(p < 1 for p in nprobes):
        raise ValueError("nprobes must be a non-empty list of ints >= 1")
    exact = exact_int_topk(
        corpus, queries, id_col, vec_col, k=k, query_id_col=query_id_col,
    ).select("query_id", "id")
    all_q = exact.select("query_id").distinct()
    reports = []
    for p in nprobes:
        approx = ivfpq_search(
            codes, coarse, codebook, queries, id_col, vec_col,
            k=k, nprobe=int(p), query_id_col=query_id_col,
        ).select("query_id", "id")
        hits = approx.join(exact, ["query_id", "id"]).groupBy(
            "query_id"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        reports.append(
            all_q.join(hits, "query_id", "left").select(
                F.lit(int(p)).cast("long").alias("nprobe"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                .alias("n_hits"),
                F.floor(
                    F.lit(1000000)
                    * F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(k)
                ).cast("long").alias("recall_ppm"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# diversity selection (greedy k-center coreset)
# ---------------------------------------------------------------------------


def diversity_select(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int,
    metric: str = "cosine",
    seed_id=None,
    checkpoint_every: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Greedy k-center selection (Gonzalez's farthest-point traversal)
    over an embedding column — the coreset/diversity-sampling primitive
    of training-data curation: pick `k` rows such that every corpus row
    is close to some pick (a 2-approximation of the optimal k-center
    cover). Where `sample_mixture` balances SOURCES and
    `cluster_mixture` balances kmeans cells, this maximizes geometric
    COVERAGE — the "don't spend the budget on near-identical docs"
    selector, and the classic seed for active-learning labeling budgets.

    Round r broadcasts the newly-picked center's vector as a LITERAL
    into a `least(mind, dist)` projection (no join, no shuffle) and
    takes the arg-max of the updated min-distance with one distributed
    TakeOrdered (priority desc, id asc — total-order deterministic).
    Driver state is k centers' vectors — bounded by k x dim, never by
    corpus size; lineage is truncated every `checkpoint_every` rounds
    (`_util.materialize_step`, reliable under `checkpoint_dir` — the
    pagerank contract). k is expected small (tens): the loop runs k-1
    Spark jobs by construction, the honest cost of the greedy optimum.

    metric='cosine' (1 - cosine similarity; zero-norm vectors are
    EXCLUDED — cosine is undefined there) or 'euclidean2' (squared
    euclidean, all vectors eligible). Returns (id_col, center_rank,
    radius): rank-1 is the seed (`seed_id` or the minimum id), and
    `radius` is the point's min-distance to the earlier picks at
    selection time — the non-increasing coverage-radius curve, an
    honest convergence signal. Duplicated-to-exhaustion corpora stop
    early: once every remaining candidate sits at distance 0, the
    traversal returns fewer than k rows rather than arbitrary dups."""
    from ._util import materialize_step

    if k < 1:
        raise ValueError("k must be >= 1")
    if metric not in ("cosine", "euclidean2"):
        raise ValueError(f"unknown metric {metric!r}")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("id"), v.alias("v")).filter(
        F.col("v").isNotNull()
    )
    if metric == "cosine":
        base = base.filter(_dot(F.col("v"), F.col("v")) > 0)

    def dist_to(center_vec: list) -> Column:
        c = F.array(*[F.lit(float(x)) for x in center_vec])
        if metric == "euclidean2":
            return F.aggregate(
                F.zip_with(F.col("v"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        return F.lit(1.0) - _dot(F.col("v"), c) / (
            _norm(F.col("v")) * _norm(c)
        )

    if seed_id is not None:
        seed_rows = base.filter(F.col("id") == F.lit(seed_id)).limit(1).collect()
        if not seed_rows:
            raise ValueError(f"seed_id {seed_id!r} not in the corpus")
    else:
        seed_rows = base.orderBy(F.col("id").asc()).limit(1).collect()
        if not seed_rows:
            return base.sparkSession.createDataFrame(
                [], f"id {df.schema[id_col].dataType.simpleString()}, "
                    "center_rank int, radius double"
            ).withColumnRenamed("id", id_col)
    seed = seed_rows[0]
    picked = [(seed.id, 1, None)]
    state = materialize_step(
        base.withColumn("mind", dist_to(seed.v)), checkpoint_dir
    )
    for r in range(2, k + 1):
        cand = (
            state.filter(~F.col("id").isin([p[0] for p in picked]))
            .orderBy(F.col("mind").desc(), F.col("id").asc())
            .limit(1)
            .collect()
        )
        if not cand or cand[0].mind <= 0.0:
            break  # corpus exhausted (every remaining row is a duplicate)
        row = cand[0]
        picked.append((row.id, r, float(row.mind)))
        if r < k:
            new_state = state.withColumn(
                "mind", F.least(F.col("mind"), dist_to(row.v))
            )
            if (r - 1) % checkpoint_every == 0:
                new_state = materialize_step(new_state, checkpoint_dir)
                state.unpersist()
            state = new_state
    state.unpersist()
    spark = df.sparkSession
    out = spark.createDataFrame(
        picked,
        f"id {df.schema[id_col].dataType.simpleString()}, "
        "center_rank int, radius double",
    )
    return out.withColumnRenamed("id", id_col)


def whiten_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
) -> DataFrame:
    """Per-dimension standardization of an INTEGER-quantized embedding
    column: w[i] = (q[i] - mean_i) / stddev_i (population moments) —
    the diagonal-whitening step that removes per-dimension scale and
    offset drift before distance-based retrieval/clustering (PCA-free
    little sibling of `pca_rotation`; compose with
    `quantize_embeddings(impl='catalyst')`, whose integer channel is
    the certified input here).

    Exactness model (the `int_moments` contract): the sufficient
    statistics are ORDER-FREE integer sums (sum, sum-of-squares, count
    per dimension — one map-side-combinable aggregation over n x d
    exploded values, d groups), so they are engine-exact at any
    parallelism; the float mean/variance/sqrt derive from those
    integers through one pinned expression order, making the whitened
    values bit-replayable in any engine. |q| <= 127 keeps the
    sum-of-squares in BIGINT up to ~5.7e14 rows.

    Driver state is d stat rows (bounded by dimension, never corpus);
    the transform itself is a literal-broadcast projection — no join,
    no shuffle, whole-stage-codegen'd. Zero-variance dimensions emit
    0.0 (no information, not a divide-by-zero). Returns
    (id_col, wvec array<double>). NULL vectors pass through as NULL."""
    import math

    pts = df.select(F.col(id_col), F.col(vec_col).cast("array<long>").alias("__q"))
    stats = (
        pts.select(F.posexplode("__q").alias("i", "q"))
        .groupBy("i")
        .agg(
            F.sum("q").cast("long").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    )
    if not stats:
        return pts.select(
            F.col(id_col), F.col("__q").cast("array<double>").alias("wvec")
        )
    d = max(r.i for r in stats) + 1
    means = [0.0] * d
    stds = [0.0] * d
    for r in stats:
        mean = float(r.s) / r.n
        var = (float(r.ss) - float(r.s) * float(r.s) / r.n) / r.n
        means[r.i] = mean
        stds[r.i] = math.sqrt(var) if var > 0 else 0.0
    mean_arr = F.array(*[F.lit(m) for m in means])
    std_arr = F.array(*[F.lit(s) for s in stds])
    w = F.transform(
        F.col("__q"),
        lambda x, i: F.when(
            F.element_at(std_arr, i + 1) > 0,
            (x.cast("double") - F.element_at(mean_arr, i + 1))
            / F.element_at(std_arr, i + 1),
        ).otherwise(F.lit(0.0)),
    )
    return pts.select(F.col(id_col), w.alias("wvec"))


def diversity_select_grouped(
    df: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    *,
    k: int,
) -> DataFrame:
    """`diversity_select` PER GROUP — the "diverse sample per domain /
    source / cluster" selection step: within every group, greedy
    k-center (squared-euclidean) picks up to `k` rows, stopping early
    when every remaining candidate is an exact duplicate (radius 0).

    Execution model is the Lloyd/`applyInPandas` contract: one shuffle
    on the group key, then each group's traversal runs as a vectorized
    numpy kernel inside its task — groups are expected BOUNDED (a
    domain's docs, a cluster's members), never the whole corpus; for
    one global selection use `diversity_select`, whose per-round
    broadcast shape needs no group to fit in memory.

    The certification channel is INTEGER vectors (e.g.
    `quantize_embeddings` output): every distance is an exact int64
    sum (order-free, replayable in any engine; |q| <= 127 at dim 64 is
    ~4e6 per distance, nowhere near overflow), and the emitted radius
    — mind at selection time, exact in a double — hashes bit-equal.
    Float vectors work but their kernel-vs-engine summation orders
    differ; certify those through pytest, not an external replay.

    Returns (group_col, id_col, center_rank int, radius double) with
    center_rank 1 = the group's minimum id (radius NULL). NULL vectors
    and NULL group keys are excluded (nothing to measure / no group to
    diversify)."""
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
    ).filter(F.col("__v").isNotNull() & F.col("__g").isNotNull())

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        order = np.argsort(pdf["__id"].to_numpy(), kind="stable")
        ids = pdf["__id"].to_numpy()[order]
        X = np.stack(pdf["__v"].to_numpy()[order].tolist())
        if np.issubdtype(X.dtype, np.integer):
            X = X.astype(np.int64)
        g = pdf["__g"].iloc[0]
        sel_idx = [0]  # seed: minimum id (ids sorted ascending)
        radii = [None]
        d = X - X[0]
        mind = (d * d).sum(axis=1)
        for _ in range(1, k):
            mind_masked = mind.copy()
            mind_masked[sel_idx] = -1
            best = mind_masked.max()
            if best <= 0:
                break
            # deterministic tie-break: smallest id among the argmaxes
            # (ids ascending => first index wins)
            i = int(np.argmax(mind_masked == best))
            sel_idx.append(i)
            radii.append(float(best))
            d = X - X[i]
            mind = np.minimum(mind, (d * d).sum(axis=1))
        return pd.DataFrame(
            {
                "__g": pd.Series([g] * len(sel_idx)),
                "__id": pd.Series([ids[i] for i in sel_idx]),
                "center_rank": pd.array(
                    range(1, len(sel_idx) + 1), dtype="Int32"
                ),
                "radius": pd.array(radii, dtype="Float64"),
            }
        )

    gt = dict(df.dtypes)[group_col]
    it = dict(df.dtypes)[id_col]
    out = base.groupBy("__g").applyInPandas(
        run,
        schema=f"__g {gt}, __id {it}, center_rank int, radius double",
    )
    return out.select(
        F.col("__g").alias(group_col),
        F.col("__id").alias(id_col),
        "center_rank", "radius",
    )


# ---------------------------------------------------------------------------
# margin-based bitext mining
# ---------------------------------------------------------------------------


def margin_scores(
    src: DataFrame,
    tgt: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    candidates: DataFrame | None = None,
    max_broadcast_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
) -> DataFrame:
    """Margin-scored cross-set pairs — the ratio-margin criterion of
    Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus Mining"),
    the scoring LASER/CCMatrix-class pipelines mine bitext with:

        margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

    where avgNN_k(x) is x's mean cosine to its k nearest candidates on
    the OTHER side. Raw cosine can't separate a true translation from
    a hub vector that is close to everything; dividing by the
    neighborhood average normalizes hubness away.

    Integer certification arithmetic: cosines quantize to
    cos_ppm = floor(cos * 1e6) BEFORE any cross-row reduction, so
    neighborhood sums are associative integers (partitioning-proof)
    and the margin is one integer division:

        margin_ppm = (2 * cos_ppm * m_x * m_y * 1e6)
                     div (den_x * m_y + den_y * m_x)

    with den/m the top-k cos_ppm sum/count per side. Negative-cosine
    pairs are dropped before scoring (mining only ranks attracting
    pairs; it also keeps every operand non-negative, so truncating and
    flooring division agree across engines). Pairs whose denominator
    is <= 0 get a NULL margin.

    `candidates` bounds the pair set — (src `id_col`, tgt `id_col`)
    column pairs named `src_id`/`tgt_id`, typically from
    `knn_join_lsh`/`ivf_topk` — and is the 100-TB path: margins over
    approximate neighborhoods are the standard practice (the
    denominators then average the k best CANDIDATES, as in production
    miners). With candidates=None the operator scores ALL cross
    pairs: the tgt side is broadcast under `max_broadcast_rows` (the
    `brute_force_topk` contract — exact, for certification/eval
    scales; it raises beyond the budget instead of silently planning
    a cartesian shuffle).

    Returns (src_id, tgt_id, cos_ppm, margin_ppm). Shuffles are keyed
    on ids (uniform); the rank windows are per-id over <= |candidates|
    rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = src.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("__sv"))
    t = tgt.select(F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("__tv"))
    if candidates is None:
        _guard_query_side(t, max_broadcast_rows, "margin_scores")
        pairs = ensure_parallelism(s).join(F.broadcast(t))
    else:
        pairs = (
            candidates.select("src_id", "tgt_id")
            .join(s, "src_id")
            .join(t, "tgt_id")
        )
    scored = pairs.select(
        "src_id",
        "tgt_id",
        F.floor(
            cosine_similarity(F.col("__sv"), F.col("__tv")) * F.lit(1_000_000)
        )
        .cast("long")
        .alias("cos_ppm"),
    ).filter(F.col("cos_ppm") >= 0)
    # the scored frame is referenced THREE times downstream (both
    # denominator aggregates and the final margin join) — without a
    # persist the candidate-generation lineage (an LSH kNN join on the
    # scale path) re-executes per reference, measured ~4x the work.
    # Narrow (two ids + one long); the `_persist_narrow` contract:
    # the cache stays registered because the RETURNED frame still
    # reads it lazily — Spark evicts LRU under pressure.
    from pyspark.storagelevel import StorageLevel

    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    ws = Window.partitionBy("src_id").orderBy(
        F.desc("cos_ppm"), F.asc("tgt_id")
    )
    wt = Window.partitionBy("tgt_id").orderBy(
        F.desc("cos_ppm"), F.asc("src_id")
    )
    ranked = scored.withColumn("__rs", F.row_number().over(ws)).withColumn(
        "__rt", F.row_number().over(wt)
    )
    sden = (
        ranked.filter(F.col("__rs") <= k)
        .groupBy("src_id")
        .agg(
            F.sum("cos_ppm").alias("__sden"),
            F.count(F.lit(1)).alias("__sm"),
        )
    )
    tden = (
        ranked.filter(F.col("__rt") <= k)
        .groupBy("tgt_id")
        .agg(
            F.sum("cos_ppm").alias("__tden"),
            F.count(F.lit(1)).alias("__tm"),
        )
    )
    den = F.col("__sden") * F.col("__tm") + F.col("__tden") * F.col("__sm")
    num = (
        F.lit(2)
        * F.col("cos_ppm")
        * F.col("__sm")
        * F.col("__tm")
        * F.lit(1_000_000)
    )
    return (
        ranked.join(sden, "src_id")
        .join(tden, "tgt_id")
        .withColumn("__margin_num", num)
        .withColumn("__margin_den", den)
        .withColumn(
            "margin_ppm",
            F.when(
                F.col("__margin_den") > 0,
                F.expr("__margin_num div __margin_den"),
            ),
        )
        .select("src_id", "tgt_id", "cos_ppm", "margin_ppm")
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    threshold_ppm: int = 1_050_000,
    strategy: str = "forward",
    candidates: DataFrame | None = None,
    max_broadcast_rows: int | None = DEFAULT_QUERY_ROW_BUDGET,
) -> DataFrame:
    """Mine aligned pairs from two embedding sets by ratio margin
    (`margin_scores`): keep, per src vector, its best-margin tgt
    (ties broken by tgt id) when the margin clears `threshold_ppm`
    (1_050_000 = the 1.05 ratio production miners typically cut at).

    strategy='forward': every src keeps its best tgt (the CCMatrix
    default). strategy='mutual': keep only pairs that are BOTH src's
    best tgt and tgt's best src — higher precision, the
    "intersection" strategy of Artetxe & Schwenk.

    Returns (src_id, tgt_id, cos_ppm, margin_ppm), one row per mined
    pair. Everything downstream of the cosine is integer arithmetic,
    so the mined set is deterministic and oracle-replayable.
    """
    if strategy not in ("forward", "mutual"):
        raise ValueError(f"strategy must be 'forward' or 'mutual', got {strategy!r}")
    m = margin_scores(
        src,
        tgt,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        candidates=candidates,
        max_broadcast_rows=max_broadcast_rows,
    ).filter(F.col("margin_ppm").isNotNull())
    wf = Window.partitionBy("src_id").orderBy(
        F.desc("margin_ppm"), F.asc("tgt_id")
    )
    fwd = (
        m.withColumn("__rf", F.row_number().over(wf))
        .filter((F.col("__rf") == 1) & (F.col("margin_ppm") >= threshold_ppm))
        .drop("__rf")
    )
    if strategy == "forward":
        return fwd
    wb = Window.partitionBy("tgt_id").orderBy(
        F.desc("margin_ppm"), F.asc("src_id")
    )
    bwd = (
        m.withColumn("__rb", F.row_number().over(wb))
        .filter((F.col("__rb") == 1) & (F.col("margin_ppm") >= threshold_ppm))
        .select("src_id", "tgt_id")
    )
    return fwd.join(bwd, ["src_id", "tgt_id"], "left_semi")
