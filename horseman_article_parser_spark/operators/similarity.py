"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH and a
centroid-routed IVF variant as the scale paths.

No counterpart exists in the reference (it has no vector data); this is
the training-data-pipeline surface the north rule's image+caption corpus
needs (caption/image embedding dedup + retrieval).

Design rules:
- Dot products via `zip_with` + `aggregate` higher-order functions —
  JVM-side, codegen'd, no Python crossing; doubles accumulated in index
  order so the DuckDB oracle (list_dot_product) reproduces values bit-for-bit.
- Brute-force top-k broadcasts the (small) query set and computes
  per-partition top-k under `Window(query).orderBy(...) row_number<=k`;
  the shuffle carries only (query_id, vec_id, score) triples, never vectors.
- IVF: k centroids (tiny, broadcast) route each vector to its nearest
  centroid once (narrow pass); queries probe `n_probe` nearest lists,
  turning the O(N·Q) scan into O(N·Q·n_probe/k) with recall traded
  explicitly — the standard 100 TB ANN shape.
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as double, accumulated left-to-right (oracle-parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column, norm_a: Column | None = None,
               norm_b: Column | None = None) -> Column:
    na = norm_a if norm_a is not None else l2_norm_col(a)
    nb = norm_b if norm_b is not None else l2_norm_col(b)
    return dot_col(a, b) / (na * nb)


# --------------------------------------------------------- brute force


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "query_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k per query,
    ties broken by neighbor_id for determinism. The only shuffle is the
    per-query top-k window over score triples."""
    q = F.broadcast(queries.select(F.col(q_id_col), F.col(q_vec_col)))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        l2_norm_col(F.col(vec_col)).alias("_nv"),
    )
    scored = c.crossJoin(q).select(
        F.col(q_id_col).alias("query_id"),
        "neighbor_id",
        cosine_col(F.col(q_vec_col), F.col("_v"), l2_norm_col(F.col(q_vec_col)), F.col("_nv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------- LSH


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-free random hyperplanes (seeded, reproducible
    across driver and oracle — the literal values are inlined in both)."""
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)
    ]


def hyperplane_bucket_col(vec: Column, n_planes: int = 8, seed: int = 7,
                          dim: int = 64) -> Column:
    """Sign-pattern bucket id in [0, 2^n_planes): bit p = (vec·plane_p) > 0."""
    planes = hyperplanes(dim, n_planes, seed)
    bucket = None
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_col(vec, arr) > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, n_planes: int = 8,
             seed: int = 7, dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding", q_id_col: str = "query_id",
             q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's
    hyperplane bucket, reranked by exact cosine. Recall rises with fewer
    planes (bigger buckets); scale path probes the bucket join instead of
    the full cross product."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"),
        hyperplane_bucket_col(F.col(vec_col), n_planes, seed, dim).alias("bucket"),
        l2_norm_col(F.col(vec_col)).alias("_nv"),
    )
    q = F.broadcast(
        queries.select(
            F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("_qv"),
            hyperplane_bucket_col(F.col(q_vec_col), n_planes, seed, dim).alias("bucket"),
            l2_norm_col(F.col(q_vec_col)).alias("_nq"),
        )
    )
    scored = c.join(q, "bucket").select(
        "query_id", "neighbor_id",
        cosine_col(F.col("_qv"), F.col("_v"), F.col("_nq"), F.col("_nv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------- IVF


def train_centroids(corpus: DataFrame, n_centroids: int = 16, n_iters: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed_mod: int = 97, exact_means: bool = False) -> DataFrame:
    """Lloyd's k-means over DataFrame ops. Init = deterministic sample
    (vec_id ordering); each iteration is one assign (broadcast centroids)
    + one mean-reduce (posexplode → avg per (cluster, dim)). Centroid
    tables are tiny and always broadcast.

    exact_means=True computes each centroid mean from an INTEGER sum of
    round(val·10^6) (order-independent, exact) divided back in a pinned
    expression order, so an independent engine (the DuckDB oracle twin)
    reproduces the trained centroids bit-for-bit regardless of partial
    aggregation order. Default off: plain double avg is marginally
    cheaper and training quality is identical."""
    # init: TakeOrdered of n_centroids rows (tiny, deterministic order),
    # numbered on the driver — no RDD API, no extra jobs (the old path
    # cost a .first() for dim + an RDD zipWithIndex round-trip)
    seed_rows = (
        corpus.orderBy(F.col(id_col) % seed_mod, id_col)
        .limit(n_centroids)
        .select(F.col(vec_col).alias("c_vec"))
        .collect()
    )
    cents = corpus.sparkSession.createDataFrame(
        [(i, list(r["c_vec"])) for i, r in enumerate(seed_rows)],
        "cluster int, c_vec array<float>",
    )
    for _ in range(n_iters):
        assigned = assign_clusters(corpus, cents, id_col, vec_col)
        exploded = (
            assigned.join(corpus, id_col)
            .select("cluster", F.posexplode(F.col(vec_col)).alias("d", "val"))
        )
        if exact_means:
            mean = (
                F.sum(F.round(F.col("val").cast("double") * 1_000_000)
                      .cast("long")).cast("double")
                / F.lit(1_000_000.0)
            ) / F.count("*").cast("double")
        else:
            mean = F.avg("val")
        cents = (
            exploded.groupBy("cluster", "d")
            .agg(mean.alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("_dm"))
            .select(
                "cluster",
                F.transform(F.col("_dm"), lambda s: s["m"].cast("float")).alias("c_vec"),
            )
        )
    return cents.select("cluster", "c_vec")


def assign_clusters(corpus: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Nearest centroid per vector (max cosine; min cluster id ties)."""
    joined = corpus.crossJoin(F.broadcast(centroids))
    sim = cosine_col(F.col(vec_col), F.col("c_vec"))
    w = Window.partitionBy(id_col).orderBy(F.desc(sim), F.asc("cluster"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), "cluster")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 10, n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", q_id_col: str = "query_id",
             q_vec_col: str = "q_vec") -> DataFrame:
    """IVF search: query probes its n_probe nearest centroid lists; exact
    cosine rerank inside the probed lists only."""
    assigned = assign_clusters(corpus, centroids, id_col, vec_col)
    inv = corpus.join(assigned, id_col).select(
        F.col("cluster"), F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"), l2_norm_col(F.col(vec_col)).alias("_nv"),
    )
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("_qv"),
        F.col("cluster"), cosine_col(F.col(q_vec_col), F.col("c_vec")).alias("_csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_csim"), F.asc("cluster"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "_qv", "cluster", l2_norm_col(F.col("_qv")).alias("_nq"))
    )
    scored = inv.join(F.broadcast(probes), "cluster").select(
        "query_id", "neighbor_id",
        cosine_col(F.col("_qv"), F.col("_v"), F.col("_nq"), F.col("_nv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
