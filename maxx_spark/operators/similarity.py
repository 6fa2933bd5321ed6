"""Similarity search over the embeddings table (array<float>, 64-dim).

- knn_cosine_bruteforce: exact top-k via broadcast of the (small) query set
  against all candidates. The dot product folds left-to-right in double via
  F.aggregate over F.zip_with — bit-identical to any engine folding the
  same order in IEEE double (the oracle replicates the fold).
- knn_cosine_lsh: random-hyperplane LSH buckets (deterministic seeded
  planes embedded as literals), exact cosine *within* bucket — the scale
  path: the crossJoin cost drops from |Q|x|N| to |Q|x|bucket|.

Scale notes: brute-force is the correctness baseline; at 100 TB the LSH
variant (or IVF with k-means centroids) bounds the candidate set. Both emit
only integer (query_id, neighbor_id, rank) — float similarity never leaves
the operator, so cross-engine float-formatting can't break comparisons.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8

# Deterministic hyperplanes (fixed seed) — embedded as literals in both the
# Spark plan and the SQL oracle, so bucket assignments match exactly.
_rng = np.random.RandomState(12345)
PLANES: list[list[float]] = [[float(x) for x in _rng.uniform(-1.0, 1.0, DIM)] for _ in range(N_PLANES)]


def _dot(a, b):
    """Left-fold dot product in double: ((0+x0*y0)+x1*y1)+... IEEE-exact and
    engine-agnostic for a fixed element order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def knn_cosine_bruteforce(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries (broadcast), rank
    over each query's candidates; ties break by neighbor id."""
    q = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    cos = _dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
        .orderBy("query_id", "rnk")
    )


def _bucket(col):
    """LSH bucket id: bit b = 1 iff dot(plane_b, v) > 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(PLANES):
        pl = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(pl, col) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit * F.lit(1 << b).cast("long")
    return bucket


def knn_cosine_lsh(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """ANN: exact cosine top-k *within* the query's LSH bucket.

    Bucketing is a narrow projection (no shuffle); the candidate join is an
    equi-join on bucket — at scale this is the difference between a full
    crossJoin and touching ~1/2^B of the corpus per query.
    """
    emb = embeddings.withColumn("bucket", _bucket(F.col("embedding")))
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "bucket"
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), "bucket")
    cos = _dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
        .orderBy("query_id", "rnk")
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid components (IVF building block): mean vector per
    label via posexplode + groupBy. Emits one row per (label, pos) with the
    mean rounded to 4 decimals (see note below on float determinism).
    """
    ex = embeddings.select("label", F.posexplode("embedding").alias("pos", "v"))
    # The double sum is order-dependent across partitions, but with O(100)
    # unit-scale terms the drift is ~1e-13 — rounding the mean to 4 decimals
    # makes both engines agree with overwhelming margin.
    sums = ex.groupBy("label", "pos").agg(
        F.sum(F.col("v").cast("double")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return sums.select(
        "label",
        "pos",
        F.round(F.col("s") / F.col("n"), 4).alias("mean_v"),
        F.col("n").alias("n_members"),
    ).orderBy("label", "pos")


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine >= threshold. Brute-force n^2 is the correctness baseline; the
    scale path buckets candidates first (see knn_cosine_lsh — identical
    bucketing applies). Emits integer ids only.

    Normalization happens ONCE per vector (projection), so each pair costs
    a single fold instead of three — the oracle mirrors the exact same
    normalize-then-dot order so doubles stay bit-identical."""
    norm = _norm(F.col("embedding"))
    ne = F.transform(F.col("embedding"), lambda x: x.cast("double") / norm)
    n = embeddings.select("vec_id", ne.alias("ne"))
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("ne").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("ne").alias("nb"))
    cos = F.aggregate(
        F.zip_with(F.col("na"), F.col("nb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cos >= threshold)
        .select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")
    )
