"""Similarity search over embedding columns (SURVEY.md §2 J7-J10).

Three tiers, by scale:
  1. `knn_bruteforce` — JVM higher-order-function cosine against a
     broadcast query vector; exact; O(n) scan, no shuffle. The
     baseline and the verify path.
  2. `knn_pandas` — Arrow-batched pandas UDF + numpy matmul for bulk
     scoring (many query vectors at once); exact; the single-node
     throughput path.
  3. `ann_lsh` — random-hyperplane LSH bucketing: sign-bit signature
     over H deterministic hyperplanes → equi-join per bucket → exact
     re-rank inside buckets. Approximate; the 100-TB path (shuffle is
     O(n), candidate scoring is per-bucket).

Hyperplanes are generated deterministically from a seed via a hash
mix (no RNG at plan time — resumable, cluster-reproducible).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from parking_violations_data_pipeline_spark.functions.vector import cosine_sim


def knn_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector (broadcast as a
    literal array — no join at all). round(…,4)+id tie-break keeps the
    cut deterministic."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine_sim(F.col(vec_col), qv), 4).alias("sim")
    return (
        embeddings.select(id_col, sim)
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def knn_pandas(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via Arrow-batched pandas UDF (numpy dot per batch).
    Same contract as knn_bruteforce; ~10-100× faster per row than
    row-at-a-time Python, and the pattern that scales to a matrix of
    query vectors (matmul) — K2 surface."""
    import numpy as np

    q = [float(x) for x in query_vec]

    @F.pandas_udf(T.DoubleType())
    def cos(batch: pd.Series) -> pd.Series:
        m = np.array(batch.tolist(), dtype=np.float64)
        qv = np.asarray(q, dtype=np.float64)
        num = m @ qv
        den = np.linalg.norm(m, axis=1) * np.linalg.norm(qv)
        return pd.Series(num / den)

    return (
        embeddings.select(id_col, F.round(cos(F.col(vec_col)), 4).alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def _hyperplane(h: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane h: component j =
    cos(golden-ratio mix of (h, j)) — fixed, seedless, engine-side."""
    phi = 0.6180339887498949
    return [math.cos(2 * math.pi * ((h * 0.7548776662466927 + j * phi) % 1.0)) for j in range(dim)]


def lsh_bucket(
    embeddings: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature: bucket = bit-packed signs of
    ⟨v, plane_h⟩. Cosine-similar vectors collide with prob
    1 - θ/π per plane. Pure expressions: the planes are literal arrays
    folded into the plan (broadcast-free)."""
    dim_row = embeddings.select(F.size(vec_col).alias("d")).head()
    dim = dim_row["d"] if dim_row else 64
    bucket = F.lit(0)
    for h in range(num_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(h, dim)])
        d = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << h)).otherwise(0)
    return embeddings.withColumn(out, bucket)


def ann_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket matches
    the query's bucket (single-probe). At 100 TB, bucket the corpus
    once (write partitioned by bucket) and each query touches ~n/2^H
    rows. Recall < 1 by construction → rows-only correctness class."""
    dim = len(query_vec)
    qbucket = 0
    for h in range(num_planes):
        plane = _hyperplane(h, dim)
        if sum(p * q for p, q in zip(plane, query_vec)) > 0:
            qbucket |= 1 << h
    bucketed = lsh_bucket(embeddings, num_planes, vec_col)
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(id_col, F.round(cosine_sim(F.col(vec_col), qv), 4).alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def similarity_self_join(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    num_planes: int = 4,
) -> DataFrame:
    """All pairs with cosine > threshold (J9). Exact mode is the
    O(n²) crossJoin — correct, oracle-checkable, only for bounded n.
    use_lsh=True buckets first so pairs are generated per-bucket
    (equi-join) — the scale path, approximate recall."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    if use_lsh:
        a = lsh_bucket(
            embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")),
            num_planes,
            "va",
            "bucket",
        )
        b = lsh_bucket(
            embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")),
            num_planes,
            "vb",
            "bucket",
        )
        pairs = a.join(b, (a.bucket == b.bucket) & (F.col("id_a") < F.col("id_b")))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine_sim(F.col("va"), F.col("vb")), 4).alias("sim")
        )
        .filter(F.col("sim") > threshold)
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-label centroid (J10): posexplode → (label, pos) mean →
    re-assemble ordered array. Two shuffles, both on small keys; at
    scale the (label,pos) cardinality is labels×dim — tiny."""
    ex = embeddings.select(
        label_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v")
    )
    per_pos = ex.groupBy(label_col, "pos").agg(F.avg("v").alias("m"))
    return (
        per_pos.groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: F.round(s["m"], round_to)
            ).alias("centroid")
        )
    )
