"""Round-4 widening batch 75: compressed-vector retrieval — sign-bit
binary embeddings with Hamming top-k (exact oracle) and product
quantization with asymmetric-distance scoring (recall invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import similarity as S
from parking_violations_data_pipeline_spark.registry import register


@register(
    "j_hamming_knn",
    oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
j AS (
  SELECT e.vec_id, e.label, e.embedding, q.qv
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
)
SELECT vec_id, label,
  CASE WHEN embedding IS NULL OR qv IS NULL THEN NULL
       ELSE CAST(list_sum([CASE WHEN (embedding[i] >= 0) != (qv[i] >= 0)
                 THEN 1 ELSE 0 END FOR i IN range(1, 65)]) AS BIGINT) END
    AS hamming
FROM j
ORDER BY hamming NULLS LAST, vec_id LIMIT 10
""",
    tags=("J8", "H5"),
)
def j_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-embedding retrieval: binarize every dimension to its
    sign bit and rank by Hamming distance to the query — the 256×
    compression (64 floats → 64 bits) that makes web-scale first-stage
    retrieval affordable; integer distances mean the top-k cut is
    EXACTLY reproducible cross-engine (no float rounding contract
    needed, unlike cosine). The query row is broadcast-joined (no
    driver-side literal), the distance is one zip_with/aggregate pair
    inside codegen, and the global top-10 is TakeOrderedAndProject —
    no full sort at any scale."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    j = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    hamming = F.aggregate(
        F.zip_with(
            "embedding",
            "qv",
            lambda a, b: ((a >= 0) != (b >= 0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        j.select("vec_id", "label", hamming.alias("hamming"))
        # nulls LAST (SQL convention; Spark asc defaults nulls first):
        # unknown vectors rank after every known distance
        .orderBy(F.col("hamming").asc_nulls_last(), "vec_id")
        .limit(10)
    )


@register(
    "j_pq_adc",
    oracle="""
SELECT CAST(10 AS BIGINT) AS k,
       CAST(32 AS BIGINT) AS compression_x,
       TRUE AS recall_ok
""",
    tags=("J8",),
)
def j_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (J8 scale path #3, beside LSH and
    IVF): m=8 subspaces × 16 codes — 64-dim float vectors (256 B)
    score from 8-byte codes via a broadcast asymmetric-distance
    table (32× memory compression), then the ADC top-100 shortlist is
    re-ranked EXACTLY on the float vectors (the production two-stage
    shape — the quantizer generates candidates, the exact metric makes
    the cut). In-plan invariant: the final top-10 must recover ≥ 60%
    of the exact L2 top-10 (measured 8-10/10 across the gate scales;
    the codebook build is cross-run deterministic via seeded init +
    6-decimal rounding before every argmin). Oracle reproduces k, the
    compression factor, and TRUE."""
    e = load_table(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").head()
    qv = (
        [float(x) for x in row["embedding"]]
        if row and row["embedding"] is not None
        else [0.0] * 64
    )
    pq = S.pq_adc_knn(e, qv, k=10).select("vec_id", F.lit(1).alias("hit"))
    qarr = F.array(*[F.lit(x) for x in qv])
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            qarr,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = (
        e.select("vec_id", F.round(d2, 4).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    return exact.join(pq, "vec_id", "left").agg(
        F.lit(10).cast("bigint").alias("k"),
        F.lit(32).cast("bigint").alias("compression_x"),
        (F.count("hit") >= 0.6 * F.count("*")).alias("recall_ok"),
    )
