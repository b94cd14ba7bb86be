"""Round-3 widening batch 24: iterative linear algebra (principal
direction via power iteration on the embedding Gram matrix, all
integer arithmetic — the PCA primitive) and the multimodal modality
router (one mapInPandas pass dispatching mixed media to per-modality
extractors).

The power-iteration oracle is GENERATED: _ITERS (currently 100)
unrolled CTE levels of the identical integer recurrence (the
q_trade_pagerank technique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import multimodal as MM
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register

_DIMS = 8
_ITERS = 100


def _power_oracle() -> str:
    parts = [
        f"""
WITH src AS (
  SELECT vec_id, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, {_DIMS})) AS t(i)
  WHERE embedding IS NOT NULL
),
gram AS MATERIALIZED (
  -- 128-bit product sum: q reaches 1e10 on unnormalized embeddings,
  -- so q*q (1e20) overflows int64; g after //1e6 fits BIGINT
  SELECT a.i AS r, b.i AS c,
    CAST(sum(CAST(a.q AS HUGEINT) * b.q) // 1000000 AS BIGINT) AS g
  FROM src a JOIN src b ON a.vec_id = b.vec_id GROUP BY a.i, b.i
),
v0 AS (
  SELECT i AS d, CAST(1000000 AS BIGINT) AS v
  FROM unnest(generate_series(1, {_DIMS})) AS t(i)
)"""
    ]
    for k in range(1, _ITERS + 1):
        parts.append(
            f""",
w{k} AS MATERIALIZED (
  -- w stays HUGEINT: g·v reaches ~1e21 before renormalization once
  -- gram cells carry unnormalized-embedding magnitudes
  SELECT g.r AS d, sum(CAST(g.g AS HUGEINT) * v.v) AS w
  FROM gram g JOIN v{k - 1} v ON g.c = v.d GROUP BY g.r
),
v{k} AS MATERIALIZED (
  SELECT d, CAST(w // s AS BIGINT) AS v
  FROM w{k}, (SELECT greatest(max(abs(w)) // 1000000, 1) AS s FROM w{k})
)"""
        )
    parts.append(
        f"""
SELECT CAST(v{_ITERS}.d AS BIGINT) AS dim, v{_ITERS}.v AS v_micro, gram.g AS g_diag
FROM v{_ITERS} JOIN gram ON gram.r = v{_ITERS}.d AND gram.c = v{_ITERS}.d
ORDER BY dim"""
    )
    return "".join(parts)


@register("j_gram_power_iteration", oracle=_power_oracle(), tags=("J10", "H3", "D1"))
def j_gram_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal direction of the embedding corpus (first 8 dims) by
    POWER ITERATION on the Gram matrix — the PCA/spectral primitive
    behind representation-collapse monitoring and whitening. The
    data-sized stage is distributed: each vector contributes its
    dim² outer-product cells through one vec_id-joined explode and a
    64-key aggregate (map-side combined). Only the dims×dims Gram —
    bounded by model width, never by corpus size — reaches the
    driver (the IVF-centroid precedent), where 100 iterations run in
    EXACT integer arithmetic: micro-unit quantized inputs, bigint
    cell sums scaled by 10⁻⁶, per-step renormalization via
    truncating division by max|w|//10⁶. A double formulation would
    compound summation-order ulps per iteration; the integer
    recurrence is bit-identical on both engines (truncation
    semantics verified: Spark `div` and DuckDB `//` both round
    toward zero). Oracle unrolls the same recurrence as 100 chained
    CTE levels (8-row tables — still sub-second). 100 iterations, not
    10: this corpus's eigengap is thin (lambda2/lambda1 = 0.958
    measured at sf0.001), so 10 steps leave the iterate at cosine 0.65
    from the principal axis while 100 reach 0.9998 — found by the
    round-5 independent eigendecomposition twin
    (tests/test_indep_ml_r5.py). Per-step renormalization bounds every
    integer below 1.6e16, so iteration count costs nothing in range.
    """
    e = load_table(spark, sf_dir, "embeddings")
    src = e.select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, _DIMS)).alias("i0", "x"),
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("q"),
    )
    a = src.alias("a")
    b = src.alias("b")
    # 128-bit product sum (DECIMAL(38,0)): q reaches 1e10 on
    # unnormalized embeddings, so q*q overflows int64 (extremes
    # fixture); g after div 1e6 fits a long again
    gram_df = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("r"), F.col("b.i").alias("c"))
        .agg(
            F.expr(
                "CAST(sum(CAST(a.q AS DECIMAL(38,0)) * b.q)"
                " div 1000000 AS LONG)"
            ).alias("g")
        )
    )
    cells = {(row["r"], row["c"]): row["g"] for row in gram_df.collect()}

    def tdiv(x: int, s: int) -> int:
        # truncate toward zero, matching Spark div / DuckDB //
        return -((-x) // s) if x < 0 else x // s

    v = [10**6] * _DIMS
    for _ in range(_ITERS):
        w = [
            sum(cells.get((i + 1, j + 1), 0) * v[j] for j in range(_DIMS))
            for i in range(_DIMS)
        ]
        s = max(max(abs(x) for x in w) // 10**6, 1)
        v = [tdiv(x, s) for x in w]

    if not cells:  # no non-NULL vectors: no Gram, no iterate (the
        # oracle's CTE chain yields zero rows from an empty src)
        return spark.createDataFrame([], "dim long, v_micro long, g_diag long")
    rows = [
        (i + 1, v[i], cells.get((i + 1, i + 1), 0)) for i in range(_DIMS)
    ]
    return local_df(spark, rows, "dim long, v_micro long, g_diag long").orderBy("dim")


@register(
    "m_modality_router",
    oracle="""
WITH b AS (
  SELECT doc_id, text, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
),
m AS (
  -- features over UTF-8 BYTES via the hex dump (characterwise only
  -- matched the engine's byte path on pure ASCII); NULL text -> NULL
  SELECT doc_id, n,
    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
    CASE WHEN text IS NULL THEN NULL ELSE CASE doc_id % 3
      WHEN 0 THEN CASE WHEN n >= 4
        THEN 16*(instr('0123456789ABCDEF', substring(h, 1, 1))-1)
               + (instr('0123456789ABCDEF', substring(h, 2, 1))-1)
           + 16*(instr('0123456789ABCDEF', substring(h, 3, 1))-1)
               + (instr('0123456789ABCDEF', substring(h, 4, 1))-1)
           + 16*(instr('0123456789ABCDEF', substring(h, 5, 1))-1)
               + (instr('0123456789ABCDEF', substring(h, 6, 1))-1)
           + 16*(instr('0123456789ABCDEF', substring(h, 7, 1))-1)
               + (instr('0123456789ABCDEF', substring(h, 8, 1))-1)
        ELSE -1 END
      WHEN 1 THEN n // 256
      ELSE CASE WHEN n = 0 THEN 0 ELSE 1 + (n - 1) // 64 END
    END END AS feature
  FROM b
)
SELECT mime,
  CAST(count(*) AS BIGINT)    AS n_docs,
  CAST(sum(n) AS BIGINT)      AS total_bytes,
  CAST(sum(feature) AS BIGINT) AS sum_feature
FROM m GROUP BY mime ORDER BY mime
""",
    tags=("MM", "K2"),
)
def m_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-media routing: a corpus interleaving images, audio and
    video (mime derived per row) flows through ONE mapInPandas pass
    that groups each Arrow batch by mime and runs the right
    vectorized extractor per group (operators/multimodal.py
    route_modalities) — one table scan for all modalities instead of
    one job per modality. Extractors are the deterministic fakes
    (codecs absent in this container; decode_media documents the
    plug point); the oracle recomputes every feature characterwise
    from the source text, proving payload integrity through the
    binary path and the router's dispatch correctness.
    """
    d = load_table(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    with_bin = MM.attach_binary(d).withColumn("mime", mime)
    feats = MM.route_modalities(with_bin)
    return (
        feats.groupBy("mime")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("feature").alias("sum_feature"),
        )
        .orderBy("mime")
    )
