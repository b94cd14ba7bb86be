"""Round-3 widening batch 26: Johnson-Lindenstrauss random projection
(±1 signs derived from md5 — the seedless cross-engine RNG), eventual
sequential-pattern support (A eventually-followed-by B at user grain),
and price elasticity of demand — all exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register

_PROJ_K = 8  # projected dimensions


@register(
    "j_random_projection",
    oracle=f"""
WITH src AS (
  SELECT vec_id, label, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
  WHERE embedding IS NOT NULL
),
signs AS MATERIALIZED (
  SELECT i, j,
    CASE WHEN ascii(substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)) % 2 = 0
         THEN 1 ELSE -1 END AS sgn
  FROM unnest(generate_series(1, 64)) AS a(i),
       unnest(generate_series(1, {_PROJ_K})) AS b(j)
),
proj AS (
  SELECT s.vec_id, s.label, g.j, CAST(sum(g.sgn * s.q) AS BIGINT) AS p
  FROM src s JOIN signs g ON s.i = g.i
  GROUP BY s.vec_id, s.label, g.j
),
norms AS (
  -- 128-bit squares scaled back to micro-units: p reaches ~6e11 on
  -- unnormalized embeddings, so p*p overflows int64; the //1e6
  -- rescale keeps the OUTPUT column a BIGINT (the ppm ratio below is
  -- scale-invariant because both n2 sums carry the same factor)
  SELECT vec_id, label,
    CAST(sum(CAST(p AS HUGEINT) * p) // 1000000 AS BIGINT) AS proj_n2
  FROM proj GROUP BY vec_id, label
),
orig AS (
  SELECT vec_id,
    CAST(sum(CAST(q AS HUGEINT) * q) // 1000000 AS BIGINT) AS orig_n2
  FROM src GROUP BY vec_id
)
SELECT n.label,
  CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(sum(o.orig_n2) AS BIGINT) AS sum_orig_n2,
  CAST(sum(n.proj_n2) AS BIGINT) AS sum_proj_n2,
  CAST(sum(n.proj_n2) // greatest({_PROJ_K} * sum(o.orig_n2) // 1000000, 1) AS BIGINT)
    AS energy_ratio_ppm
FROM norms n JOIN orig o ON n.vec_id = o.vec_id
GROUP BY n.label ORDER BY n.label
""",
    tags=("J10", "H4", "H5"),
)
def j_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: 64-dim
    embeddings projected to 8 dims through a ±1 sign matrix — the
    cheap distance-preserving sketch used before clustering/dedup at
    corpus scale. Signs derive from md5(i_j) parity (the seedless
    hash both engines share — the l_grouped_split precedent), inputs
    quantize to integer micro-units, so projections and norms are
    bit-exact bigints. The per-label energy ratio Σ‖p‖²/(k·Σ‖q‖²)
    ≈ 1 is the JL contract MEASURED (ppm, divide-the-divisor form —
    the SCALE_SMOKE overflow rule); the 64×8 sign matrix broadcasts,
    the projection is one explode + equi-join + (vec,j) aggregate.
    """
    e = load_table(spark, sf_dir, "embeddings")
    src = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("i0", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("q"),
    )
    dims_i = spark.range(1, 65).select(F.col("id").cast("int").alias("i"))
    dims_j = spark.range(1, _PROJ_K + 1).select(F.col("id").cast("int").alias("j"))
    h = F.md5(F.concat_ws("_", F.col("i").cast("string"), F.col("j").cast("string")))
    signs = dims_i.crossJoin(dims_j).select(
        "i",
        "j",
        F.when(F.ascii(F.substring(h, 1, 1)) % 2 == 0, 1).otherwise(-1).alias("sgn"),
    )
    proj = (
        src.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "label", "j")
        .agg(F.sum(F.col("sgn") * F.col("q")).alias("p"))
    )
    # 128-bit squares scaled to micro-units (see oracle note): p*p and
    # q*q overflow int64 on unnormalized embeddings; //1e6 keeps the
    # outputs BIGINT and the ppm ratio is scale-invariant
    norms = proj.groupBy("vec_id", "label").agg(
        F.expr(
            "CAST(sum(CAST(p AS DECIMAL(38,0)) * p) div 1000000 AS LONG)"
        ).alias("proj_n2")
    )
    orig = src.groupBy(F.col("vec_id").alias("ov")).agg(
        F.expr(
            "CAST(sum(CAST(q AS DECIMAL(38,0)) * q) div 1000000 AS LONG)"
        ).alias("orig_n2")
    )
    return (
        norms.join(orig, norms.vec_id == orig.ov)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("orig_n2").alias("sum_orig_n2"),
            F.sum("proj_n2").alias("sum_proj_n2"),
            F.expr(
                f"sum(proj_n2) div greatest({_PROJ_K} * sum(orig_n2) div 1000000, 1)"
            ).alias("energy_ratio_ppm"),
        )
        .orderBy("label")
    )


@register(
    "q_seq_pattern_support",
    oracle="""
WITH per AS (
  SELECT user_id, event_type,
    min(epoch_us(ts)) AS first_us,
    max(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id, event_type
),
tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM per)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  CAST(count(*) AS BIGINT) AS support_users,
  CAST(count(*) * 1000000 // tot.n_users AS BIGINT) AS support_ppm
FROM per a JOIN per b
  ON a.user_id = b.user_id AND a.event_type <> b.event_type
CROSS JOIN tot
WHERE a.first_us < b.last_us
GROUP BY a.event_type, b.event_type, tot.n_users
ORDER BY type_a, type_b
""",
    tags=("D1", "C1", "E2"),
)
def q_seq_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support: for each ordered type pair (A, B),
    how many users did A EVENTUALLY followed by B (some A-event
    strictly before some B-event) — the 2-item sequence-mining
    primitive behind 'browse → buy' style funnels without adjacency
    constraints (e_path_transitions counts only ADJACENT pairs).
    The user×type min/max rollup compresses each user to ≤5 rows, so
    the pair join is 25 pairs per user at most — linear in users,
    with eventual-follow reduced to first_A < last_B on the exact
    µs grid.
    """
    e = load_table(spark, sf_dir, "events")
    per = (
        e.select("user_id", "event_type", epoch_us("ts").alias("us"))
        .groupBy("user_id", "event_type")
        .agg(F.min("us").alias("first_us"), F.max("us").alias("last_us"))
    )
    tot = per.select(F.countDistinct("user_id").alias("n_users"))
    a = per.alias("a")
    b = per.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .filter(F.col("a.first_us") < F.col("b.last_us"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("support_users"))
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "support_users",
            F.expr("support_users * 1000000 div n_users").alias("support_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q_price_elasticity",
    oracle="""
WITH yr AS (
  SELECT p.p_brand AS brand, year(l.l_shipdate) AS y,
    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN (1997, 1998)
  GROUP BY p.p_brand, year(l.l_shipdate)
),
wide AS (
  SELECT brand,
    max(CASE WHEN y = 1997 THEN qty END)   AS q0,
    max(CASE WHEN y = 1997 THEN cents END) AS c0,
    max(CASE WHEN y = 1998 THEN qty END)   AS q1,
    max(CASE WHEN y = 1998 THEN cents END) AS c1
  FROM yr GROUP BY brand
  HAVING q0 IS NOT NULL AND q1 IS NOT NULL
),
px AS (
  SELECT brand, q0, q1,
    c0 * 1000 // q0 AS p0_milli,
    c1 * 1000 // q1 AS p1_milli
  FROM wide
)
SELECT brand,
  CAST(p1_milli - p0_milli AS BIGINT) AS dp_milli,
  CAST(q1 - q0 AS BIGINT) AS dq,
  CAST((q1 - q0) * p0_milli * 1000000
       // nullif(q0 * (p1_milli - p0_milli), 0) AS BIGINT) AS elasticity_ppm
FROM px ORDER BY brand
""",
    tags=("D1", "C1"),
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per brand across 1997→1998:
    (Δq/q₀)/(Δp/p₀) on the same integer milli-cent price grid as
    q_price_volume_bridge. Emitted in ppm via one truncating
    division (semantics verified identical across engines, including
    negatives); brands whose average price did not move emit NULL
    (nullif guard) rather than a fake infinity — the honest
    undefined-elasticity answer.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    y = F.year("l_shipdate")
    yr = (
        l.filter(y.isin(1997, 1998))
        .join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), y.alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"),
        )
    )
    wide = (
        yr.groupBy("brand")
        .agg(
            F.max(F.when(F.col("y") == 1997, F.col("qty"))).alias("q0"),
            F.max(F.when(F.col("y") == 1997, F.col("cents"))).alias("c0"),
            F.max(F.when(F.col("y") == 1998, F.col("qty"))).alias("q1"),
            F.max(F.when(F.col("y") == 1998, F.col("cents"))).alias("c1"),
        )
        .filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    )
    px = wide.select(
        "brand", "q0", "q1",
        F.expr("c0 * 1000 div q0").alias("p0_milli"),
        F.expr("c1 * 1000 div q1").alias("p1_milli"),
    )
    return px.select(
        "brand",
        (F.col("p1_milli") - F.col("p0_milli")).alias("dp_milli"),
        (F.col("q1") - F.col("q0")).alias("dq"),
        F.expr(
            "(q1 - q0) * p0_milli * 1000000"
            " div nullif(q0 * (p1_milli - p0_milli), 0)"
        ).alias("elasticity_ppm"),
    ).orderBy("brand")
