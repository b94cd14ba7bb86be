"""Data-mining / monitoring composites: RFM segmentation, anomaly
z-scores, stratified sampling, and embedding quantization.

Four production shapes a warehouse + training-data stack runs daily:
customer RFM scoring (the classic marketing segmentation — pure
integer threshold CASE ladders over two aggregates), per-hour anomaly
detection (z-score of hourly event counts against the event type's
own distribution), per-stratum seeded sampling (`df.sampleBy` — the
corpus re-balancing step; engine-specific RNG, so the oracle checks
in-plan bound invariants like f_sample), and int8 scalar quantization
of embedding columns (the storage layout step before ANN indexing;
codes are exact integers once the affine map is fixed).

Determinism rules: every segment boundary / bucket compare runs on
exact integers (cents, counts, epoch days); z-scores are rounded to 4
decimals on both sides before the flag compare; quantization guards
the degenerate zero-range dimension and emits integer code sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_rfm_segments",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
rfm AS (
  -- grouped on the fact's own key: a customer-side join adds nothing
  -- and would fan the counts under duplicated dimension rows
  SELECT o.o_custkey AS c_custkey,
    date_diff('day', CAST(max(o.o_orderdate) AS DATE),
              CAST((SELECT mxd FROM mx) AS DATE)) AS rec_days,
    count(*) AS freq,
    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o
  GROUP BY o.o_custkey
),
scored AS (
  SELECT c_custkey,
    CASE WHEN rec_days <= 365 THEN 3 WHEN rec_days <= 1095 THEN 2 ELSE 1 END AS r,
    CASE WHEN freq >= 3 THEN 3 WHEN freq >= 2 THEN 2 ELSE 1 END AS f,
    CASE WHEN cents >= 40000000 THEN 3 WHEN cents >= 10000000 THEN 2 ELSE 1 END AS m,
    cents
  FROM rfm
)
SELECT r || '-' || f || '-' || m AS segment,
  count(*) AS n_customers,
  CAST(round(sum(cents) / 100.0, 2) AS DOUBLE) AS segment_revenue
FROM scored GROUP BY segment ORDER BY segment
""",
    tags=("D1", "B6", "H2", "C1"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation:
    score each dimension 1-3 on fixed business thresholds, then count
    customers and revenue per segment.

    Recency is exact integer days between the customer's last order
    and the corpus max date (1-row broadcast); frequency and monetary
    are exact counts/cents, so every threshold compare is
    engine-identical. One shuffle (per-customer agg); the segment
    re-aggregation runs over ≤27 rows.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    rfm = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .join(F.broadcast(mx))
        .withColumn(
            "rec_days", F.datediff(F.to_date("mxd"), F.to_date("last_order"))
        )
    )
    r = (
        F.when(F.col("rec_days") <= 365, 3)
        .when(F.col("rec_days") <= 1095, 2)
        .otherwise(1)
    )
    fq = F.when(F.col("freq") >= 3, 3).when(F.col("freq") >= 2, 2).otherwise(1)
    m = (
        F.when(F.col("cents") >= 40000000, 3)
        .when(F.col("cents") >= 10000000, 2)
        .otherwise(1)
    )
    return (
        rfm.select(
            F.concat_ws("-", r, fq, m).alias("segment"), F.col("cents")
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).cast("double").alias("segment_revenue"),
        )
        .orderBy("segment")
    )


@register(
    "e_anomaly_zscore",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
  FROM events GROUP BY event_type, h
),
stats AS (
  SELECT event_type AS st, avg(cnt) AS mu, stddev_samp(cnt) AS sd
  FROM hourly GROUP BY event_type
  HAVING stddev_samp(cnt) > 0
)
SELECT h.event_type, h.h, CAST(h.cnt AS BIGINT) AS cnt,
  round((h.cnt - s.mu) / s.sd, 4) AS z,
  (round((h.cnt - s.mu) / s.sd, 4) >= 2.0) AS is_spike
FROM hourly h JOIN stats s ON s.st = h.event_type
WHERE round((h.cnt - s.mu) / s.sd, 4) >= 1.0
ORDER BY h.event_type, h.h
""",
    tags=("D1", "D8", "H2", "B6"),
)
def e_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly traffic anomaly detection: z-score each (event_type,
    hour) count against that type's own hourly distribution, keep
    hours at ≥1σ and flag ≥2σ spikes.

    Two stacked aggregations (hour grid ≈ types × hours — tiny at any
    scale) with the 5-row stats table broadcast back. Counts are exact
    integers; mu/sd are double but both engines see identical inputs,
    and the flag compares the ROUNDED z (4 decimals) so cross-engine
    ulp drift in stddev cannot flip a boundary row.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("cnt"))
    # sd > 0 guard on BOTH sides: a constant-count type would divide by
    # zero, and double x/0 semantics differ across engines.
    stats = (
        hourly.groupBy(F.col("event_type").alias("st"))
        .agg(F.avg("cnt").alias("mu"), F.stddev_samp("cnt").alias("sd"))
        .filter(F.col("sd") > 0)
    )
    z = F.round((F.col("cnt") - F.col("mu")) / F.col("sd"), 4)
    return (
        hourly.join(F.broadcast(stats), hourly.event_type == stats.st)
        .withColumn("z", z)
        .filter(F.col("z") >= 1.0)
        .select(
            "event_type",
            "h",
            F.col("cnt").cast("long").alias("cnt"),
            "z",
            (F.col("z") >= 2.0).alias("is_spike"),
        )
        .orderBy("event_type", "h")
    )


@register(
    "j_stratified_sample",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
  TRUE AS ok_frac, TRUE AS ok_subset
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("F", "D1"),
)
def j_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified seeded sampling (`sampleBy`) — the corpus
    re-balancing step that over-samples rare strata: purchase/signup
    at 50%, everything else at 25%.

    Engine-specific RNG, so (like f_sample) the invariants are
    computed in-plan and the oracle reproduces totals + TRUE:
    `ok_frac` = per-stratum sampled fraction within ±4σ binomial
    bounds at the smallest test scale (n≈200/stratum at sf0.001);
    `ok_subset` = every sampled row joins back to its stratum total
    (sampleBy can't invent rows; checked via the count identity
    n_samp ≤ n_total).
    """
    e = load_table(spark, sf_dir, "events").select("event_type")
    fracs = {
        "purchase": 0.5,
        "signup": 0.5,
        "click": 0.25,
        "view": 0.25,
        "error": 0.25,
    }
    totals = e.groupBy("event_type").agg(F.count("*").alias("n_total"))
    sampled = (
        e.sampleBy("event_type", fractions=fracs, seed=7)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_samp"))
    )
    hi = F.when(F.col("event_type").isin("purchase", "signup"), 0.5).otherwise(0.25)
    n_samp = F.coalesce(F.col("n_samp"), F.lit(0))
    frac = F.try_divide(n_samp, F.col("n_total"))
    # below ~100 rows/stratum the ±0.15 band is noise — vacuously ok;
    # LEFT join keeps strata whose sample came up empty
    small = F.col("n_total") < 100
    return (
        totals.join(sampled, "event_type", "left")
        .select(
            "event_type",
            F.col("n_total").cast("long").alias("n_total"),
            (small | ((frac >= hi - 0.15) & (frac <= hi + 0.15))).alias("ok_frac"),
            (n_samp <= F.col("n_total")).alias("ok_subset"),
        )
        .orderBy("event_type")
    )


@register(
    "j_embedding_quantize",
    oracle="""
WITH vals AS (
  SELECT i.range AS pos, CAST(embedding[CAST(i.range AS INT)] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN range(1, 65) i
  WHERE embedding IS NOT NULL
),
rng AS (SELECT pos AS rpos, min(v) AS mn, max(v) AS mx FROM vals GROUP BY pos),
codes AS (
  SELECT v.pos,
    CASE WHEN r.mx = r.mn THEN 0
         ELSE CAST(round((v.v - r.mn) / (r.mx - r.mn) * 255) AS BIGINT)
    END AS code
  FROM vals v JOIN rng r ON r.rpos = v.pos
)
SELECT CAST(pos AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n,
  CAST(min(code) AS BIGINT) AS code_min, CAST(max(code) AS BIGINT) AS code_max,
  CAST(sum(code) AS BIGINT) AS code_sum
FROM codes GROUP BY pos ORDER BY pos
""",
    tags=("J7", "H5", "D1"),
)
def j_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (the storage /
    ANN-index layout step): per-dimension affine map onto [0, 255],
    verified by per-dimension code statistics.

    posexplode → per-dim min/max (64 rows, broadcast back) → exact
    integer codes. The affine expression `(v-mn)/(mx-mn)*255` is
    written in the identical operation order on both sides — IEEE
    double ops on identical inputs are bit-deterministic, so the
    rounded codes match exactly; a zero-range dimension degenerates to
    code 0 on both sides. At 100 TB the per-dim stats are a bounded
    64-row broadcast, and code emission is a pure map stage.
    """
    e = load_table(spark, sf_dir, "embeddings")
    vals = e.select(
        F.posexplode("embedding").alias("pos0", "vf")
    ).select((F.col("pos0") + 1).alias("pos"), F.col("vf").cast("double").alias("v"))
    rng = vals.groupBy(F.col("pos").alias("rpos")).agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.round((F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255).cast(
            "long"
        )
    )
    return (
        vals.join(F.broadcast(rng), vals.pos == rng.rpos)
        .select(F.col("pos").cast("long").alias("pos"), code.alias("code"))
        .groupBy("pos")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("code").cast("long").alias("code_min"),
            F.max("code").cast("long").alias("code_max"),
            F.sum("code").cast("long").alias("code_sum"),
        )
        .orderBy("pos")
    )
