"""Round-3 widening batch 31: robust outlier fences from exact
discrete quartiles, a tamper-evident hash-chain ledger (sequential
md5 fold — the blockchain-style audit primitive), and local peak
detection over the hourly series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_outlier_tukey",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
    row_number() OVER (PARTITION BY event_type ORDER BY round(value * 100, 0), event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
q AS (
  SELECT event_type,
    max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
    max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3,
    CAST(max(n) AS BIGINT) AS n
  FROM v GROUP BY event_type
),
fences AS (
  SELECT event_type, n, q1, q3,
    q1 - 3 * (q3 - q1) // 2 AS lo,
    q3 + 3 * (q3 - q1) // 2 AS hi
  FROM q
)
SELECT f.event_type, f.n, f.q1, f.q3, f.lo, f.hi,
  CAST(sum(CASE WHEN v.cents < f.lo OR v.cents > f.hi THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers
FROM v JOIN fences f ON v.event_type = f.event_type
GROUP BY f.event_type, f.n, f.q1, f.q3, f.lo, f.hi
ORDER BY f.event_type
""",
    tags=("D5", "E1", "B3"),
)
def d_outlier_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen with EXACT discrete quartiles: q1/q3
    are the values at ranks ⌈n/4⌉ and ⌈3n/4⌉ of a (cents, event_id)
    total order — rank selection, not interpolation, because Spark's
    percentile() interpolates and DuckDB's quantile_disc rounds
    differently; rank-at-⌈p·n⌉ is the one discrete-quantile
    definition both engines reproduce bit-exactly. Fences at
    1.5×IQR in truncating integer arithmetic; one window pass for
    ranks, a broadcast-back of the 5-row fence table for the count.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    w_n = Window.partitionBy("event_type")
    v = e.select("event_type", "event_id", cents.alias("cents")).select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    q = v.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("cents"))).alias("q1"),
        F.max(F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("cents"))).alias("q3"),
        F.max("n").alias("n"),
    )
    fences = q.select(
        "event_type", "n", "q1", "q3",
        F.expr("q1 - 3 * (q3 - q1) div 2").alias("lo"),
        F.expr("q3 + 3 * (q3 - q1) div 2").alias("hi"),
    )
    joined = v.select("event_type", "cents").join(
        F.broadcast(fences.withColumnRenamed("event_type", "ft")),
        F.col("event_type") == F.col("ft"),
    )
    return (
        joined.groupBy("event_type", "n", "q1", "q3", "lo", "hi")
        .agg(
            F.sum(
                F.when((F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi")), 1)
                .otherwise(0)
            ).alias("n_outliers")
        )
        .orderBy("event_type")
    )


@register(
    "etl_hash_chain_ledger",
    oracle="""
WITH rows_h AS (
  SELECT epoch_us(ts) // 86400000000 AS day_id,
    epoch_us(ts) AS us, event_id,
    md5(CAST(event_id AS VARCHAR) || '|' || CAST(epoch_us(ts) AS VARCHAR)
        || '|' || CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR)) AS rh
  FROM events
),
chained AS (
  -- order by (us, event_id, rh): a duplicated (ts, id) pair with a
  -- different payload must still chain in one cross-engine order;
  -- NULL-payload rows cannot be hashed into a ledger - excluded
  SELECT day_id,
    CAST(count(*) AS BIGINT) AS n_rows,
    list_reduce(
      list_prepend('GENESIS', list(rh ORDER BY us, event_id, rh)),
      (acc, x) -> md5(acc || x)
    ) AS chain_hash
  FROM rows_h WHERE rh IS NOT NULL GROUP BY day_id
)
SELECT CAST(day_id AS BIGINT) AS day_id, n_rows, chain_hash
FROM chained ORDER BY day_id
""",
    tags=("H4", "E3", "L"),
)
def etl_hash_chain_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident audit ledger: every event hashes its business
    payload, and each day's records fold into a CHAIN hash
    (hᵢ = md5(hᵢ₋₁ ‖ rowᵢ) from a GENESIS seed, rows in (ts,
    event_id) total order) — append-only-log verification, where
    changing, dropping, or reordering ANY historical row changes the
    day's final digest. The recursion is the e_ewma_fold shape: an
    ordered per-day array folded JVM-side with a higher-order
    aggregate; md5 is the engine-shared hash, so the oracle replays
    the identical chain. Per-day arrays are bounded by daily volume;
    a 100-TB ledger chains per (day, shard) then folds shard digests.
    """
    e = load_table(spark, sf_dir, "events")
    rows_h = e.select(
        epoch_us("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).select(
        F.expr("us div 86400000000").alias("day_id"),
        "us",
        "event_id",
        # concat (NULL-propagating, like the oracle's ||): a row with a
        # NULL payload field has no ledger hash and is excluded below
        F.md5(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("|"),
                F.col("us").cast("string"),
                F.lit("|"),
                F.col("cents").cast("string"),
            )
        ).alias("rh"),
    )
    chained = rows_h.filter(F.col("rh").isNotNull()).groupBy("day_id").agg(
        F.count("*").alias("n_rows"),
        F.expr(
            "aggregate("
            " transform(array_sort(collect_list(struct(us, event_id, rh))), s -> s.rh),"
            " 'GENESIS', (acc, x) -> md5(concat(acc, x)))"
        ).alias("chain_hash"),
    )
    return chained.select(
        F.col("day_id").cast("long").alias("day_id"), "n_rows", "chain_hash"
    ).orderBy("day_id")


@register(
    "e_peak_detection",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, h
),
lagged AS (
  SELECT event_type, h, cents,
    lag(cents)  OVER (PARTITION BY event_type ORDER BY h) AS prv,
    lead(cents) OVER (PARTITION BY event_type ORDER BY h) AS nxt
  FROM hourly
),
peaks AS (
  SELECT event_type, h, cents
  FROM lagged WHERE prv IS NOT NULL AND nxt IS NOT NULL
    AND cents > prv AND cents > nxt
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_peaks,
  CAST(max(cents) AS BIGINT) AS top_peak_cents,
  CAST(max(cents) * 10000000 - max(cents * 10000000 - h) AS BIGINT) AS top_peak_hour
FROM peaks GROUP BY event_type ORDER BY event_type
""",
    tags=("E2", "D1"),
)
def e_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local peak detection on the hourly revenue series: interior
    hours strictly greater than both neighbors (lag/lead on one
    event_type shuffle at HOURLY grain — the series is aggregated
    before any window touches it). The top peak's hour comes from an
    integer PACKING argmax (max(cents·10⁷ − h) unpacked against
    max(cents)) so equal-valued peaks break toward the earliest hour
    identically on both engines without a struct-ordered min_by.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            epoch_us("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select("event_type", F.expr("us div 3600000000").alias("h"), "cents")
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type", "h", "cents",
        F.lag("cents").over(w).alias("prv"),
        F.lead("cents").over(w).alias("nxt"),
    )
    peaks = lagged.filter(
        F.col("prv").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("cents") > F.col("prv"))
        & (F.col("cents") > F.col("nxt"))
    )
    return (
        peaks.groupBy("event_type")
        .agg(
            F.count("*").alias("n_peaks"),
            F.max("cents").alias("top_peak_cents"),
            F.expr(
                "max(cents) * 10000000 - max(cents * 10000000 - h)"
            ).alias("top_peak_hour"),
        )
        .orderBy("event_type")
    )
