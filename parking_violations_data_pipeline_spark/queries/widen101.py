"""Round-4 widening batch 101: Arrow-optimized Python UDTF (the
vectorized table-function path) and an anomaly-detector ensemble vote
(z-score × MAD × Tukey agreement).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "k_arrow_udtf",
    oracle="""
WITH w AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
  FROM documents WHERE doc_id < 200
)
SELECT CAST(length(word) AS INT) AS word_len,
  CAST(count(*) AS BIGINT) AS cnt
FROM w WHERE word <> ''
GROUP BY word_len ORDER BY word_len
""",
    tags=("K4", "K2"),
)
def k_arrow_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDTF (useArrow=True): same LATERAL
    table-function surface as K4's k_udtf, but rows cross the Python
    boundary as Arrow batches instead of pickled tuples — the switch
    that makes a Python UDTF viable in a hot path (k_udtf's
    row-at-a-time transfer is the documented slow variant). The word
    length histogram must match the pure-SQL split exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_len int", useArrow=True)
    class ExplodeWordsArrow:
        def eval(self, text: str):
            import re

            if text is None:  # lower(NULL) splits to nothing, like the SQL twin
                return
            for w in re.split(r"[^a-z]+", text.lower()):
                if w:
                    yield (len(w),)

    name = f"explode_words_arrow_{os.getpid()}"
    spark.udtf.register(name, ExplodeWordsArrow)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    view = f"__docs_arrow_udtf_{os.getpid()}"
    d.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT t.word_len, count(*) AS cnt
        FROM {view}, LATERAL {name}(text) t
        GROUP BY t.word_len ORDER BY t.word_len
        """
    )


@register(
    "e_anomaly_ensemble",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
  FROM events GROUP BY event_type, d
),
stats AS (
  SELECT event_type, d, n,
    count(*) OVER (PARTITION BY event_type) AS cnt,
    sum(n) OVER (PARTITION BY event_type) AS sn,
    sum(n * n) OVER (PARTITION BY event_type) AS snn
  FROM daily
),
ranked AS (
  SELECT event_type, d, n, cnt, sn, snn,
    row_number() OVER (PARTITION BY event_type ORDER BY n, d) AS rn
  FROM stats
),
med AS (
  SELECT event_type, max(CASE WHEN rn = (cnt + 1) // 2 THEN n END) AS median_n,
    max(CASE WHEN rn = (cnt + 3) // 4 THEN n END) AS q1,
    max(CASE WHEN rn = (3 * cnt + 1) // 4 THEN n END) AS q3
  FROM ranked GROUP BY event_type
),
mad AS (
  SELECT r.event_type, r.d, r.n, r.cnt, r.sn, r.snn, m.median_n, m.q1, m.q3,
    row_number() OVER (PARTITION BY r.event_type
                       ORDER BY abs(r.n - m.median_n), r.d) AS mrn
  FROM ranked r JOIN med m ON r.event_type = m.event_type
),
madv AS (
  SELECT event_type, max(CASE WHEN mrn = (cnt + 1) // 2
         THEN abs(n - median_n) END) AS mad_n
  FROM mad GROUP BY event_type
),
flags AS (
  SELECT a.event_type, a.d,
    CASE WHEN (a.n * a.cnt - a.sn) * (a.n * a.cnt - a.sn)
         > 9 * (a.cnt * a.snn - a.sn * a.sn) THEN 1 ELSE 0 END AS z_flag,
    CASE WHEN abs(a.n - a.median_n) > 3 * v.mad_n THEN 1 ELSE 0 END AS mad_flag,
    CASE WHEN a.n < a.q1 - 3 * (a.q3 - a.q1)
         OR a.n > a.q3 + 3 * (a.q3 - a.q1) THEN 1 ELSE 0 END AS tukey_flag
  FROM mad a JOIN madv v ON a.event_type = v.event_type
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_days,
  CAST(sum(z_flag) AS BIGINT) AS z_hits,
  CAST(sum(mad_flag) AS BIGINT) AS mad_hits,
  CAST(sum(tukey_flag) AS BIGINT) AS tukey_hits,
  CAST(count(*) FILTER (WHERE z_flag + mad_flag + tukey_flag >= 2)
       AS BIGINT) AS consensus_hits
FROM flags GROUP BY event_type ORDER BY event_type
""",
    tags=("E3", "D5", "D8"),
)
def e_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly-detector ensemble over daily volumes: three independent
    rules — 3σ z-score (cross-multiplied integers, no sqrt: (n·cnt−Σn)²
    > 9·(cnt·Σn²−(Σn)²)), 3×MAD from the rank-exact median, and an
    extreme Tukey fence (3×IQR) — voted per (type, day); a consensus
    hit needs ≥2 of 3. Ensembling is how production monitors suppress
    single-rule false positives; every rule here is integer/rank-exact
    so the vote is bit-reproducible. One shuffle on event_type feeds
    all three rules' windows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    wt = Window.partitionBy("event_type")
    stats = daily.select(
        "event_type",
        "d",
        "n",
        F.count("*").over(wt).alias("cnt"),
        F.sum("n").over(wt).alias("sn"),
        F.sum(F.col("n") * F.col("n")).over(wt).alias("snn"),
        F.row_number().over(wt.orderBy("n", "d")).alias("rn"),
    )
    med = stats.groupBy("event_type").agg(
        F.max(F.expr("CASE WHEN rn = (cnt + 1) div 2 THEN n END")).alias(
            "median_n"
        ),
        F.max(F.expr("CASE WHEN rn = (cnt + 3) div 4 THEN n END")).alias("q1"),
        F.max(F.expr("CASE WHEN rn = (3 * cnt + 1) div 4 THEN n END")).alias(
            "q3"
        ),
    )
    mad = stats.join(med, "event_type").withColumn(
        "mrn",
        F.row_number().over(
            wt.orderBy(F.abs(F.col("n") - F.col("median_n")), "d")
        ),
    )
    madv = mad.groupBy("event_type").agg(
        F.max(
            F.expr("CASE WHEN mrn = (cnt + 1) div 2 THEN abs(n - median_n) END")
        ).alias("mad_n")
    )
    flags = mad.join(madv, "event_type").select(
        "event_type",
        "d",
        F.expr(
            "CASE WHEN (n * cnt - sn) * (n * cnt - sn)"
            " > 9 * (cnt * snn - sn * sn) THEN 1 ELSE 0 END"
        ).alias("z_flag"),
        F.expr(
            "CASE WHEN abs(n - median_n) > 3 * mad_n THEN 1 ELSE 0 END"
        ).alias("mad_flag"),
        F.expr(
            "CASE WHEN n < q1 - 3 * (q3 - q1) OR n > q3 + 3 * (q3 - q1)"
            " THEN 1 ELSE 0 END"
        ).alias("tukey_flag"),
    )
    return (
        flags.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("z_flag").alias("z_hits"),
            F.sum("mad_flag").alias("mad_hits"),
            F.sum("tukey_flag").alias("tukey_hits"),
            F.count(
                F.when(
                    F.col("z_flag") + F.col("mad_flag") + F.col("tukey_flag") >= 2,
                    1,
                )
            ).alias("consensus_hits"),
        )
        .orderBy("event_type")
    )
