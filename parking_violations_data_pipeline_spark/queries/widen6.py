"""Round-3 widening batch 7: time-series imputation (LOCF + linear
interpolation over a generated spine), temperature-based source
mixing for training-data composition, generator/tabular functions,
correlated EXISTS on the SQL surface, and value-change streak mining.

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles rounded on both sides,
total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table, register_views
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "e_locf_interpolate",
    oracle="""
WITH obs AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
         round(avg(value), 4) AS v
  FROM events
  WHERE event_type = 'purchase' AND user_id <= 40
  GROUP BY 1, 2
),
span AS (
  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span
),
series AS (
  SELECT s.user_id, s.h, o.v FROM spine s
  LEFT JOIN obs o ON o.user_id = s.user_id AND o.h = s.h
),
filled AS (
  SELECT user_id, h, v,
    last_value(v IGNORE NULLS) OVER w_prev  AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w_prev AS prev_h,
    first_value(v IGNORE NULLS) OVER w_next AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w_next AS next_h
  FROM series
  WINDOW
    w_prev AS (PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
  CAST(count(*) AS BIGINT)      AS n_hours,
  CAST(count(v) AS BIGINT)      AS n_obs,
  ((CAST(sum(CAST(round(prev_v * 10000) AS BIGINT)) AS BIGINT) + 50) // 100)
    / 100.0                     AS locf_sum,
  ((CAST(sum(CAST(round((CASE
    WHEN v IS NOT NULL THEN v
    WHEN prev_v IS NULL THEN next_v
    WHEN next_v IS NULL THEN prev_v
    ELSE prev_v + (next_v - prev_v) * (h - prev_h) * 1.0 / (next_h - prev_h)
  END) * 10000) AS BIGINT)) AS BIGINT) + 50) // 100) / 100.0
                                AS interp_sum
FROM filled GROUP BY user_id ORDER BY user_id
""",
    tags=("E2", "E3", "H2"),
)
def e_locf_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation over a generated hourly spine:
    last-observation-carried-forward AND two-sided linear
    interpolation, the two standard fills for sensor/feature series
    before they feed a model.

    The spine is sequence(min_hour, max_hour) exploded per user (no
    calendar table needed); the left join re-attaches observations;
    both fills come from TWO window passes over ONE user_id shuffle —
    forward (last ignoreNulls) and backward (first ignoreNulls over
    the following frame). Interpolation is position-aware: it weights
    by distance between the bracketing observed hours, not by row
    index. Epoch-hour integers keep the time axis exact on both
    engines; per-hour values are rounded before the fills so summation
    stays on identical inputs.
    """
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.filter((F.col("event_type") == "purchase") & (F.col("user_id") <= 40))
        .groupBy(
            "user_id",
            (epoch_us(F.col("ts")) / 3_600_000_000).cast("long").alias("h"),
        )
        .agg(F.round(F.avg("value"), 4).alias("v"))
    )
    span = obs.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    series = spine.join(obs, ["user_id", "h"], "left")
    w_prev = (
        W.partitionBy("user_id").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("user_id").orderBy("h").rowsBetween(0, W.unboundedFollowing)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    filled = series.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("prev_h"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("next_h"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("h") - F.col("prev_h"))
            / (F.col("next_h") - F.col("prev_h"))
        )
    )
    # Sum exact integer ten-thousandths, not doubles: a double sum near a
    # .xx5 boundary flips the 2-decimal rounding with accumulation order,
    # and even a bigint-exact sum diverges if the FINAL round() runs on a
    # double (Spark rounds the shortest-string decimal, DuckDB the raw
    # binary — they disagree just below .xx5). So the cent-rounding is
    # integer arithmetic too: (units + 50) div 100, values are >= 0.
    locf_units = F.round(F.col("prev_v") * 10000, 0).cast("long")
    interp_units = F.round(interp * 10000, 0).cast("long")
    return (
        filled.groupBy("user_id")
        .agg(
            F.count("*").alias("n_hours"),
            F.count("v").alias("n_obs"),
            F.sum(locf_units).alias("_locf_u"),
            F.sum(interp_units).alias("_interp_u"),
        )
        .select(
            "user_id",
            "n_hours",
            "n_obs",
            (F.expr("(_locf_u + 50) div 100") / 100.0).alias("locf_sum"),
            (F.expr("(_interp_u + 50) div 100") / 100.0).alias("interp_sum"),
        )
        .orderBy("user_id")
    )


@register(
    "t_temperature_mix",
    oracle="""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
tot AS (
  SELECT source, n_docs,
         sum(n_docs) OVER () AS total,
         sum(pow(n_docs, 0.7)) OVER () AS z
  FROM per
)
SELECT source, n_docs,
  round(n_docs * 1.0 / total, 6)            AS p_raw,
  round(pow(n_docs, 0.7) / z, 6)            AS p_temp,
  round((pow(n_docs, 0.7) / z) / (n_docs * 1.0 / total), 4) AS upsample
FROM tot ORDER BY source
""",
    tags=("J16", "J2", "D1"),
)
def t_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the mT5/XLM-R recipe,
    alpha = 0.7): turn raw per-source document counts into the
    sampling distribution p_s ∝ n_s^alpha that upsamples scarce
    sources and damps dominant ones — the knob every multi-source
    pretraining mix is tuned with.

    One shuffle to the source grain; the normalizer is a window over
    the handful of source rows. `upsample` > 1 marks sources the
    sampler must repeat (scarce), < 1 marks ones it thins. Downstream,
    t_lang_balance_resample applies this kind of quota physically;
    this entry computes the canonical mixture itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    wall = W.partitionBy()
    tot = per.select(
        "source",
        "n_docs",
        F.sum("n_docs").over(wall).alias("total"),
        F.sum(F.pow("n_docs", 0.7)).over(wall).alias("z"),
    )
    p_raw = F.col("n_docs") / F.col("total")
    p_temp = F.pow("n_docs", 0.7) / F.col("z")
    return tot.select(
        "source",
        "n_docs",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / p_raw, 4).alias("upsample"),
    ).orderBy("source")


@register(
    "h_generator_funcs",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(p_name, ' ')) AS w,
         generate_subscripts(string_split(p_name, ' '), 1) - 1 AS pos
  FROM part
)
SELECT pos,
  CAST(count(*) AS BIGINT)           AS n,
  CAST(count(DISTINCT w) AS BIGINT)  AS n_words,
  min(w)                             AS first_word,
  max(w)                             AS last_word
FROM words WHERE pos <= 4 GROUP BY pos ORDER BY pos
""",
    tags=("H5", "H1"),
)
def h_generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explosion: posexplode keeps each element's POSITION,
    the piece plain explode drops — required whenever order inside the
    array is data (token positions, path segments, rank lists).

    posexplode is a Generate operator: pure map-side, no shuffle until
    the position rollup. The oracle's generate_subscripts is DuckDB's
    WITH ORDINALITY equivalent (1-based, hence the -1).
    """
    p = load_table(spark, sf_dir, "part")
    words = p.select(
        F.posexplode(F.split("p_name", " ")).alias("pos", "w")
    )
    return (
        words.filter(F.col("pos") <= 4)
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("w").alias("n_words"),
            F.min("w").alias("first_word"),
            F.max("w").alias("last_word"),
        )
        .orderBy("pos")
    )


@register(
    "c_correlated_exists",
    oracle="""
SELECT c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(sum(CASE WHEN EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000
  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders,
  CAST(sum(CASE WHEN NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_never_ordered
FROM customer
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    tags=("C4", "C5", "B6"),
)
def c_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS inside a projection — the SQL
    surface for existence tests that aren't top-level semi-joins.
    Catalyst decorrelates both subqueries into ExistenceJoin variants
    over one pass of orders each; neither becomes a per-customer loop.

    Counts per segment: how many customers have at least one >150k
    order, and how many never ordered at all — the inclusion/exclusion
    pair c_semi_join / c_anti_join express as DataFrame ops, here
    written as the correlated-subquery dialect users actually type.
    """
    register_views(spark, sf_dir)
    return spark.sql("""
SELECT c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(sum(CASE WHEN EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000
  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders,
  CAST(sum(CASE WHEN NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_never_ordered
FROM customer
GROUP BY c_mktsegment ORDER BY c_mktsegment
""")


@register(
    "e_value_streaks",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN event_type IS DISTINCT FROM
      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    THEN 1 ELSE 0 END AS brk
  FROM events WHERE ts IS NOT NULL
),
runs AS (
  SELECT user_id, event_type,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
),
run_lengths AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, event_type, run_id
)
SELECT event_type,
  CAST(count(*) AS BIGINT)  AS n_runs,
  CAST(max(run_len) AS BIGINT) AS max_run,
  round(avg(run_len), 4)    AS avg_run
FROM run_lengths GROUP BY event_type ORDER BY event_type
""",
    tags=("E2", "E3"),
)
def e_value_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-value streaks (conditional change events): how many
    runs of identical consecutive event_type each stream contains, and
    how long they get — the repetition signal behind bot detection and
    session-quality scoring.

    The classic islands trick at value grain: a change flag via lag,
    a running sum of flags numbering the runs, then two aggregations.
    Everything after the first window rides the SAME user_id shuffle;
    the (ts, event_id) tie-break gives a total order so run boundaries
    are identical on both engines.
    """
    # streak order is event time: NULL ts dropped on both sides
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    runs = flagged.select(
        "user_id",
        "event_type",
        F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("run_id"),
    )
    run_lengths = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count("*").alias("run_len")
    )
    return (
        run_lengths.groupBy("event_type")
        .agg(
            F.count("*").alias("n_runs"),
            F.max("run_len").alias("max_run"),
            F.round(F.avg("run_len"), 4).alias("avg_run"),
        )
        .orderBy("event_type")
    )
