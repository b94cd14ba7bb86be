"""Round-3 widening batch 55: X̄-R control chart (continuous-variable
SPC with tabulated constants on the integer milli grid), SFT
instruction-data linting, and nested-view resolution through the
temp-view catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table, register_views
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "e_xbar_r_chart",
    oracle="""
WITH p AS (
  SELECT epoch_us(ts) // 86400000000 AS d, epoch_us(ts) AS us, event_id,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
sub AS (
  SELECT d, cents FROM (
    SELECT d, cents, row_number() OVER (PARTITION BY d ORDER BY us, event_id) AS rn
    FROM p
  ) WHERE rn <= 5
),
groups AS (
  SELECT d,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cents) AS BIGINT) AS s,
    CAST(max(cents) - min(cents) AS BIGINT) AS r
  FROM sub GROUP BY d HAVING count(*) = 5
),
grand AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(s) AS BIGINT) AS ss, CAST(sum(r) AS BIGINT) AS sr
  FROM groups
),
tested AS (
  -- |x̄−x̿| > A₂·R̄ cross-multiplied by 5k·1000:
  -- |s·k − ss|·1000 > 577·5·sr ; R-chart: r·k·1000 > 2114·sr
  SELECT
    CASE WHEN abs(CAST(g.s AS BIGINT) * grand.k - grand.ss) * 1000
           > CAST(577 AS BIGINT) * grand.sr * 5 THEN 1 ELSE 0 END AS xbar_ooc,
    CASE WHEN CAST(g.r AS BIGINT) * grand.k * 1000 > 2114 * grand.sr THEN 1 ELSE 0 END AS r_ooc,
    grand.k
  FROM groups g CROSS JOIN grand
)
SELECT
  CAST(max(k) AS BIGINT) AS n_subgroups,
  CAST(sum(xbar_ooc) AS BIGINT) AS n_xbar_ooc,
  CAST(sum(r_ooc) AS BIGINT) AS n_range_ooc
FROM tested
""",
    tags=("D8", "E3"),
)
def e_xbar_r_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X̄-R control chart (Shewhart, subgroup size 5): the first five
    purchases of each day form a rational subgroup; a subgroup's
    mean breaches when |x̄ − x̿| > A₂·R̄ and its range when R > D₄·R̄
    (A₂ = 0.577, D₄ = 2.114 for n = 5 — the tabulated constants on
    a milli grid). Every test cross-multiplies to integers
    (|s·k − Σs|·1000 > 577·ΣR·5 — means never materialize as
    doubles), so breach counts are bit-exact. The chart constants
    encode the d₂ bias correction a naive ±3σ recomputation gets
    wrong — which is why SPC uses the table, and why this entry pins
    it.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    p = e.select(
        epoch_us("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).select(F.expr("us div 86400000000").alias("d"), "us", "event_id", "cents")
    w = Window.partitionBy("d").orderBy("us", "event_id")
    sub = p.select("d", "cents", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 5
    )
    groups = (
        sub.groupBy("d")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("s"),
            (F.max("cents") - F.min("cents")).alias("r"),
        )
        .filter(F.col("n") == 5)
    )
    grand = groups.agg(
        F.count("*").alias("k"), F.sum("s").alias("ss"), F.sum("r").alias("sr")
    )
    tested = groups.crossJoin(F.broadcast(grand)).select(
        F.when(
            F.abs(F.col("s") * F.col("k") - F.col("ss")) * 1000
            > F.lit(577) * F.col("sr") * 5,
            1,
        )
        .otherwise(0)
        .alias("xbar_ooc"),
        F.when(F.col("r") * F.col("k") * 1000 > F.lit(2114) * F.col("sr"), 1)
        .otherwise(0)
        .alias("r_ooc"),
        F.col("k"),
    )
    return tested.agg(
        F.max("k").alias("n_subgroups"),
        F.sum("xbar_ooc").alias("n_xbar_ooc"),
        F.sum("r_ooc").alias("n_range_ooc"),
    )


@register(
    "t_sft_lint",
    oracle="""
WITH d AS (
  SELECT lang, string_split(text, ' ') AS ws
  FROM documents WHERE len(string_split(text, ' ')) >= 2
),
halves AS (
  SELECT lang,
    len(ws) // 2 AS p_toks,
    len(ws) - len(ws) // 2 AS r_toks,
    array_to_string(ws[1:len(ws) // 2], ' ') AS prompt,
    array_to_string(ws[len(ws) // 2 + 1:len(ws)], ' ') AS response
  FROM d
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(CASE WHEN r_toks < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_short_response,
  CAST(sum(CASE WHEN prompt = response THEN 1 ELSE 0 END) AS BIGINT) AS n_echo,
  CAST(sum(CASE WHEN p_toks + r_toks > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_budget
FROM halves GROUP BY lang ORDER BY lang
""",
    tags=("J13", "J2"),
)
def t_sft_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT instruction-data linting over the t_chat_template pairs:
    the three defect classes every fine-tuning set is screened for —
    degenerate short responses (< 3 tokens teach nothing), echo
    pairs (response byte-equal to the prompt: the model would learn
    to parrot), and over-budget sequences (> 100 tokens here,
    truncation fodder). Pure string/integer expressions; per-language
    defect counts are the dataset-card table.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 2
    )
    halves = d.select("lang", F.split("text", " ").alias("ws")).select(
        "lang",
        F.expr("cast(size(ws) div 2 as long)").alias("p_toks"),
        F.expr("cast(size(ws) - size(ws) div 2 as long)").alias("r_toks"),
        F.expr("array_join(slice(ws, 1, size(ws) div 2), ' ')").alias("prompt"),
        F.expr(
            "array_join(slice(ws, size(ws) div 2 + 1, size(ws) - size(ws) div 2), ' ')"
        ).alias("response"),
    )
    return (
        halves.groupBy("lang")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("r_toks") < 3, 1).otherwise(0)).alias("n_short_response"),
            F.sum(F.when(F.col("prompt") == F.col("response"), 1).otherwise(0)).alias("n_echo"),
            F.sum(F.when(F.col("p_toks") + F.col("r_toks") > 100, 1).otherwise(0)).alias(
                "n_over_budget"
            ),
        )
        .orderBy("lang")
    )


@register(
    "a_nested_views",
    oracle="""
WITH v_base AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O'
),
v_agg AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
  FROM v_base GROUP BY o_orderpriority
)
SELECT o_orderpriority, n, cents FROM v_agg ORDER BY o_orderpriority
""",
    tags=("A1", "B1"),
)
def a_nested_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested view resolution: a filter view, an aggregate view
    DEFINED OVER the first, and a query through the top — the
    layered semantic-model stack (staging → mart → report) resolved
    by the catalog at query time, with filters and pruning pushed
    through BOTH view layers by the optimizer (views are macros to
    Catalyst, not materialization boundaries). The oracle flattens
    the same stack as CTEs.
    """
    register_views(spark, sf_dir)
    spark.sql(
        """
CREATE OR REPLACE TEMP VIEW v_base AS
SELECT o_orderpriority, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
FROM orders WHERE o_orderstatus = 'O'
"""
    )
    spark.sql(
        """
CREATE OR REPLACE TEMP VIEW v_agg AS
SELECT o_orderpriority, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
FROM v_base GROUP BY o_orderpriority
"""
    )
    return spark.sql(
        "SELECT o_orderpriority, CAST(n AS BIGINT) AS n, cents FROM v_agg"
        " ORDER BY o_orderpriority"
    )
