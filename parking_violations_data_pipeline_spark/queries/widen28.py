"""Round-3 widening batch 29: LLM training-data preparation ops —
T5-style span corruption accounting and chat-template assembly with
exact cross-engine string proof — plus daily VWAP (volume-weighted
average price) on the integer grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_span_corruption",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws
  FROM documents WHERE length(text) > 0
),
per AS (
  SELECT doc_id, lang,
    len(ws) AS n_tokens,
    len(list_filter([i FOR i IN generate_series(1, len(ws))],
                    i -> (i * 7919 + doc_id) % 5 = 0)) AS n_masked,
    len(list_filter([i FOR i IN generate_series(1, len(ws))],
                    i -> (i * 7919 + doc_id) % 5 = 0
                     AND NOT ((i - 1) * 7919 + doc_id) % 5 = 0)) AS n_sentinels
  FROM d
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
  CAST(sum(n_masked) AS BIGINT) AS sum_masked,
  CAST(sum(n_sentinels) AS BIGINT) AS sum_sentinels,
  CAST(sum(n_masked) * 1000000 // sum(n_tokens) AS BIGINT) AS corrupt_ppm
FROM per GROUP BY lang ORDER BY lang
""",
    tags=("J2", "J13", "H5"),
)
def t_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style span corruption accounting: tokens are masked by
    a deterministic seedless rule ((i·7919 + doc_id) mod 5 — the
    cross-engine RNG convention), adjacent masked tokens merge into
    one sentinel span (a mask-start is a masked token whose
    predecessor is unmasked). The report per language — corruption
    rate in ppm plus sentinel counts — is exactly what a
    denoising-objective pipeline checks before training (target ~15%
    corruption, mean span length = masked/sentinels). All counting
    runs as JVM higher-order filters over the token index sequence —
    no explode, no Python.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    per = d.select(
        "lang",
        F.expr("size(split(text, ' '))").alias("n_tokens"),
        F.expr(
            "size(filter(sequence(1, size(split(text, ' '))),"
            " i -> (i * 7919 + doc_id) % 5 = 0))"
        ).alias("n_masked"),
        F.expr(
            "size(filter(sequence(1, size(split(text, ' '))),"
            " i -> (i * 7919 + doc_id) % 5 = 0"
            " AND NOT ((i - 1) * 7919 + doc_id) % 5 = 0))"
        ).alias("n_sentinels"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("n_masked").alias("sum_masked"),
            F.sum("n_sentinels").alias("sum_sentinels"),
            F.expr("sum(n_masked) * 1000000 div sum(n_tokens)").alias("corrupt_ppm"),
        )
        .orderBy("lang")
    )


@register(
    "t_chat_template",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws
  FROM documents WHERE len(string_split(text, ' ')) >= 2
),
halves AS (
  SELECT doc_id, lang,
    array_to_string(ws[1:len(ws) // 2], ' ') AS prompt,
    array_to_string(ws[len(ws) // 2 + 1:len(ws)], ' ') AS response,
    len(ws) // 2 AS n_prompt_toks,
    len(ws) - len(ws) // 2 AS n_response_toks
  FROM d
),
tpl AS (
  SELECT lang, n_prompt_toks, n_response_toks,
    '<|user|>' || chr(10) || prompt || chr(10) || '<|assistant|>' || chr(10) || response AS t
  FROM halves
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT md5(t)) AS BIGINT) AS n_distinct_templates,
  CAST(sum(length(t)) AS BIGINT) AS sum_chars,
  CAST(sum(n_prompt_toks) AS BIGINT) AS prompt_toks,
  CAST(sum(n_response_toks) AS BIGINT) AS response_toks,
  CAST(sum(CASE WHEN length(t) > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_budget
FROM tpl GROUP BY lang ORDER BY lang
""",
    tags=("J13", "H1", "H4"),
)
def t_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template assembly for SFT data prep: each document is
    split at the word midpoint into a (prompt, response) pair and
    rendered through the chat template ('<|user|>\\n…\\n<|assistant|>'
    \\n…'); the report counts pairs, template characters, token
    budgets and over-budget sequences per language. The
    cross-engine proof is count(DISTINCT md5(template)) — equal
    counts mean every assembled string is BYTE-identical on both
    engines (separators, newlines, slicing boundaries), which is the
    bug class template code actually has. Pure string expressions,
    JVM-side.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 2
    )
    halves = d.select("lang", F.split("text", " ").alias("ws")).select(
        "lang",
        F.expr("array_join(slice(ws, 1, size(ws) div 2), ' ')").alias("prompt"),
        F.expr(
            "array_join(slice(ws, size(ws) div 2 + 1,"
            " size(ws) - size(ws) div 2), ' ')"
        ).alias("response"),
        F.expr("cast(size(ws) div 2 as long)").alias("n_prompt_toks"),
        F.expr("cast(size(ws) - size(ws) div 2 as long)").alias("n_response_toks"),
    )
    tpl = halves.select(
        "lang",
        "n_prompt_toks",
        "n_response_toks",
        F.concat(
            F.lit("<|user|>\n"),
            F.col("prompt"),
            F.lit("\n<|assistant|>\n"),
            F.col("response"),
        ).alias("t"),
    )
    return (
        tpl.groupBy("lang")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct(F.md5("t")).alias("n_distinct_templates"),
            F.sum(F.length("t")).alias("sum_chars"),
            F.sum("n_prompt_toks").alias("prompt_toks"),
            F.sum("n_response_toks").alias("response_toks"),
            F.sum(F.when(F.length("t") > 512, 1).otherwise(0)).alias("n_over_budget"),
        )
        .orderBy("lang")
    )


@register(
    "q_vwap_monthly",
    oracle="""
WITH l AS (
  SELECT year(l_shipdate) * 12 + month(l_shipdate) - 1 AS m,
    CAST(l_quantity AS BIGINT) AS qty,
    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem
)
SELECT CAST(m AS BIGINT) AS month_idx,
  CAST(sum(qty) AS BIGINT) AS volume,
  CAST(sum(cents) AS BIGINT) AS notional_cents,
  CAST(sum(cents) * 1000 // sum(qty) AS BIGINT) AS vwap_milli
FROM l GROUP BY m ORDER BY m
""",
    tags=("D1", "H2"),
)
def q_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per month — the execution-quality
    benchmark (VWAP = Σ notional / Σ volume): one map-side-combined
    aggregate over the fact table, the weighted-average-by-ratio-of-
    sums pattern (never avg-of-averages, which overweights small
    trades). Milli-cent output via a single floor division after the
    exact integer sums.
    """
    l = load_table(spark, sf_dir, "lineitem")
    m = (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("m")
    return (
        l.select(
            m,
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("m")
        .agg(
            F.sum("qty").alias("volume"),
            F.sum("cents").alias("notional_cents"),
            F.expr("sum(cents) * 1000 div sum(qty)").alias("vwap_milli"),
        )
        .select(
            F.col("m").cast("long").alias("month_idx"),
            "volume",
            "notional_cents",
            "vwap_milli",
        )
        .orderBy("month_idx")
    )
