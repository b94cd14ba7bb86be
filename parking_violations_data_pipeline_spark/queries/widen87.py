"""Round-4 widening batch 87: fill-in-the-middle split planning
(hash-derived, reconstruction-proven) and preference-pair construction
(the DPO/RLHF dataset-prep op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_fim_split",
    oracle="""
WITH d AS (
  SELECT source, text, length(text) AS n,
    ('0x' || substr(md5(text || '-p'), 1, 8))::BIGINT AS h1,
    ('0x' || substr(md5(text || '-m'), 1, 8))::BIGINT AS h2
  FROM documents WHERE length(text) >= 6
),
sp AS (
  SELECT source, text, n,
    1 + (h1 % (n // 3)) AS a,
    n - 1 - (h2 % (n // 3)) AS b
  FROM d
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(a) AS BIGINT) AS prefix_chars,
  CAST(sum(length(substr(text, a + 1, b - a))) AS BIGINT) AS middle_chars,
  CAST(sum(n - b) AS BIGINT) AS suffix_chars,
  (sum(a) + sum(b - a) + sum(n - b) = sum(n)) AS reconstructed,
  CAST(sum(b - a) * 1000000 // sum(n) AS BIGINT) AS middle_ppm
FROM sp GROUP BY source ORDER BY source
""",
    tags=("J1", "H4"),
)
def t_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle split planning — the FIM transform
    (prefix / middle / suffix with the middle moved to the end) that
    code-model training applies to a slice of every corpus. Split
    points are content-hash-derived (md5 → conv(…,16,10), the
    cross-engine hex-to-int bridge), so the plan is reproducible
    without a seed store and re-shuffles per content change. Each
    side keeps ≥1 char by construction (a ≤ n/3 < b). The middle
    segment is measured by actually substring-ing the text — and the
    conservation law prefix + middle + suffix = total chars is
    emitted in-plan per source."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 6)
        .select(
            "source",
            "text",
            F.length("text").alias("n"),
            F.expr(
                "cast(conv(substr(md5(concat(text, '-p')), 1, 8), 16, 10) as bigint)"
            ).alias("h1"),
            F.expr(
                "cast(conv(substr(md5(concat(text, '-m')), 1, 8), 16, 10) as bigint)"
            ).alias("h2"),
        )
    )
    sp = d.select(
        "source",
        "text",
        "n",
        (F.lit(1) + F.col("h1") % F.expr("n div 3")).alias("a"),
        (F.col("n") - 1 - F.col("h2") % F.expr("n div 3")).alias("b"),
    )
    return (
        sp.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("a").alias("prefix_chars"),
            F.sum(
                F.length(
                    F.expr("substr(text, cast(a + 1 as int), cast(b - a as int))")
                )
            ).alias("middle_chars"),
            F.sum(F.col("n") - F.col("b")).alias("suffix_chars"),
            (
                F.sum("a") + F.sum(F.col("b") - F.col("a"))
                + F.sum(F.col("n") - F.col("b"))
                == F.sum("n")
            ).alias("reconstructed"),
            F.expr("sum(b - a) * 1000000 div sum(n)").alias("middle_ppm"),
        )
        .orderBy("source")
    )


@register(
    "t_preference_pairs",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
    len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        w -> w != '')) * 100 // greatest(length(text), 1) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, score,
    row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rtop,
    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rbot,
    count(*) OVER (PARTITION BY lang) AS n
  FROM scored
),
pairs AS (
  SELECT t.lang, t.score AS chosen, b.score AS rejected
  FROM ranked t JOIN ranked b
    ON t.lang = b.lang AND t.rtop = b.rbot AND t.rtop <= t.n // 4
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(chosen - rejected) AS BIGINT) AS sum_margin,
  CAST(min(chosen - rejected) AS BIGINT) AS min_margin,
  bool_and(chosen >= rejected) AS ordered_ok
FROM pairs GROUP BY lang ORDER BY lang
""",
    tags=("E1", "C1"),
)
def t_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction — the DPO/RLHF data-prep op: within
    each language stratum, the i-th best document (by a simple
    word-density quality score, integer per-100-chars) is paired with
    the i-th worst, for the top quartile — maximally-separated pairs
    with a deterministic (score, doc_id) rank on both ends. The margin
    distribution and the ordering guarantee (chosen ≥ rejected — equal
    scores can meet only at the exact median crossing) come out
    in-plan. Two rank windows on ONE lang shuffle + a self-join on the
    rank equality."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.expr(
            "size(filter(split(lower(text), '[^a-z]+'), w -> w != '')) * 100"
            " div greatest(length(text), 1)"
        ).alias("score"),
    )
    w = Window.partitionBy("lang")
    ranked = scored.select(
        "doc_id",
        "lang",
        "score",
        F.row_number().over(w.orderBy(F.desc("score"), "doc_id")).alias("rtop"),
        F.row_number().over(w.orderBy("score", "doc_id")).alias("rbot"),
        F.count("*").over(w).alias("n"),
    )
    t = ranked.alias("t")
    b = ranked.alias("b")
    pairs = t.join(
        b,
        (F.col("t.lang") == F.col("b.lang"))
        & (F.col("t.rtop") == F.col("b.rbot"))
        & (F.col("t.rtop") <= F.expr("t.n div 4")),
    ).select(
        F.col("t.lang").alias("lang"),
        F.col("t.score").alias("chosen"),
        F.col("b.score").alias("rejected"),
    )
    return (
        pairs.groupBy("lang")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("chosen") - F.col("rejected")).alias("sum_margin"),
            F.min(F.col("chosen") - F.col("rejected")).alias("min_margin"),
            F.every(F.col("chosen") >= F.col("rejected")).alias("ordered_ok"),
        )
        .orderBy("lang")
    )
