"""Round-3 widening batch 54: marketing attribution (last-touch and
first-touch revenue credit in one pass) and RAG context packing
(density-greedy selection under a token budget, fully relational).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_attribution_touch",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
purchases AS (SELECT user_id, us, event_id, cents FROM e WHERE event_type = 'purchase'),
touches AS (SELECT user_id, event_type, us, event_id FROM e WHERE event_type IN ('click', 'view')),
last_touch AS (
  SELECT user_id, pid, cents, channel FROM (
    SELECT p.user_id, p.event_id AS pid, p.cents, t.event_type AS channel,
      row_number() OVER (PARTITION BY p.user_id, p.event_id
                         ORDER BY t.us DESC, t.event_id DESC) AS rn
    FROM purchases p JOIN touches t
      ON p.user_id = t.user_id AND t.us <= p.us
  ) WHERE rn = 1
),
first_touch AS (
  SELECT user_id, event_type AS channel FROM (
    SELECT user_id, event_type,
      row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
    FROM touches
  ) WHERE rn = 1
)
SELECT lt.channel,
  CAST(count(*) AS BIGINT) AS n_purchases,
  CAST(sum(lt.cents) AS BIGINT) AS last_touch_cents,
  CAST(sum(CASE WHEN ft.channel = lt.channel THEN lt.cents ELSE 0 END) AS BIGINT)
    AS also_first_touch_cents
FROM last_touch lt JOIN first_touch ft ON lt.user_id = ft.user_id
GROUP BY lt.channel ORDER BY lt.channel
""",
    tags=("C8", "E2", "D1"),
)
def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every purchase credits its LAST
    preceding touch (click/view) — the backward as-of shape — and
    the report also shows how much of that credit coincides with the
    user's FIRST touch (the first-vs-last-touch divergence is the
    whole attribution-model debate in one number). The last-touch
    pick is a per-purchase argmax over prior touches on one user_id
    shuffle; purchases from users with no prior touch drop on both
    engines (unattributable).

    Scale note: the purchase×touch join is bounded per user; at
    100 TB the asof_join operator (union + carry window, one shuffle,
    no per-key blow-up) replaces the pair join — registered here in
    the relational formulation because the oracle mirrors it
    directly.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        epoch_us("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("pus"), F.col("event_id").alias("pid"), "cents"
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.col("us").alias("tus"),
        F.col("event_id").alias("tid"),
    )
    pairs = purchases.join(
        touches,
        (purchases.user_id == touches.t_user) & (touches.tus <= purchases.pus),
    )
    w = Window.partitionBy("user_id", "pid").orderBy(F.desc("tus"), F.desc("tid"))
    last_touch = (
        pairs.select("user_id", "pid", "cents", "channel", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
    )
    w_first = Window.partitionBy("t_user").orderBy("tus", "tid")
    first_touch = (
        touches.select("t_user", "channel", F.row_number().over(w_first).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(F.col("t_user").alias("f_user"), F.col("channel").alias("f_channel"))
    )
    return (
        last_touch.join(first_touch, last_touch.user_id == F.col("f_user"))
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").alias("last_touch_cents"),
            F.sum(
                F.when(F.col("f_channel") == F.col("channel"), F.col("cents")).otherwise(0)
            ).alias("also_first_touch_cents"),
        )
        .orderBy("channel")
    )


@register(
    "q_rag_context_pack",
    oracle="""
WITH scored AS (
  SELECT doc_id, len(string_split(text, ' ')) AS toks,
    (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) AS rel
  FROM documents WHERE length(text) > 0
),
ranked AS (
  SELECT doc_id, toks, rel,
    rel * 1000 // toks AS density_milli,
    row_number() OVER (ORDER BY rel * 1000 // toks DESC, doc_id) AS rn
  FROM scored WHERE toks > 0
),
packed AS (
  SELECT doc_id, toks, rel, density_milli,
    sum(toks) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
  FROM ranked
)
SELECT
  CAST(count(*) AS BIGINT) AS n_docs_packed,
  CAST(sum(toks) AS BIGINT) AS tokens_used,
  CAST(sum(rel) AS BIGINT) AS total_relevance,
  CAST(min(density_milli) AS BIGINT) AS worst_density_milli
FROM packed WHERE cum_toks <= 1000
""",
    tags=("J13", "F3", "E3"),
)
def q_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly under a token budget: candidate documents
    (relevance stands in as a deterministic md5-derived score — the
    retrieval score arrives from upstream in production) pack
    greedily by relevance-per-token DENSITY until the 1000-token
    budget closes — the fractional-knapsack heuristic every context
    builder runs between retrieval and the prompt. Fully relational:
    one density sort + one running token sum + a prefix filter — no
    driver loop; density on an integer milli grid with doc_id
    tie-break.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    h = F.md5(F.col("doc_id").cast("string"))
    scored = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)))
        .cast("long")
        .alias("rel"),
    ).filter(F.col("toks") > 0)
    ranked = scored.select(
        "doc_id",
        "toks",
        "rel",
        F.expr("rel * 1000 div toks").alias("density_milli"),
        F.row_number()
        .over(Window.orderBy(F.expr("rel * 1000 div toks").desc(), "doc_id"))
        .alias("rn"),
    )
    packed = ranked.select(
        "toks",
        "rel",
        "density_milli",
        F.sum("toks")
        .over(Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_toks"),
    )
    return packed.filter(F.col("cum_toks") <= 1000).agg(
        F.count("*").alias("n_docs_packed"),
        F.sum("toks").alias("tokens_used"),
        F.sum("rel").alias("total_relevance"),
        F.min("density_milli").alias("worst_density_milli"),
    )
