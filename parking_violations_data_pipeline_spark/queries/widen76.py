"""Round-4 widening batch 76: the iterative BPE merge loop (tokenizer
training, not just one pair count), a Simpson's-paradox detector via
cross-multiplied integer rate signs, and the dataset-card rollup a
corpus release ships with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register

_BPE_ROUNDS = 3


def _bpe_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-padded symbol strings, one per corpus word: 'hello' →
    ' h e l l o '. The padding makes every symbol boundary a space so
    a merge of pair (x, y) is the plain substring swap
    ' x y ' → ' xy ' — no regex lookaround (which RE2/DuckDB lacks)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
    ).filter((F.length("w") >= 2) & (F.length("w") <= 12))
    return words.select(
        F.concat(F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("s")
    )


@register(
    "t_bpe_merge_rounds",
    oracle=f"""
WITH w0 AS (
  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s
  FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE len(w) BETWEEN 2 AND 12
),
p1 AS (
  SELECT pair, count(*) AS c FROM (
    SELECT unnest([array_extract(a, i) || ' ' || array_extract(a, i + 1)
                   FOR i IN range(1, len(a))]) AS pair
    FROM (SELECT string_split(trim(s), ' ') AS a FROM w0)
  ) GROUP BY pair
),
m1 AS (SELECT pair FROM p1 ORDER BY c DESC, pair LIMIT 1),
w1 AS (SELECT replace(s, ' ' || (SELECT pair FROM m1) || ' ',
                      ' ' || replace((SELECT pair FROM m1), ' ', '') || ' ') AS s
       FROM w0),
p2 AS (
  SELECT pair, count(*) AS c FROM (
    SELECT unnest([array_extract(a, i) || ' ' || array_extract(a, i + 1)
                   FOR i IN range(1, len(a))]) AS pair
    FROM (SELECT string_split(trim(s), ' ') AS a FROM w1)
  ) GROUP BY pair
),
m2 AS (SELECT pair FROM p2 ORDER BY c DESC, pair LIMIT 1),
w2 AS (SELECT replace(s, ' ' || (SELECT pair FROM m2) || ' ',
                      ' ' || replace((SELECT pair FROM m2), ' ', '') || ' ') AS s
       FROM w1),
p3 AS (
  SELECT pair, count(*) AS c FROM (
    SELECT unnest([array_extract(a, i) || ' ' || array_extract(a, i + 1)
                   FOR i IN range(1, len(a))]) AS pair
    FROM (SELECT string_split(trim(s), ' ') AS a FROM w2)
  ) GROUP BY pair
),
m3 AS (SELECT pair FROM p3 ORDER BY c DESC, pair LIMIT 1),
w3 AS (SELECT replace(s, ' ' || (SELECT pair FROM m3) || ' ',
                      ' ' || replace((SELECT pair FROM m3), ' ', '') || ' ') AS s
       FROM w2)
SELECT
  replace((SELECT pair FROM m1), ' ', '') AS merge1,
  replace((SELECT pair FROM m2), ' ', '') AS merge2,
  replace((SELECT pair FROM m3), ' ', '') AS merge3,
  CAST((SELECT sum(len(string_split(trim(s), ' '))) FROM w3) AS BIGINT)
    AS n_tokens_final,
  CAST((SELECT count(DISTINCT sym) FROM
        (SELECT unnest(string_split(trim(s), ' ')) AS sym FROM w3)) AS BIGINT)
    AS n_symbols_final
""",
    tags=("J1", "J4"),
)
def t_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual BPE training loop, not just its unit of work: three
    merge→recount rounds over the corpus. Each round counts adjacent
    symbol pairs (explode over the symbol array — the shuffle key
    space is bounded by the growing vocab², not corpus size), picks
    the most frequent pair (ties broken lexicographically — the
    determinism contract), and applies the merge as a plain substring
    replace on space-padded symbol strings (left-to-right
    non-overlapping in both engines; no regex lookaround, which the
    oracle's RE2 engine doesn't support). Only the single argmax pair
    is collected per round — driver traffic is O(rounds), corpus stays
    distributed. Emits the learned merges + final token/vocab counts."""
    from parking_violations_data_pipeline_spark.operators.graph import (
        _release_local_checkpoint,
    )

    w = _bpe_words(spark, sf_dir)
    merges: list[str] = []
    for _ in range(_BPE_ROUNDS):
        pairs = (
            w.select(F.split(F.trim(F.col("s")), " ").alias("a"))
            .select(
                F.explode(
                    # guard size(a) < 2: sequence(1, 0) is Spark's
                    # DESCENDING [1, 0], which indexes out of bounds —
                    # a word fully merged into ONE symbol has no pairs
                    F.expr(
                        "CASE WHEN size(a) >= 2 THEN"
                        " transform(sequence(1, size(a) - 1),"
                        " i -> concat(a[i - 1], ' ', a[i]))"
                        " ELSE array() END"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count("*").alias("c"))
        )
        best_rows = pairs.orderBy(F.desc("c"), "pair").limit(1).collect()
        if not best_rows:
            # corpus produced no adjacent pairs (empty/degenerate
            # input): remaining merges are NULL, like the oracle's
            # empty scalar subqueries
            break
        best = best_rows[0]["pair"]
        merges.append(best)
        prev = w
        w = w.select(
            F.expr(
                "replace(s, ' {0} ', ' {1} ')".format(best, best.replace(" ", ""))
            ).alias("s")
        )
        # materialize each round's corpus once (the next round's pair
        # count and the replace chain otherwise recompute all prior
        # rounds for every action), then RELEASE the superseded
        # round's checkpoint — eager=False left every round's blocks
        # pinned for the session lifetime (the connected_components
        # leak class; no-op on round 1, where prev is not a checkpoint)
        w = w.localCheckpoint(eager=True)
        _release_local_checkpoint(prev)
    def _merge_lit(i: int):
        return (
            F.lit(merges[i].replace(" ", ""))
            if i < len(merges)
            else F.lit(None).cast("string")
        )

    syms = w.select(F.explode(F.split(F.trim(F.col("s")), " ")).alias("sym"))
    return syms.agg(
        _merge_lit(0).alias("merge1"),
        _merge_lit(1).alias("merge2"),
        _merge_lit(2).alias("merge3"),
        # NULL (not 0) on an empty corpus, matching the oracle's
        # sum-of-lengths scalar subquery
        F.when(F.count("*") > 0, F.count("*")).alias("n_tokens_final"),
        F.countDistinct("sym").alias("n_symbols_final"),
    )


@register(
    "d_simpson_paradox",
    oracle="""
WITH r AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
    count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS cnt_a,
    coalesce(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             FILTER (WHERE c_mktsegment = 'BUILDING'), 0) AS cents_a,
    count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS cnt_b,
    coalesce(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             FILTER (WHERE c_mktsegment = 'MACHINERY'), 0) AS cents_b
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY y
)
SELECT
  CAST(sign(sum(cents_a) * sum(cnt_b) - sum(cents_b) * sum(cnt_a)) AS BIGINT)
    AS overall_sign,
  CAST(count(*) AS BIGINT) AS n_years,
  CAST(count(*) FILTER (WHERE sign(cents_a * cnt_b - cents_b * cnt_a) =
       (SELECT sign(sum(cents_a) * sum(cnt_b) - sum(cents_b) * sum(cnt_a)) FROM r))
       AS BIGINT) AS n_years_agree,
  CAST(count(*) FILTER (WHERE sign(cents_a * cnt_b - cents_b * cnt_a) =
       -(SELECT sign(sum(cents_a) * sum(cnt_b) - sum(cents_b) * sum(cnt_a)) FROM r))
       AS BIGINT) AS n_years_reversed
FROM r
""",
    tags=("D1", "B6"),
)
def d_simpson_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-reversal (Simpson's paradox) detector: do BUILDING
    customers place larger orders than MACHINERY customers overall,
    and does that comparison hold within every order year? The
    avg-vs-avg comparison is evaluated as the cross-multiplied integer
    sign of cents_a·cnt_b − cents_b·cnt_a — no division, no doubles,
    so the verdict is bit-exact cross-engine. One broadcast join +
    one aggregation produce the yearly strata; the overall comparison
    reuses their sums (a second pass over the tiny per-year frame,
    not the fact table)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    j = o.join(
        maybe_broadcast(c.select("c_custkey", "c_mktsegment"), sf_dir, "customer"),
        o["o_custkey"] == c["c_custkey"],
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    is_a = F.col("c_mktsegment") == "BUILDING"
    is_b = F.col("c_mktsegment") == "MACHINERY"
    r = j.groupBy(F.year("o_orderdate").cast("long").alias("y")).agg(
        F.count(F.when(is_a, 1)).alias("cnt_a"),
        F.coalesce(F.sum(F.when(is_a, cents)), F.lit(0)).alias("cents_a"),
        F.count(F.when(is_b, 1)).alias("cnt_b"),
        F.coalesce(F.sum(F.when(is_b, cents)), F.lit(0)).alias("cents_b"),
    )
    tot = r.agg(
        F.signum(
            (F.sum("cents_a") * F.sum("cnt_b") - F.sum("cents_b") * F.sum("cnt_a"))
            .cast("double")
        )
        .cast("long")
        .alias("overall_sign")
    )
    yearly = r.select(
        F.signum(
            (F.col("cents_a") * F.col("cnt_b") - F.col("cents_b") * F.col("cnt_a"))
            .cast("double")
        )
        .cast("long")
        .alias("ysign")
    )
    return (
        yearly.crossJoin(F.broadcast(tot))
        .agg(
            F.max("overall_sign").alias("overall_sign"),
            F.count("*").alias("n_years"),
            F.count(F.when(F.col("ysign") == F.col("overall_sign"), 1)).alias(
                "n_years_agree"
            ),
            F.count(F.when(F.col("ysign") == -F.col("overall_sign"), 1)).alias(
                "n_years_reversed"
            ),
        )
    )


@register(
    "t_dataset_card",
    oracle="""
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(count(DISTINCT md5(text)) * 1000000 // count(*) AS BIGINT)
    AS unique_ppm,
  CAST(sum(n_chars) * 1000 // count(*) AS BIGINT) AS mean_chars_milli
FROM documents GROUP BY source ORDER BY source
""",
    tags=("J2", "D2"),
)
def t_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset card a corpus release ships with: doc
    and char volume, language breadth, exact-uniqueness rate (distinct
    md5 over text — the dedup headline number) and mean length, the
    ratios as integer ppm/milli so the card is bit-identical
    cross-engine. One hash-aggregate; the two count-distincts expand
    rather than re-scan."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.expr("count(DISTINCT md5(text)) * 1000000 div count(*)").alias(
                "unique_ppm"
            ),
            F.expr("sum(n_chars) * 1000 div count(*)").alias("mean_chars_milli"),
        )
        .orderBy("source")
    )
