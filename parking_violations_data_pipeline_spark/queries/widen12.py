"""Round-3 widening batch 13: corpus-construction ops — the BPE
pair-count inner loop (tokenizer training's hot path), a k-anonymity
privacy audit over quasi-identifiers, and a bigram language-model
score (the conditional upgrade of the unigram perplexity proxy).

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles rounded on both sides,
total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_bpe_pair_counts",
    oracle="""
WITH d AS (
  SELECT lower(text) AS t FROM documents WHERE length(text) >= 2
),
seq AS (
  SELECT t, unnest(generate_series(1, length(t) - 1)) AS i FROM d
),
pairs AS (
  SELECT substr(t, CAST(i AS INT), 2) AS pair FROM seq
),
counted AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs WHERE regexp_matches(pair, '^[a-z]{2}$')
  GROUP BY pair
)
SELECT pair, cnt FROM counted
ORDER BY cnt DESC, pair LIMIT 20
""",
    tags=("J4", "H1", "F3"),
)
def t_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training inner loop at corpus scale: count adjacent
    symbol pairs over every document, take the most frequent — the
    pair a byte-pair-encoding tokenizer would merge next. (Real BPE
    iterates merge→recount; one exact counting pass is the unit of
    work, and each subsequent iteration is this same query over the
    re-segmented corpus.)

    Pure map-side pair generation (transform over an index sequence +
    explode — a Generate, no shuffle), then one partial+final count
    whose key space is bounded by the symbol alphabet squared, not the
    corpus: the shuffle carries at most |Σ|² rows per partition no
    matter how many TB of text went in. Space-adjacent pairs are
    dropped (word-internal merges only, the GPT-2 style pre-tokenizer
    boundary).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 2)
        .select(F.lower(F.col("text")).alias("t"))
    )
    pairs = d.select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.filter(F.col("pair").rlike("^[a-z]{2}$"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(20)
    )


@register(
    "t_k_anonymity",
    oracle="""
WITH qid AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer
),
groups AS (
  SELECT seg, nat, bal_band, CAST(count(*) AS BIGINT) AS k
  FROM qid GROUP BY seg, nat, bal_band
)
SELECT
  CAST(count(*) AS BIGINT)                                    AS n_groups,
  CAST(sum(k) AS BIGINT)                                      AS n_rows,
  CAST(min(k) AS BIGINT)                                      AS min_k,
  CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)      AS groups_lt_5,
  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)      AS rows_suppressed,
  round(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1.0 / sum(k), 4)
                                                              AS suppression_rate
FROM groups
""",
    tags=("D1", "H4", "B6"),
)
def t_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before publishing a dataset: group by the
    quasi-identifier tuple (segment, nation, account-balance band) and
    measure how many equivalence classes fall below k=5 — the rows an
    anonymizing release would have to suppress or generalize. The
    balance band (floor/1000) is the generalization step applied to
    the continuous QID.

    One shuffle to QID grain, one scalar rollup. At 100 TB the QID
    grain IS the compression: the audit output is bounded by the
    number of equivalence classes, and the suppression decision ships
    back as a broadcast join against the tiny below-k class list.
    """
    c = load_table(spark, sf_dir, "customer")
    qid = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    groups = qid.groupBy("seg", "nat", "bal_band").agg(F.count("*").alias("k"))
    small = F.col("k") < 5
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.sum("k").alias("n_rows"),
        F.min("k").alias("min_k"),
        F.sum(F.when(small, 1).otherwise(0)).alias("groups_lt_5"),
        F.sum(F.when(small, F.col("k")).otherwise(0)).alias("rows_suppressed"),
        F.round(
            F.sum(F.when(small, F.col("k")).otherwise(0)) * 1.0 / F.sum("k"), 4
        ).alias("suppression_rate"),
    )


@register(
    "j_bigram_logprob",
    oracle="""
WITH tok AS (
  -- one token stream per doc_id (id is identity): duplicate-id rows
  -- collapse to the min-text survivor BEFORE adjacency, else the two
  -- texts' positions interleave into phantom bigrams
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM (
    SELECT doc_id, list_filter(string_split(min(text), ' '), x -> x <> '') AS toks
    FROM documents WHERE text IS NOT NULL GROUP BY doc_id
  )
),
bg AS (
  SELECT a.doc_id, a.w AS prev, b.w AS w
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bg_counts AS (
  SELECT prev, w, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY prev, w
),
ctx AS (
  SELECT prev, CAST(sum(cnt) AS BIGINT) AS tot FROM bg_counts GROUP BY prev
),
vocab AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok
)
SELECT g.doc_id,
  CAST(count(*) AS BIGINT) AS n_bigrams,
  round(avg(ln((c.cnt + 1.0) / (x.tot + vocab.v))), 4) AS avg_logprob
FROM bg g
JOIN bg_counts c ON g.prev = c.prev AND g.w = c.w
JOIN ctx x ON g.prev = x.prev, vocab
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
    tags=("J2", "J3", "C3"),
)
def j_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram language-model score per document — mean
    ln P(wᵢ | wᵢ₋₁) with Laplace smoothing — the conditional upgrade
    of j_unigram_logprob and a much sharper fluency/quality proxy (a
    document of real words in scrambled order scores well on unigrams
    but badly here).

    Bigram and context tables are bounded by vocabulary², broadcast
    back onto the bigram stream; the per-doc average is one doc_id
    shuffle. Spark builds adjacency with posexplode + a lag window
    (one doc_id shuffle), the oracle with a pos+1 self-join — same
    pairs by construction. ln of exact-integer ratios + 4-decimal
    rounding absorbs ulp drift (the j_unigram_logprob convention).
    """
    from pyspark.sql import Window as W

    d = (
        load_table(spark, sf_dir, "documents")
        # doc_id is identity: collapse duplicate-id rows to the
        # min-text survivor BEFORE adjacency — the lag window below
        # partitions by doc_id and would interleave two texts' tokens
        .filter(F.col("text").isNotNull())
        .groupBy("doc_id")
        .agg(F.min("text").alias("text"))
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    tok = d.select("doc_id", F.posexplode(toks).alias("pos", "w"))
    wlag = W.partitionBy("doc_id").orderBy("pos")
    bg = (
        tok.select(
            "doc_id", F.lag("w").over(wlag).alias("prev"), "w"
        )
        .filter(F.col("prev").isNotNull())
    )
    bg_counts = bg.groupBy("prev", "w").agg(F.count("*").alias("cnt"))
    ctx = bg_counts.groupBy("prev").agg(F.sum("cnt").alias("tot"))
    vocab = tok.agg(F.countDistinct("w").alias("v"))
    return (
        bg.join(maybe_broadcast(bg_counts, sf_dir, "documents"), ["prev", "w"])
        .join(maybe_broadcast(ctx, sf_dir, "documents"), "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("cnt") + 1.0) / (F.col("tot") + F.col("v")))), 4
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )
