"""Corpus-preparation operators beyond queries/text.py: chunking,
language-model scoring, token entropy, and value histograms.

These fill the remaining gaps a 100-TB pretraining-data pipeline needs
(driver mandate, SURVEY.md §2-J family): splitting long documents into
overlapping fixed-size chunks (the retrieval / context-window layout
step), scoring each document under the corpus unigram LM (the cheap
perplexity proxy used for quality filtering), per-document token
entropy (repetition/diversity signal alongside t_repetition_signals),
and an equi-width histogram (the profiling op behind length/score
cutoff choices).

Determinism rules: chunk identity is proven by md5 (engine-identical
for identical bytes); log-prob and entropy are sums of logs of exact
integers rounded to 4 decimals on both sides (double ulp drift across
engines is ~1e-13 per term — far inside the rounding slack); histogram
buckets are computed by integer division on exact cents, never by
flooring a double ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register

CHUNK_LEN = 100
CHUNK_STRIDE = 80


@register(
    "j_doc_chunk",
    oracle=f"""
SELECT doc_id, CAST(chunk_start AS BIGINT) // {CHUNK_STRIDE} AS chunk_idx,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       length(substr(text, CAST(chunk_start AS INT) + 1, {CHUNK_LEN})) AS chunk_len,
       md5(substr(text, CAST(chunk_start AS INT) + 1, {CHUNK_LEN})) AS chunk_md5
FROM (SELECT doc_id, text, unnest(range(0, n_chars, {CHUNK_STRIDE})) AS chunk_start
      FROM documents WHERE n_chars > 0)
ORDER BY doc_id, chunk_idx
""",
    tags=("J4", "H1", "H5"),
)
def j_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window document chunking (context-window
    layout): 100-char chunks every 80 chars, so consecutive chunks
    share a 20-char overlap.

    The chunk table is produced by one generate-and-explode projection
    — `sequence(0, n_chars-1, stride)` then `posexplode` — no shuffle
    at all until the output sort; at 100 TB this is a pure map stage
    that parallelizes with the input splits. Chunk text is proven
    equal across engines by md5, not shipped raw, keeping the compared
    rows narrow.
    """
    # n_chars > 0 guard on BOTH sides: Spark's sequence(0, -1, +step)
    # throws on an empty document while DuckDB's range(0, 0) is empty.
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    starts = F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(CHUNK_STRIDE))
    chunk = F.expr(f"substring(text, chunk_start + 1, {CHUNK_LEN})")
    return (
        d.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .withColumn("chunk_start", F.col("chunk_start").cast("long"))
        .select(
            "doc_id",
            (F.col("chunk_start") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            "chunk_start",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "j_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
vocab AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round((sum(ln(v.cnt)) - count(*) * ln((SELECT n FROM total)))
             / count(*), 4) AS avg_logprob
FROM tok t JOIN vocab v ON v.w = t.w
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
    tags=("J2", "J3", "D1"),
)
def j_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model score per document (the cheap
    perplexity proxy used as a pretraining quality filter): mean
    ln P(token) under the corpus unigram distribution.

    Two aggregations over the exploded token table: the vocabulary
    histogram (31 distinct words in the fixtures — tiny at any scale,
    it's bounded by vocabulary not corpus) broadcasts back onto the
    token stream, so the per-doc pass is one shuffle on doc_id.
    ln(cnt) terms are logs of exact integers — both engines see
    identical inputs and the 4-decimal rounding absorbs ulp drift.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        tok.join(maybe_broadcast(vocab, sf_dir, "documents"), "w")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                (F.sum(F.log("cnt")) - F.count("*") * F.log(F.first("n")))
                / F.count("*"),
                4,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "j_token_entropy",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
cnts AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 4) AS entropy
FROM cnts
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("J2", "D1"),
)
def j_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    diversity/repetition signal complementing t_repetition_signals'
    integer counters (low entropy = templated/boilerplate text).

    H = ln(n) − Σ c·ln(c)/n over per-doc token counts, computed from
    exact integer counts on both sides and rounded to 4 decimals.
    Plan: two stacked aggregations keyed on (doc_id, w) then doc_id —
    the second input is already co-partitioned by the first's shuffle,
    so Catalyst reuses the partitioning (no extra exchange).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    cnts = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    return (
        cnts.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.round(
                F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                4,
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


@register(
    "d_value_histogram",
    oracle="""
SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 500000 AS bucket,
       count(*) AS cnt,
       CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
            AS DOUBLE) AS bucket_total
FROM orders
GROUP BY bucket
ORDER BY bucket
""",
    tags=("D1", "B6", "H3"),
)
def d_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order values ($5,000 buckets) — the
    one-scan profiling op behind threshold/cutoff choices.

    Bucket assignment is integer division on exact cents
    (`cents div 500000`), never `floor(double/double)`, so rows on
    exact bucket boundaries cannot land differently across engines.
    Single shuffle of ~100 bucket rows after partial aggregation.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(cents.alias("cents"))
        .groupBy(F.expr("cents div 500000").alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("cents") / 100.0, 2).cast("double").alias("bucket_total"),
        )
        .orderBy("bucket")
    )


@register(
    "j_bm25",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
stats AS (SELECT avg(len) AS avgdl, count(*) AS n_docs FROM dl),
tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok
  WHERE w IN ('spark', 'join', 'shuffle') GROUP BY doc_id, w
),
df AS (SELECT w AS dw, count(*) AS df FROM tf GROUP BY w)
SELECT t.doc_id,
  round(sum(
    ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
    * (t.tf * 2.2)
    / (t.tf + 1.2 * (0.25 + 0.75 * l.len / s.avgdl))
  ), 6) AS bm25
FROM tf t
JOIN df d ON d.dw = t.w
JOIN dl l ON l.doc_id = t.doc_id
CROSS JOIN stats s
GROUP BY t.doc_id
ORDER BY bm25 DESC, t.doc_id LIMIT 25
""",
    tags=("J3", "D1"),
)
def j_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (k1=1.2, b=0.75) for a 3-term query — the
    full-strength lexical scorer beyond j_tfidf: IDF with the +0.5
    smoothing, term-frequency saturation, and document-length
    normalization against the corpus mean length.

    Every input to the formula is an exact integer (tf, df, doc
    lengths, N) or a ratio of exact integers (avgdl), combined in the
    same operation order on both engines and rounded at 6 decimals
    before the top-k cut. The df/avgdl statistics are query-term- and
    corpus-bounded (broadcast); the per-doc pass is one shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("len"))
    stats = dl.agg(F.avg("len").alias("avgdl"), F.count("*").alias("n_docs"))
    tf = (
        tok.filter(F.col("w").isin("spark", "join", "shuffle"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy(F.col("w").alias("dw")).agg(F.count("*").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("len") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), tf.w == df.dw)
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(25)
    )


@register(
    "d_skew_profile",
    oracle="""
WITH per_key AS (
  SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(max(n) AS BIGINT) AS max_rows,
         CAST(sum(n) AS BIGINT) AS total_rows
  FROM per_key
),
topk AS (
  SELECT l_suppkey, n,
         row_number() OVER (ORDER BY n DESC, l_suppkey) AS rn
  FROM per_key
)
SELECT t.rn AS heavy_rank, t.l_suppkey, CAST(t.n AS BIGINT) AS n_rows,
  a.n_keys, a.max_rows,
  round(a.max_rows * a.n_keys / CAST(a.total_rows AS DOUBLE), 6) AS skew_ratio
FROM topk t CROSS JOIN agg a
WHERE t.rn <= 5 ORDER BY heavy_rank
""",
    tags=("D1", "C10", "F3"),
)
def d_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the planning input for C10 decisions
    (salt? AQE skew split? broadcast instead?): the 5 heaviest
    supplier keys plus the global skew ratio max/mean rows-per-key.

    One partial+final count per key (the same shuffle the join itself
    would do), then key-count-scale statistics. All counts exact; the
    ratio is one double divide rounded identically. At 100 TB this
    profile is how a pipeline DECIDES to engage salted_join — the
    operator it pairs with (operators/skew.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count("*").alias("n"))
    agg = per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_rows"),
        F.sum("n").cast("long").alias("total_rows"),
    )
    topk = per_key.withColumn(
        "heavy_rank", F.row_number().over(Window.orderBy(F.desc("n"), "l_suppkey"))
    ).filter(F.col("heavy_rank") <= 5)
    return (
        topk.join(F.broadcast(agg))
        .select(
            "heavy_rank",
            "l_suppkey",
            F.col("n").cast("long").alias("n_rows"),
            "n_keys",
            "max_rows",
            F.round(
                F.col("max_rows") * F.col("n_keys") / F.col("total_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy("heavy_rank")
    )
