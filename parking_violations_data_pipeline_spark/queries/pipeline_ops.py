"""Training-data pipeline composites (SURVEY.md §2 J-family, widened).

The ops a 100-TB pretraining-data pipeline runs between raw crawl and
tokenizer that round-1's J1-J11 didn't yet cover as first-class
queries:

  t_pii_redact          regex PII scrub (emails/phones), count + hash
  t_sequence_pack       concat-and-chunk packing plan (GPT-style bins)
  t_contamination       benchmark n-gram overlap (decontamination)
  t_repetition_signals  Gopher-style repetition quality counters
  t_source_mix          domain-mixture reweighting to a uniform target
  t_filter_pipeline     chained quality-filter funnel per source

The fixtures' documents are synthetic word-soup with no natural PII,
so t_pii_redact plants deterministic PII derived from doc_id on BOTH
sides before scrubbing — the op under test is the redaction plan, not
the fixture. All outputs are exact integers or identical-integer
divisions so the driver's value-hash cannot flap.

Scale notes (100 TB): every query here is one scan plus at most one
shuffle on an 8-byte key; the contamination join broadcasts the
benchmark shingle set (benchmark suites are ~MBs, corpora are TBs);
packing uses a single window cum-sum partitioned only for the ordinal
scan then aggregates by bin — at real scale the same plan runs per
shard (sort within shard) with shard offsets composed additively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.operators import dedup as D
from parking_violations_data_pipeline_spark.operators.graph import dedup_clusters
from parking_violations_data_pipeline_spark.registry import register

# Java and RE2 dialects agree on these (no backrefs, no lookaround,
# explicit classes instead of \b so both engines tokenize identically).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"

_PLANT_SQL = """
SELECT doc_id,
       text || ' contact user' || doc_id || '@example.com or +1-555-' ||
       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
FROM documents
"""


@register(
    "t_pii_redact",
    oracle=f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
  sha256(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_sha
FROM ({_PLANT_SQL})
ORDER BY doc_id
""",
    tags=("J12", "J2", "H1", "H4"),
)
def t_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: plant a deterministic email+phone per doc, then count
    and redact both patterns; prove the scrub by sha256 of the
    redacted text (Spark sha2(·,256) == DuckDB sha256 hex). One
    narrow projection, no shuffle — at 100 TB this is a pure map
    stage over the text column only."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.sha2(redacted, 256).alias("redacted_sha"),
    ).orderBy("doc_id")


@register(
    "t_sequence_pack",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tok
  FROM documents
), pos AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS start
  FROM toks
)
SELECT CAST(coalesce(start, 0) // 512 AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       CAST(sum(CASE WHEN coalesce(start,0) + n_tok > (coalesce(start,0) // 512 + 1) * 512
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_crossers
FROM pos
GROUP BY 1 ORDER BY 1
""",
    tags=("J13", "J2", "E3", "D1"),
)
def t_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing plan (GPT-pretraining style):
    documents are laid head-to-tail in doc_id order and cut every 512
    tokens; each doc is attributed to the bin its first token lands
    in. Emits per-bin doc counts, token mass and boundary-crossers —
    the packing manifest a tokenizer shard would consume. The global
    ordered cum-sum is the documented small-SF form; at 100 TB the
    identical plan runs per shard and shard base-offsets compose
    additively (noted, not needed at test scale)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        # filter empty tokens like the oracle's list_filter: split('')
        # yields [''] (1 token) where the real token count is 0
        F.size(
            F.filter(F.split(F.trim("text"), "\\s+"), lambda x: x != "")
        ).alias("n_tok"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    pos = toks.withColumn("start", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    cap = 512
    return (
        pos.withColumn("bin_id", F.floor(F.col("start") / cap))
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum(
                F.when(
                    F.col("start") + F.col("n_tok")
                    > (F.floor(F.col("start") / cap) + 1) * cap,
                    1,
                )
                .otherwise(0)
                .cast("long")
            ).alias("n_boundary_crossers"),
        )
        .orderBy("bin_id")
    )


_BENCH_FILTER = "doc_id % 50 = 0"
# Real decontamination uses 8-13-grams; on the synthetic small-vocab
# fixtures 4-grams give the overlap statistics 8-grams would have on a
# natural corpus (a handful of hits instead of an empty/1-row result),
# which makes the driver's value-hash a real check.
_NGRAM = 4


@register(
    "t_contamination",
    oracle=f"""
WITH words AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(w) - {_NGRAM - 2}),
           i -> array_to_string(w[i:i+{_NGRAM - 1}], ' ')))) AS g
  FROM words WHERE len(w) >= {_NGRAM}
), bench AS (
  SELECT DISTINCT g FROM grams WHERE {_BENCH_FILTER}
)
SELECT grams.doc_id,
       count(*) AS n_overlap
FROM grams JOIN bench USING (g)
WHERE NOT ({_BENCH_FILTER.replace('doc_id', 'grams.doc_id')})
GROUP BY grams.doc_id
HAVING count(*) >= 1
ORDER BY grams.doc_id
""",
    tags=("J14", "J4", "C3", "J5"),
)
def t_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 50th doc plays the held-out
    benchmark; report each remaining corpus doc sharing >= 1 distinct
    word n-gram with the benchmark set, with its distinct-overlap
    count. The benchmark shingle set is broadcast (real benchmark
    suites are MBs against TB corpora), so the corpus side is one
    scan + explode with no shuffle of the corpus shingles."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.filter(F.split(F.trim("text"), "\\s+"), lambda x: x != "").alias("w"),
    ).filter(F.size("w") >= _NGRAM)
    grams = words.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _NGRAM),
                    lambda i: F.concat_ws(" ", F.slice("w", i + 1, _NGRAM)),
                )
            )
        ).alias("g"),
    )
    is_bench = F.col("doc_id") % 50 == 0
    bench = grams.filter(is_bench).select("g").distinct()
    return (
        grams.filter(~is_bench)
        .join(maybe_broadcast(bench, sf_dir, "documents"), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
        .orderBy("doc_id")
    )


@register(
    "t_dup_clusters",
    oracle="""
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
        FROM documents) WHERE len(w) >= 3
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT i.id_a, i.id_b
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) i
  JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), cc AS (
  SELECT DISTINCT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, cc.label FROM cc JOIN edges e ON e.src = cc.node
)
SELECT min_label AS cluster_id, count(*) AS n_members,
       string_agg(CAST(node AS VARCHAR), '|' ORDER BY node) AS members
FROM (SELECT node, min(label) AS min_label FROM cc GROUP BY node)
GROUP BY min_label ORDER BY cluster_id
""",
    tags=("J18", "J6", "G3", "C1"),
)
def t_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: exact 3-gram Jaccard >= 0.5 pairs (the
    fixtures carry natural near-dup bundles, incl. one transitive
    size-3 cluster) grouped into connected components by iterative
    min-label propagation (operators/graph.py); one row per cluster
    with the keep-min canonical id and '|'-joined members. At 100 TB
    the pair list comes from the MinHash/LSH path and the CC loop is
    O(diameter) shuffle-joins over (node,label) pairs only — never
    the documents."""
    d = load_table(spark, sf_dir, "documents")
    sh = D.shingle_sets(d, 3)
    pairs = D.exact_jaccard_pairs(sh).filter(F.col("jaccard") >= 0.5)
    return dedup_clusters(pairs).orderBy("cluster_id")


@register(
    "t_repetition_signals",
    oracle="""
WITH words AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM documents
), uni AS (
  SELECT doc_id, unnest(w) AS tok FROM words
), unistat AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words,
         CAST(max(cnt) AS BIGINT) AS top_word_n
  FROM (SELECT doc_id, tok, count(*) AS cnt FROM uni GROUP BY doc_id, tok)
  GROUP BY doc_id
), bi AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i+1])) AS bg
  FROM words WHERE len(w) >= 2
), bistat AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         CAST(max(cnt) AS BIGINT) AS top_bigram_n
  FROM (SELECT doc_id, bg, count(*) AS cnt FROM bi GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT u.doc_id, u.n_words, u.n_distinct_words, u.top_word_n,
       coalesce(b.n_bigrams, 0) AS n_bigrams,
       coalesce(b.top_bigram_n, 0) AS top_bigram_n
FROM unistat u LEFT JOIN bistat b ON u.doc_id = b.doc_id
ORDER BY u.doc_id
""",
    tags=("J15", "J2", "D1", "H5"),
)
def t_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition counters, word-level (the fixtures have
    no newlines, so line/paragraph duplication degenerates): per doc
    the word total, distinct-word count, most-frequent-word count and
    most-frequent-bigram count — the exact numerators/denominators of
    the 'duplicate fraction' and 'top n-gram fraction' filter rules,
    kept integer so the hash can't flap. Computed entirely with
    higher-order array functions: one scan, one shuffle on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.filter(F.split(F.trim("text"), "\\s+"), lambda x: x != "").alias("w"),
    )
    uni = words.select("doc_id", F.explode("w").alias("tok"))
    unistat = (
        uni.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_words"),
            F.count("*").alias("n_distinct_words"),
            F.max("count").alias("top_word_n"),
        )
    )
    bi = words.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.concat_ws(" ", F.slice("w", i + 1, 2)),
            )
        ).alias("bg"),
    )
    bistat = (
        bi.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("n_bigrams"), F.max("count").alias("top_bigram_n"))
    )
    return (
        unistat.join(bistat, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            "top_word_n",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
        )
        .orderBy("doc_id")
    )


@register(
    "t_source_mix",
    oracle="""
WITH src AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> ''))) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source
)
SELECT source, src_tokens,
       round(CAST(src_tokens AS DOUBLE) /
             (SELECT sum(src_tokens) FROM src), 6) AS actual_share,
       round((1.0 / (SELECT count(*) FROM src)) /
             (CAST(src_tokens AS DOUBLE) / (SELECT sum(src_tokens) FROM src)),
             6) AS mix_weight
FROM src ORDER BY source
""",
    tags=("J16", "J2", "D1", "B6"),
)
def t_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source token mass, its share of
    the corpus, and the sampling weight that flattens the mixture to a
    uniform target (target_share / actual_share — the DoReMi-style
    input). Per-source totals are a 20-group aggregate; the two
    global scalars ride a broadcast of that tiny aggregate, so the
    corpus is scanned exactly once at any scale."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.filter(F.split(F.trim("text"), "\\s+"), lambda x: x != "")))
        .alias("src_tokens")
    )
    totals = src.agg(
        F.sum("src_tokens").alias("__tot"), F.count("*").alias("__nsrc")
    )
    return (
        src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "src_tokens",
            F.round(F.col("src_tokens") / F.col("__tot"), 6).alias("actual_share"),
            F.round(
                (F.lit(1.0) / F.col("__nsrc"))
                / (F.col("src_tokens") / F.col("__tot")),
                6,
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


@register(
    "t_filter_pipeline",
    oracle="""
WITH scored AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_words,
         len(list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                       x -> x <> ''))) AS n_distinct,
         lang
  FROM documents
)
SELECT source,
       count(*) AS n_total,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pass_lang,
       CAST(sum(CASE WHEN lang = 'en' AND n_words BETWEEN 20 AND 400
                THEN 1 ELSE 0 END) AS BIGINT) AS pass_length,
       CAST(sum(CASE WHEN lang = 'en' AND n_words BETWEEN 20 AND 400
                     AND n_distinct * 100 >= n_words * 25
                THEN 1 ELSE 0 END) AS BIGINT) AS pass_repetition
FROM scored GROUP BY source ORDER BY source
""",
    tags=("J17", "J2", "B4", "D1"),
)
def t_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel: the survivor count per source after each
    successive Gopher-style gate (lang == en, 20..400 words, distinct
    ratio >= 25%). The repetition gate compares n_distinct*100 >=
    n_words*25 in integers so no float enters the predicate. One
    scan, one narrow aggregate — the funnel report a curation run
    prints before committing a filter config."""
    d = load_table(spark, sf_dir, "documents")
    w = F.filter(F.split(F.trim("text"), "\\s+"), lambda x: x != "")
    scored = d.select(
        "source",
        "lang",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    )
    lang_ok = F.col("lang") == "en"
    len_ok = lang_ok & F.col("n_words").between(20, 400)
    rep_ok = len_ok & (F.col("n_distinct") * 100 >= F.col("n_words") * 25)
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            # when/otherwise(0), matching the oracle's CASE … ELSE 0:
            # NULL lang/text rows fail the gate (0), not NULL-propagate
            F.sum(F.when(lang_ok, 1).otherwise(0).cast("long")).alias("pass_lang"),
            F.sum(F.when(len_ok, 1).otherwise(0).cast("long")).alias("pass_length"),
            F.sum(F.when(rep_ok, 1).otherwise(0).cast("long")).alias("pass_repetition"),
        )
        .orderBy("source")
    )


@register(
    "t_dup_graph_stats",
    oracle="""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
        FROM documents) WHERE len(w) >= 3
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT i.id_a, i.id_b
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) i
  JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
)
SELECT (SELECT count(*) FROM pairs) AS n_edges,
       (SELECT count(*) FROM (SELECT id_a AS x FROM pairs
                              UNION SELECT id_b FROM pairs)) AS n_nodes,
       (SELECT count(*) FROM pairs e1
        JOIN pairs e2 ON e2.id_a = e1.id_b
        JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b) AS n_triangles
""",
    tags=("J6", "C1", "D1"),
)
def t_dup_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph topology: edge/node/triangle counts over the
    Jaccard>=0.5 pair graph (triangles distinguish true duplicate
    bundles from chained borderline pairs — a diagnostic before
    trusting transitive clustering). Triangle counting is the
    canonical two-hop equi-join on ordered edges (a<b<c), never an
    all-pairs product; at 100 TB the ordered-edge join is the
    standard degree-bounded formulation."""
    d = load_table(spark, sf_dir, "documents")
    sh = D.shingle_sets(d, 3)
    pairs = (
        D.exact_jaccard_pairs(sh)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    nodes = pairs.select(F.col("id_a").alias("x")).union(
        pairs.select("id_b")
    ).distinct()
    e1 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = pairs.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    e3 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        pairs.agg(F.count("*").alias("n_edges"))
        .crossJoin(nodes.agg(F.count("*").alias("n_nodes")))
        .crossJoin(tri.agg(F.count("*").alias("n_triangles")))
    )
