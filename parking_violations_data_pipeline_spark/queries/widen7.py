"""Round-3 widening batch 8: embedding centroid drift, chi-square
independence testing, string-formatting function parity, and per-doc
n-gram novelty scoring.

Completes two families: the drift suite gains its embedding-space and
categorical members (KS/PSI/Mann-Whitney cover numeric marginals;
centroid drift catches representation shift, chi-square catches
dependence between a category and a cohort), and the dedup suite gains
the novelty curve (how much of each NEW document is already covered by
the corpus before it — the online view of duplication).

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles rounded on both sides,
total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "j_centroid_drift",
    oracle="""
WITH halves AS (
  SELECT label, vec_id % 2 AS half, embedding FROM embeddings
),
dims AS (
  SELECT label, half,
         unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS dim
  FROM halves
),
cent AS (
  SELECT label, half, dim, avg(CAST(x AS DOUBLE)) AS c
  FROM dims GROUP BY label, half, dim
),
paired AS (
  SELECT a.label, a.dim, a.c AS ca, b.c AS cb
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
),
dots AS (
  SELECT label,
         sum(ca * cb) AS dot,
         sqrt(sum(ca * ca)) AS na,
         sqrt(sum(cb * cb)) AS nb
  FROM paired GROUP BY label
),
counts AS (
  SELECT label,
    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM halves GROUP BY label
)
SELECT d.label, c.n_a, c.n_b,
       round(d.dot / (d.na * d.nb), 6) AS centroid_cos
FROM dots d JOIN counts c ON c.label = d.label
ORDER BY d.label
""",
    tags=("J7", "J10", "D1"),
)
def j_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift per label: split each label's vectors into two
    deterministic halves (vec_id parity — in production, two snapshot
    dates), average each half into a centroid, and report the cosine
    between the two centroids. A healthy stable representation sits
    near 1.0; a drop flags upstream encoder or population drift that
    numeric-marginal tests (KS/PSI) cannot see.

    The explode-to-(label, half, dim) grain keeps everything JVM-side:
    centroids are one groupBy over label×2×64 cells, the cosine is a
    64-row-per-label reduction — no vectors ever reach the driver and
    no pairwise distances are computed. Float elements are cast to
    DOUBLE before averaging on both engines; per-dim means divide by
    each half's count exactly once, so the only cross-engine noise is
    ulp-level and absorbed by round(…, 6).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    halves = emb.select(
        "label", (F.col("vec_id") % 2).alias("half"), "embedding"
    )
    dims = halves.select(
        "label",
        "half",
        F.posexplode(F.col("embedding")).alias("dim0", "x"),
    ).select(
        "label", "half", (F.col("dim0") + 1).alias("dim"), F.col("x").cast("double").alias("x")
    )
    cent = dims.groupBy("label", "half", "dim").agg(F.avg("x").alias("c"))
    a = cent.filter(F.col("half") == 0).select("label", "dim", F.col("c").alias("ca"))
    b = cent.filter(F.col("half") == 1).select("label", "dim", F.col("c").alias("cb"))
    dots = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sqrt(F.sum(F.col("ca") * F.col("ca"))).alias("na"),
            F.sqrt(F.sum(F.col("cb") * F.col("cb"))).alias("nb"),
        )
    )
    counts = halves.groupBy("label").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_b"),
    )
    return (
        dots.join(counts, "label")
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "centroid_cos"
            ),
        )
        .orderBy("label")
    )


@register(
    "d_chi2_independence",
    oracle="""
WITH obs AS (
  SELECT event_type, CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS cohort,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT event_type, cohort, o,
    sum(o) OVER (PARTITION BY event_type) AS row_tot,
    sum(o) OVER (PARTITION BY cohort)     AS col_tot,
    sum(o) OVER ()                        AS n
  FROM obs
)
SELECT event_type, cohort, o,
  round(row_tot * col_tot * 1.0 / n, 4)  AS expected,
  round(pow(o - row_tot * col_tot * 1.0 / n, 2) / (row_tot * col_tot * 1.0 / n),
        6) AS chi2_term
FROM margins ORDER BY event_type, cohort
""",
    tags=("D1", "D4"),
)
def d_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event_type and month
    half — the categorical drift alarm: has the MIX of event types
    changed between cohorts, not just their volumes. Completes the
    drift suite (KS/Mann-Whitney: numeric; PSI: binned numeric;
    centroid: embeddings; this: categorical×cohort contingency).

    The contingency table is one groupBy at (type, cohort) grain; row,
    column, and grand totals are windows over that tiny table, never a
    second pass over events. Expected counts and chi² terms are exact
    integer ratios until the final division. Per-cell terms (not just
    the statistic) localize WHICH type drove the dependence.
    """
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("cohort"),
    ).agg(F.count("*").alias("o"))
    margins = obs.select(
        "event_type",
        "cohort",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(W.partitionBy("cohort")).alias("col_tot"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return margins.select(
        "event_type",
        "cohort",
        "o",
        F.round(expected, 4).alias("expected"),
        F.round(F.pow(F.col("o") - expected, 2) / expected, 6).alias("chi2_term"),
    ).orderBy("event_type", "cohort")


@register(
    "h_format_funcs",
    oracle="""
SELECT n_name,
  lpad(n_name, 20, '.')                       AS padded,
  rpad(substring(n_name, 1, 5), 8, '-')       AS clipped,
  translate(n_name, 'AEIOU', 'aeiou')         AS lowered_vowels,
  reverse(n_name)                             AS rev,
  repeat(substring(n_name, 1, 2), 3)          AS rep,
  CAST(length(replace(n_name, ' ', '')) AS BIGINT) AS n_nonspace
FROM nation ORDER BY n_name
""",
    tags=("H1",),
)
def h_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting family parity: lpad/rpad (fixed-width report
    columns), translate (character-map cleansing), reverse, repeat,
    and whitespace-stripped length — the remaining H1 surface beyond
    h_string_funcs' case/trim/split coverage.

    All JVM intrinsics inside whole-stage codegen; the entry exists to
    pin cross-engine semantics corners: lpad TRUNCATES when the input
    exceeds the target width, translate with equal-length maps is a
    bijection, repeat(s, 3) concatenates exactly 3 copies.
    """
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.lpad("n_name", 20, ".").alias("padded"),
        F.rpad(F.substring("n_name", 1, 5), 8, "-").alias("clipped"),
        F.translate("n_name", "AEIOU", "aeiou").alias("lowered_vowels"),
        F.reverse("n_name").alias("rev"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("rep"),
        F.length(F.replace(F.col("n_name"), F.lit(" "), F.lit(""))).alias(
            "n_nonspace"
        ),
    ).orderBy("n_name")


@register(
    "t_ngram_novelty",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM toks, (SELECT unnest(generate_series(1, 400)) AS i)
  WHERE i + 2 <= len(ws)
),
first_seen AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT t.doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  round(avg(CASE WHEN f.first_doc = t.doc_id THEN 1.0 ELSE 0.0 END), 6)
    AS novelty
FROM grams t JOIN first_seen f ON f.g = t.g
GROUP BY t.doc_id ORDER BY t.doc_id
""",
    tags=("J4", "J6", "D1"),
)
def t_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of each document's
    distinct 3-grams NOT present in any earlier document (doc_id order
    — in production, crawl order). The online view of duplication:
    t_dup_ngram_fraction asks "how much of the corpus is duplicated",
    this asks "by the time doc D arrived, how much of it was new" —
    the curve data pipelines watch to decide when a source is mined
    out.

    One distinct-(doc, gram) explode, one min(doc_id) posting
    aggregate, one join-back — the same shuffle shape as the dedup
    family, nothing pairwise. A gram's first_doc equals the doc iff
    the doc introduced it; avg over the doc's distinct grams is the
    novelty share. The explicit index spine in the oracle (1..400)
    mirrors Spark's transform over sequence() and caps both engines at
    the same max token count, so gram sets match exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    # zip of shifted slices, NOT transform-over-index with
    # element_at(ws, i): the lambda-captured split re-evaluates per
    # element (see operators/text.py::word_shingles); the 400-token
    # cap rides on the slice length
    m = F.least(F.size(ws) - 2, F.lit(400))
    grams = (
        docs.where(F.size(ws) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.arrays_zip(
                        F.slice(ws, 1, m), F.slice(ws, 2, m), F.slice(ws, 3, m)
                    ),
                    lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]),
                )
            ).alias("g"),
        )
        .distinct()
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(
                F.avg(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1.0).otherwise(0.0)
                ),
                6,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )
