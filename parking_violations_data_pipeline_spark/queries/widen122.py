"""Round-8 widening batch 122: winnowing document fingerprints
(Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm).

Winnowing selects, from every window of `WIN` consecutive k-gram
hashes, the window's minimal hash. The distinct selected hashes are
the document's fingerprint set, with a guarantee MinHash lacks: any
shared token run of length >= WIN + K - 1 between two documents
produces at least one shared fingerprint — detection is LOCAL, not
probabilistic. (The paper also tracks selection POSITIONS to report
match offsets; both entries here consume only the fingerprint SET,
and the distinct-value set is exactly {min of each window} no matter
which tie position is selected, so the positional machinery is
dropped.) Winnowing is the standard tool for benchmark
decontamination and plagiarism-style near-dup detection.

Spark-first shape — and a plan-shape landmine this module had to
dodge: the whole pipeline is higher-order array functions, but a
lambda that INDEXES an aliased array column (element_at(hs, j+t))
gets the alias inlined per element by CollapseProject, re-hashing
the entire document per window — the O(n²) class round 7 measured at
18+ minutes for one 44k-word doc (operators/text.py:word_shingles).
So k-grams come from the shared word_shingles operator (zipped
shifted slices) and the window minima use the same trick: arrays_zip
of WIN shifted slices of the hash array, then least() inside the
lambda over the zip's OWN element. One map-only pass; no explode
until the fingerprints leave the document; fingerprints are
~2/(WIN+1) of the k-grams. The md5-prefix integer bridge is the same
cross-engine hash used by t_consistent_sample / t_fim_split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.operators.text import word_shingles
from parking_violations_data_pipeline_spark.registry import register

K = 4  # tokens per k-gram
WIN = 4  # winnowing window (guarantee threshold = WIN + K - 1 = 7 tokens)

# Shared pipeline, DuckDB spelling. Lists are 1-indexed; list_slice is
# (begin, end) inclusive where Spark's slice is (start, length).
# DuckDB has the same quadratic hazard as Spark, in its own flavor: a
# lambda that references the OUTER list (list_slice(ws, i+1, i+K)
# inside list_transform(range(...))) duplicates that list per element
# — measured minutes on the extremes fixture's 30k-token doc. Both
# engines therefore use the identical zip-of-shifted-slices shape,
# where every lambda touches only its own zip element (0.04 s for the
# same doc).


def _zip_slices(arr: str, width: int) -> str:
    """list_zip of `width` shifted slices of list column `arr`:
    element j is (arr[j+1], ..., arr[j+width]), len(arr)-width+1 rows."""
    slices = ", ".join(
        f"list_slice({arr}, {k + 1}, len({arr}) - {width - 1} + {k})"
        for k in range(width)
    )
    return f"list_zip({slices})"


_GRAM_CONCAT = " || ' ' || ".join(f"x[{k + 1}]" for k in range(K))
_WIN_LEAST = "least(" + ", ".join(f"x[{k + 1}]" for k in range(WIN)) + ")"

_FPS_ORACLE = f"""
w AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
),
g AS (
  SELECT doc_id,
    list_transform({_zip_slices('ws', K)}, x -> {_GRAM_CONCAT}) AS grams
  FROM w WHERE len(ws) >= {K}
),
h AS (
  SELECT doc_id,
    list_transform(grams, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
  FROM g
),
fp AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform({_zip_slices('hs', WIN)},
      x -> {_WIN_LEAST}))) AS fph
  FROM h WHERE len(hs) >= {WIN}
)
"""


def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fph): distinct winnowing fingerprints per document.

    Mirror of _FPS_ORACLE, in the inlining-safe shape: k-grams via
    word_shingles (zipped shifted slices), window minima via
    arrays_zip of WIN shifted slices of the hash array with least()
    over the zip element — no lambda ever indexes an aliased array,
    so CollapseProject cannot turn the plan quadratic (the class
    operators/text.py:word_shingles documents; the first draft of
    this module hit it for 10+ minutes on the extremes fixture's
    30k-token doc).
    """
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(
        d.select("doc_id", F.trim("text").alias("text")), K, out="grams"
    )
    hs = sh.select(
        "doc_id",
        F.transform(
            F.col("grams"),
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
        ).alias("__hs"),
    ).filter(F.size("__hs") >= WIN)
    m = F.size("__hs") - (WIN - 1)
    zw = F.arrays_zip(*[F.slice("__hs", k + 1, m) for k in range(WIN)])
    fps = F.array_distinct(
        F.transform(zw, lambda s: F.least(*[s[str(k)] for k in range(WIN)]))
    )
    return hs.select("doc_id", F.explode(fps).alias("fph"))


@register(
    "t_winnow_decontam",
    oracle=f"""
WITH {_FPS_ORACLE},
bench AS (SELECT DISTINCT fph FROM fp WHERE doc_id % 50 = 0),
corpus AS (SELECT doc_id, fph FROM fp WHERE doc_id % 50 <> 0)
SELECT c.doc_id,
  CAST(count(*) AS BIGINT) AS n_fp,
  CAST(count(b.fph) AS BIGINT) AS n_shared,
  (count(b.fph) >= 1) AS contaminated
FROM corpus c LEFT JOIN bench b USING (fph)
GROUP BY c.doc_id ORDER BY c.doc_id
""",
    tags=("J4", "J6", "H4", "H5"),
)
def t_winnow_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by winnowing fingerprints: every 50th
    doc plays the held-out benchmark; each remaining corpus document
    reports its fingerprint count, how many fingerprints the benchmark
    set shares, and the resulting contamination verdict. Unlike the
    n-gram twin (t_contamination), the corpus side ships only its
    winnowed fingerprints into the join — ~2/(WIN+1) of the k-grams —
    while keeping the deterministic guarantee that any shared run of
    WIN+K-1 tokens is detected. The benchmark fingerprint set is
    broadcast (benchmarks are MBs against TB corpora), so the corpus
    never shuffles: scan -> fold -> explode -> broadcast-join ->
    partial agg."""
    fp = _fingerprints(spark, sf_dir)
    is_bench = F.col("doc_id") % 50 == 0
    bench = (
        fp.filter(is_bench)
        .select("fph")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        fp.filter(~is_bench)
        .join(maybe_broadcast(bench, sf_dir, "documents"), on="fph", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fp"),
            F.count("hit").alias("n_shared"),
            (F.count("hit") >= 1).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@register(
    "t_winnow_neardup_pairs",
    oracle=f"""
WITH {_FPS_ORACLE},
df AS (
  SELECT fph FROM fp GROUP BY fph HAVING count(*) <= 20
),
pruned AS (SELECT fp.doc_id, fp.fph FROM fp JOIN df USING (fph)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(count(*) AS BIGINT) AS n_shared_fp
  FROM pruned a JOIN pruned b
    ON a.fph = b.fph AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared_fp
FROM pairs WHERE n_shared_fp >= 2
ORDER BY n_shared_fp DESC, doc_a, doc_b LIMIT 50
""",
    tags=("J6", "J9", "C1"),
)
def t_winnow_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plagiarism-style near-dup pairs: documents sharing >= 2
    winnowing fingerprints, ranked by overlap. The self-join is on the
    fingerprint value — the same bucket-join shape as the LSH dedup
    path (J9), never all-pairs — and stop-fingerprints (boilerplate
    phrases appearing in > 20 documents) are pruned by document
    frequency BEFORE the join, exactly like j_shingle_containment's
    docfreq pruning, so one viral phrase cannot quadratically explode
    a bucket at corpus scale. Deterministic top-50 with (doc_a, doc_b)
    tie-break."""
    fp = _fingerprints(spark, sf_dir)
    keep = fp.groupBy("fph").agg(F.count("*").alias("df")).filter(F.col("df") <= 20)
    pruned = fp.join(keep.select("fph"), on="fph", how="inner")
    b = pruned.select(F.col("doc_id").alias("doc_b"), "fph")
    return (
        pruned.select(F.col("doc_id").alias("doc_a"), "fph")
        .join(b, on="fph", how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= 2)
        .orderBy(F.desc("n_shared_fp"), "doc_a", "doc_b")
        .limit(50)
    )


@register(
    "t_winnow_attribution",
    oracle=f"""
WITH {_FPS_ORACLE},
bench AS (SELECT doc_id AS bench_id, fph FROM fp WHERE doc_id % 50 = 0),
corpus AS (SELECT doc_id, fph FROM fp WHERE doc_id % 50 <> 0)
SELECT c.doc_id, b.bench_id,
  CAST(count(*) AS BIGINT) AS n_shared_fp
FROM corpus c JOIN bench b USING (fph)
GROUP BY c.doc_id, b.bench_id
ORDER BY n_shared_fp DESC, c.doc_id, b.bench_id LIMIT 30
""",
    tags=("J6", "J14", "C3"),
)
def t_winnow_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination ATTRIBUTION: not just 'this document is
    contaminated' (t_winnow_decontam) but by WHICH benchmark document
    — the per-(corpus, benchmark) shared-fingerprint counts a
    decontamination audit actually actions. The benchmark side keeps
    its doc_id through the broadcast join, so the corpus still never
    shuffles before the pair aggregate; fingerprint sets are distinct
    per doc, making count(*) the exact shared-fingerprint cardinality.
    Deterministic top-30 with (corpus, bench) tie-break."""
    fp = _fingerprints(spark, sf_dir)
    is_bench = F.col("doc_id") % 50 == 0
    bench = fp.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), "fph"
    )
    return (
        fp.filter(~is_bench)
        .join(maybe_broadcast(bench, sf_dir, "documents"), on="fph", how="inner")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared_fp"))
        .orderBy(F.desc("n_shared_fp"), "doc_id", "bench_id")
        .limit(30)
    )
