"""Round-3 widening batch 52: greedy maximum-coverage coreset
selection (the submodular data-pruning primitive) with an unrolled
greedy oracle, and capture-recapture population estimation from two
deterministic hash samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register

_POOL = 20  # candidate documents
_PICK = 5   # coreset size


def _coverage_oracle() -> str:
    head = f"""
WITH grams AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
            FOR i IN generate_series(1, len(ws) - 2)]) AS g
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
        FROM documents WHERE len(string_split(text, ' ')) >= 3)
),
pool AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT doc_id, count(*) AS n,
      row_number() OVER (ORDER BY count(*) DESC, doc_id) AS rn
    FROM grams GROUP BY doc_id
  ) WHERE rn <= {_POOL}
),
pg AS MATERIALIZED (
  SELECT g.doc_id, g.g FROM grams g JOIN pool p ON g.doc_id = p.doc_id
),
s1 AS MATERIALIZED (
  SELECT doc_id, count(*) AS gain FROM pg GROUP BY doc_id
  ORDER BY gain DESC, doc_id LIMIT 1
)"""
    parts = [head]
    prev = "(SELECT doc_id FROM s1)"
    for k in range(2, _PICK + 1):
        parts.append(
            f""",
s{k} AS MATERIALIZED (
  SELECT c.doc_id, count(*) AS gain
  FROM pg c
  WHERE c.doc_id NOT IN {prev}
    AND c.g NOT IN (SELECT g FROM pg WHERE doc_id IN {prev})
  GROUP BY c.doc_id
  ORDER BY gain DESC, c.doc_id LIMIT 1
)"""
        )
        prev = (
            "(" + " UNION ALL ".join(f"SELECT doc_id FROM s{j}" for j in range(1, k + 1)) + ")"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS pick, doc_id, gain FROM s{k}" for k in range(1, _PICK + 1)
    )
    parts.append(
        f"""
SELECT CAST(pick AS BIGINT) AS pick, CAST(doc_id AS BIGINT) AS doc_id,
  CAST(gain AS BIGINT) AS new_types
FROM ({union}) ORDER BY pick"""
    )
    return "".join(parts)


@register("t_coreset_greedy_coverage", oracle=_coverage_oracle(), tags=("J5", "J13", "F3"))
def t_coreset_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage coreset selection: from the 20
    trigram-richest documents, pick 5 that together cover the most
    DISTINCT trigram types — the submodular facility-location
    primitive behind diversity-aware data pruning (each step takes
    the document adding the most NEW types; the greedy gives the
    classic (1−1/e) guarantee). The distributed stage builds the
    doc×type posting table and ranks the candidate pool; only the
    pool's postings (bounded by 20 docs) reach the driver for the
    5-step greedy — the MMR/IVF bounded-collect precedent. Oracle:
    the same greedy unrolled with NOT-IN set subtraction per level.
    """
    d = load_table(spark, sf_dir, "documents")
    grams = (
        d.filter(F.size(F.split("text", " ")) >= 3)
        .select(
            "doc_id",
            # zip of shifted slices — the i-indexed form re-ran
            # split(lower(text)) per element, O(words²·chars) on long
            # docs (see operators/text.py::word_shingles)
            F.explode(
                F.expr(
                    "transform(arrays_zip("
                    " slice(split(lower(text), ' '), 1, size(split(lower(text), ' ')) - 2),"
                    " slice(split(lower(text), ' '), 2, size(split(lower(text), ' ')) - 2),"
                    " slice(split(lower(text), ' '), 3, size(split(lower(text), ' ')) - 2)),"
                    " s -> concat_ws(' ', s['0'], s['1'], s['2']))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    counts = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    rn = F.row_number().over(Window.orderBy(F.desc("n"), "doc_id"))
    pool = counts.select("doc_id", rn.alias("rn")).filter(F.col("rn") <= _POOL)
    pg = grams.join(pool.select("doc_id"), "doc_id")
    postings: dict[int, set] = {}
    for row in pg.collect():
        postings.setdefault(row["doc_id"], set()).add(row["g"])

    covered: set = set()
    picked = []
    remaining = sorted(postings)
    for pick in range(1, _PICK + 1):
        if not remaining:  # empty corpus → empty coreset, not a crash
            break
        best = None
        for doc in remaining:
            gain = len(postings[doc] - covered)
            key = (-gain, doc)
            if best is None or key < best[0]:
                best = (key, doc, gain)
        _, doc, gain = best
        if gain == 0:
            # oracle's per-level GROUP BY only sees docs with uncovered
            # types — stop identically when coverage saturates
            break
        picked.append((pick, doc, gain))
        covered |= postings[doc]
        remaining.remove(doc)
    return local_df(
        spark, picked, "pick long, doc_id long, new_types long"
    ).orderBy("pick")


@register(
    "d_capture_recapture",
    oracle="""
WITH marks AS (
  SELECT o_custkey,
    ascii(substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1)) % 4 = 0 AS in_a,
    ascii(substr(md5(CAST(o_custkey AS VARCHAR)), 2, 1)) % 4 = 0 AS in_b
  FROM (SELECT DISTINCT o_custkey FROM orders)
)
SELECT
  CAST(count(*) AS BIGINT) AS true_n,
  CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
  CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
  CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
  CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END)
     * sum(CASE WHEN in_b THEN 1 ELSE 0 END)
     // greatest(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END), 1) AS BIGINT)
    AS lincoln_petersen_est,
  abs(sum(CASE WHEN in_a THEN 1 ELSE 0 END)
     * sum(CASE WHEN in_b THEN 1 ELSE 0 END)
     // greatest(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END), 1)
     - count(*)) * 10 <= count(*) * 3 AS within_30pct
FROM marks
""",
    tags=("D3", "D8", "H4"),
)
def d_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Lincoln-Petersen) population estimation:
    two independent ~25% hash samples of active customers 'mark' and
    'recapture'; N̂ = n_a·n_b / n_both estimates the total active
    population from the overlap — the technique for sizing a
    population you can only sample (dark-web dedup, census coverage,
    bot-account estimation). Samples come from independent md5 hex
    digits (seedless, engine-shared); the estimate is integer floor
    division, and the in-plan ±30% sanity bound is a
    cross-multiplied integer test that MEASURES estimator quality
    against the known truth.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    h = F.md5(F.col("o_custkey").cast("string"))
    marks = o.select(
        (F.ascii(F.substring(h, 1, 1)) % 4 == 0).alias("in_a"),
        (F.ascii(F.substring(h, 2, 1)) % 4 == 0).alias("in_b"),
    )
    est = F.expr(
        "sum(CASE WHEN in_a THEN 1 ELSE 0 END)"
        " * sum(CASE WHEN in_b THEN 1 ELSE 0 END)"
        " div greatest(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END), 1)"
    )
    return marks.agg(
        F.count("*").alias("true_n"),
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)).alias("n_both"),
        est.alias("lincoln_petersen_est"),
        (F.abs(est - F.count("*")) * 10 <= F.count("*") * 3).alias("within_30pct"),
    )
