"""Round-3 widening batch 53: Bloom-filter dedup pre-screening (the
guarantee pair MEASURED: zero false negatives, bounded false-positive
rate) and range-partition balance auditing via spark_partition_id.
Both emit engine-reproducible invariants — the bloom bit pattern and
the physical partition ids are engine-specific, the CONTRACTS are
not (the round-2 rows-only→invariant conversion discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


def _hex5_sql(start: int) -> str:
    """DuckDB: integer value of 5 md5 hex chars [start, start+4]."""
    terms = []
    for j in range(5):
        pos = start + j
        mult = 16 ** (4 - j)
        terms.append(
            f"(ascii(substr(h, {pos}, 1))"
            f" - CASE WHEN ascii(substr(h, {pos}, 1)) >= 97 THEN 87 ELSE 48 END)"
            f" * {mult}"
        )
    return "(" + " + ".join(terms) + ")"


_BLOOM_ORACLE = f"""
WITH split AS MATERIALIZED (
  SELECT doc_id, md5(lower(text)) AS h,
    CASE WHEN doc_id < (SELECT (max(doc_id) * 4) // 5 FROM documents)
         THEN 'existing' ELSE 'incoming' END AS corpus
  FROM documents WHERE length(text) > 0
),
pos AS MATERIALIZED (
  SELECT doc_id, corpus,
    {_hex5_sql(1)} % 1048576 AS p1,
    {_hex5_sql(6)} % 1048576 AS p2,
    {_hex5_sql(11)} % 1048576 AS p3
  FROM split
),
bits AS (
  SELECT doc_id, corpus, unnest([p1, p2, p3]) AS p FROM pos
),
words AS MATERIALIZED (
  SELECT p // 63 AS w, bit_or(CAST(1 AS BIGINT) << (p % 63)) AS bitsw
  FROM bits WHERE corpus = 'existing' GROUP BY p // 63
),
screened AS (
  SELECT b.doc_id,
    bool_and(coalesce(w.bitsw, 0) & (CAST(1 AS BIGINT) << (b.p % 63)) <> 0) AS flagged
  FROM bits b LEFT JOIN words w ON b.p // 63 = w.w
  WHERE b.corpus = 'incoming'
  GROUP BY b.doc_id
),
truth AS (
  SELECT i.doc_id
  FROM split i JOIN split e ON i.h = e.h
  WHERE i.corpus = 'incoming' AND e.corpus = 'existing'
  GROUP BY i.doc_id
)
SELECT
  CAST(count(*) AS BIGINT) AS n_incoming,
  CAST(sum(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dupes,
  CAST(sum(CASE WHEN s.flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(sum(CASE WHEN s.flagged AND t.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_pos,
  bool_and(NOT (t.doc_id IS NOT NULL AND NOT s.flagged)) AS no_false_negatives
FROM screened s LEFT JOIN truth t ON s.doc_id = t.doc_id
"""


@register("t_bloom_prescreen", oracle=_BLOOM_ORACLE, tags=("J5", "D3", "C4"))
def t_bloom_prescreen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup pre-screen, CROSS-ENGINE EXACT: instead of
    the engine-internal bloom (whose bit pattern no oracle can
    replay), the filter is built from first principles — k=3 bit
    positions per fingerprint from md5 hex slices (the shared hash),
    m=2^20 bit positions packed 63-per-word (DuckDB rejects shifts
    into the sign bit) via bit_or aggregation
    (order-free, hence partial-aggregable — the same mergeable
    contract as h_bitmap_distinct). Screening is a broadcast join of
    each incoming position against its word; a doc flags only if ALL
    three bits are set. Every number — flagged, false positives, the
    no-false-negative guarantee — is bit-identical on both engines,
    so the bloom CONTRACT is proven exactly, not bounded.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    cutoff = d.agg(F.expr("(max(doc_id) * 4) div 5").alias("c"))
    split = d.crossJoin(F.broadcast(cutoff)).select(
        "doc_id",
        F.md5(F.lower("text")).alias("h"),
        F.when(F.col("doc_id") < F.col("c"), "existing")
        .otherwise("incoming")
        .alias("corpus"),
    )

    def hex5(start: int):
        v = F.lit(0)
        for j in range(5):
            a = F.ascii(F.substring("h", start + j, 1))
            digit = a - F.when(a >= 97, 87).otherwise(48)
            v = v * 16 + digit
        return v

    pos = split.select(
        "doc_id",
        "corpus",
        (hex5(1) % 1048576).alias("p1"),
        (hex5(6) % 1048576).alias("p2"),
        (hex5(11) % 1048576).alias("p3"),
    )
    bits = pos.select(
        "doc_id", "corpus", F.explode(F.array("p1", "p2", "p3")).alias("p")
    )
    words = (
        bits.filter(F.col("corpus") == "existing")
        .groupBy(F.expr("p div 63").alias("w"))
        .agg(F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(p % 63 as int))")).alias("bitsw"))
    )
    screened = (
        bits.filter(F.col("corpus") == "incoming")
        .join(F.broadcast(words), F.expr("p div 63") == F.col("w"), "left")
        .groupBy("doc_id")
        .agg(
            F.bool_and(
                F.expr(
                    "coalesce(bitsw, 0) & shiftleft(cast(1 as bigint),"
                    " cast(p % 63 as int)) != 0"
                )
            ).alias("flagged")
        )
    )
    ex = split.filter(F.col("corpus") == "existing").select(F.col("h").alias("eh"))
    truth = (
        split.filter(F.col("corpus") == "incoming")
        .join(ex, F.col("h") == F.col("eh"))
        .select("doc_id")
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        screened.join(truth, "doc_id", "left")
        .agg(
            F.count("*").alias("n_incoming"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_true_dupes"),
            F.sum(F.when(F.col("flagged"), 1).otherwise(0)).alias("n_flagged"),
            F.sum(
                F.when(F.col("flagged") & F.col("is_dup").isNull(), 1).otherwise(0)
            ).alias("n_false_pos"),
            F.bool_and(
                ~(F.col("is_dup").isNotNull() & ~F.col("flagged"))
            ).alias("no_false_negatives"),
        )
    )


@register(
    "a_partition_balance",
    oracle="""
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(8 AS BIGINT) AS n_partitions,
  TRUE AS balanced
FROM lineitem
""",
    tags=("A1", "F1", "C9"),
)
def a_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition balance audit: lineitem repartitioned by range
    on its key into 8 partitions, then per-partition row counts
    MEASURED via spark_partition_id() — the skew check run before
    committing to a range layout (a hot key range starves the
    cluster; range partitioning samples quantiles precisely to avoid
    that). The physical ids are engine-internal, so the emitted
    contract is the invariant: no partition holds more than 2× the
    ideal share, and the partition count and total row count are
    exact.
    """
    l = load_table(spark, sf_dir, "lineitem")
    parts = (
        l.repartitionByRange(8, "l_orderkey", "l_linenumber")
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    n_rows = sum(r["n"] for r in parts)
    # report the REQUESTED partition count (the layout contract, what
    # the oracle pins); `parts` only contains OCCUPIED partitions, so
    # a tiny/empty input would otherwise under-report the layout
    n_partitions = 8
    ideal = n_rows / n_partitions
    # 2× the ideal share, with a small absolute floor: below ~64 rows
    # a "partition" of a handful of rows is never skew, it's just a
    # tiny input that cannot spread 8 ways
    balanced = all(r["n"] <= max(2 * ideal, 64) for r in parts)
    return local_df(
        spark,
        [(n_rows, n_partitions, bool(balanced))],
        "n_rows long, n_partitions long, balanced boolean",
    )
