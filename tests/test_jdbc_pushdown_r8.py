"""Round-8: JDBC pushdown pins (VERDICT item 4). etl_jdbc_roundtrip
proves the Derby round trip end-to-end; these tests pin WHAT REACHES
THE DATABASE — the part that decides whether a 100 TB-adjacent
operational pull ships 25 rows or the whole table over the wire:

  1. predicate pushdown: the filter appears as PushedFilters on the
     JDBCRelation scan node (Spark compiles it into the remote WHERE
     clause, so Derby — not Spark — drops the rows);
  2. column pruning: a 2-column projection leaves the other columns
     out of the scan node entirely (remote SELECT list, not SELECT *);
  3. partitioned scan: numPartitions/bounds actually SPLIT the rows
     across multiple concurrent JDBC connections, not 1 fat + N empty.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.01"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp")


@pytest.fixture(scope="module")
def jdbc_nation(spark):
    db = os.path.join(_SCRATCH, f"derby_pushpin-{os.getpid()}")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    (
        load_table(spark, SF, "nation")
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_pin")
        .option("driver", DRIVER)
        # Spark's default Derby mapping for StringType is CLOB, and
        # Derby REFUSES comparisons between CLOB and CHAR — i.e. a
        # pushed string predicate would make the remote query fail at
        # runtime (measured: SQLSyntaxErrorException 'Comparisons
        # between CLOB and CHAR are not supported'). Real operational
        # pulls must create string keys as VARCHAR for pushdown to be
        # usable; this pin documents that contract.
        .option("createTableColumnTypes", "n_name VARCHAR(32)")
        .mode("overwrite")
        .save()
    )
    yield url


def _scan_line(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = [l for l in plan.splitlines() if "JDBCRelation" in l]
    assert lines, f"no JDBCRelation scan in plan:\n{plan}"
    return " ".join(lines)


def _read(spark, url, **opts):
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_pin")
        .option("driver", DRIVER)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_predicate_pushdown_reaches_jdbc(spark, jdbc_nation):
    df = _read(spark, jdbc_nation).filter(F.col("n_nationkey") >= 5)
    scan = _scan_line(df)
    assert "PushedFilters" in scan, scan
    assert "GreaterThanOrEqual(N_NATIONKEY,5)" in scan.replace(
        "n_nationkey", "N_NATIONKEY"
    ), scan
    # and no residual Spark-side Filter re-checking the same predicate
    # is REQUIRED for correctness here — but the row count must agree
    # with the source regardless of where the filter ran
    assert df.count() == (
        load_table(spark, SF, "nation").filter("n_nationkey >= 5").count()
    )


def test_string_predicate_pushdown(spark, jdbc_nation):
    df = _read(spark, jdbc_nation).filter(F.col("n_name") == "NATION_7")
    scan = _scan_line(df)
    assert "EqualTo" in scan and "NATION_7" in scan, scan
    assert df.count() == 1


def test_column_pruning_reaches_jdbc(spark, jdbc_nation):
    df = _read(spark, jdbc_nation).select("n_nationkey", "n_name")
    scan = _scan_line(df).upper()
    assert "N_NATIONKEY" in scan and "N_NAME" in scan
    # the pruned columns must not appear anywhere on the scan node:
    # JDBCRelation compiles the projection into the remote SELECT list
    assert "N_REGIONKEY" not in scan, scan


def test_partitioned_scan_splits_rows(spark, jdbc_nation):
    hi = 25
    df = _read(
        spark,
        jdbc_nation,
        partitionColumn="n_nationkey",
        lowerBound="0",
        upperBound=str(hi),
        numPartitions="4",
    )
    assert df.rdd.getNumPartitions() == 4
    per_part = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = {r["pid"]: r["count"] for r in per_part}
    assert sum(counts.values()) == 25
    # bounds 0..25 over 4 partitions => strides of ~6: every partition
    # must carry rows, and none may carry the whole table (the failure
    # mode bounds typos produce: 1 fat partition + 3 empty)
    assert len(counts) == 4, counts
    assert max(counts.values()) <= 7, counts


def test_partition_bounds_compose_with_pushdown(spark, jdbc_nation):
    # both mechanisms at once: the per-partition WHERE (bound ranges)
    # AND the user filter must land in the remote query — rows seen by
    # Spark = filtered rows, split across partitions
    df = _read(
        spark,
        jdbc_nation,
        partitionColumn="n_nationkey",
        lowerBound="0",
        upperBound="25",
        numPartitions="4",
    ).filter(F.col("n_nationkey") >= 10)
    scan = _scan_line(df)
    assert "GreaterThanOrEqual" in scan, scan
    assert df.count() == 15
