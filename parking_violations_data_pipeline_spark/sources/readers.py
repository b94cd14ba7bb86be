"""Source connectors (SURVEY.md §2 A1-A4).

The reference ingests monthly CSV extracts and occasionally a JDBC
pull; here each source is a thin, schema-explicit wrapper over the
Spark reader so Catalyst still sees a plain relation (pushdown and
pruning work through all of them). Schema inference is deliberately
NOT used for CSV/JSON ingest at scale — an explicit StructType avoids
a full pre-scan and type drift between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
    delimiter: str = ",",
    header: bool = True,
) -> DataFrame:
    """A2: delimited extract with declared dtypes + date format —
    malformed rows become nulls (PERMISSIVE), matching the reference's
    bad-value→null convention."""
    return (
        spark.read.options(
            header=header,
            delimiter=delimiter,
            timestampFormat=timestamp_format,
            mode="PERMISSIVE",
        )
        .schema(schema)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """A3: JSON-lines ingest with explicit schema."""
    return spark.read.schema(schema).json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """A4: operational-DB pull. `predicates` gives one partition per
    predicate — the standard way to parallelize a JDBC scan without a
    numeric split column. No driver is shipped in this environment, so
    this is exercised only by a unit test asserting the reader config;
    the call path is the production one."""
    if predicates:
        return spark.read.jdbc(
            url, table, predicates=predicates, properties=properties or {}
        )
    return spark.read.jdbc(url, table, properties=properties or {})
