"""Sinks (SURVEY.md §2 A5): publication-grade writes.

At 100 TB the layout decisions here are the performance story for
every downstream reader: partition by a low-cardinality pruning key
(date), target ~128-512 MB files (repartition before write), parquet
with column stats so scans prune both files and row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """A5: parquet sink; optionally hive-partitioned. `target_partitions`
    pre-repartitions (on the partition columns when given, so each
    output directory is written by few tasks → few, large files)."""
    if target_partitions:
        df = (
            df.repartition(target_partitions, *partition_by)
            if partition_by
            else df.repartition(target_partitions)
        )
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """A5: CSV publication (the reference's output format). single_file
    coalesces to 1 — only for bounded publication extracts."""
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).options(header=header).csv(path)
