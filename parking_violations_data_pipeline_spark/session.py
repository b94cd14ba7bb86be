"""SparkSession factory tuned for this environment (SURVEY.md §7 M0).

Local mode for tests/bench; the conf layout is written for a real
multi-executor cluster (AQE on, skew-join on, adaptive partition
coalescing) — at 100 TB only `shuffle.partitions` and memory sizing
change, both overridable via env/kwargs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "parking_violations_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's required confs.

    Required everywhere:
      - legacy.parquet.nanosAsLong: the driver fixtures' events.parquet
        carries timestamp[ns], which Spark 4 refuses by default
        (PARQUET_TYPE_ILLEGAL — measured, FIXTURES.md).
      - session.timeZone=UTC: keeps timestamp semantics identical to the
        DuckDB oracle (naive-UTC parquet values).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local bench scale: a handful of partitions beats 200 (BASELINE.md);
        # on a real cluster pass ~2-3x total cores instead. For stages
        # shuffling >> executor memory, ALSO set
        # adaptive.coalescePartitions.parallelismFirst=false +
        # advisoryPartitionSizeInBytes=64m: the parallelismFirst default
        # re-coalesces post-shuffle partitions to defaultParallelism, so
        # raising shuffle.partitions alone cannot shrink per-task sorts
        # (measured: SMJ at 600M rows, reduce-stage spill 21.5 GB at any
        # partition count until parallelismFirst=false; SCALE_EXPONENTS_r8).
        shuffle_partitions = max(8, min(int(cpus) * 2, 64)) if cpus.isdigit() else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Set the runtime-settable confs the engine relies on, on a session
    we did not create (the driver builds its own SparkSession)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
