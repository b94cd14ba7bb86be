"""100-TB layout demo (round-7 item 6, VERDICT r6): compose the §4
posture end-to-end — date-partitioned fact layout, static partition
pruning, dynamic partition pruning (DPP) — at the 100x scale dataset,
and MEASURE the pruning (files/partitions read vs. total on disk) from
the executed plan's scan metrics, not from explain-text faith.

Layout written once:
  .tmp/layout100/events/event_date=YYYY-MM-DD/*.parquet   (daily)
  .tmp/layout100/lineitem/ship_month=YYYY-MM/*.parquet    (monthly)

Probes:
  static-day    one day of events → hourly rollup (q_events_hourly's
                shape) — scan must touch only that day's files
  static-month  one ship month of lineitem → q1 pricing-summary shape
  dpp           lineitem ⋈ a small month-dim filtered on an attribute
                the fact doesn't carry — only a DPP subquery can prune
                the fact side at runtime

Usage: python scripts/layout_demo.py [scale_dir] (default .tmp/scale10,
which holds whatever SCALE_COPIES the last scale_smoke build wrote)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parking_violations_data_pipeline_spark.catalog import load_table  # noqa: E402
from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".tmp", "scale10")
OUT = os.path.join(REPO, ".tmp", "layout100")


def count_files(root: str) -> tuple[int, int]:
    """(n_parquet_files, n_partition_dirs) under a partitioned root."""
    nf = nd = 0
    for dirpath, dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            nd += 1
        nf += sum(1 for f in files if f.endswith(".parquet"))
    return nf, nd


def scan_metrics(df) -> list[dict]:
    """Post-execution per-scan metrics from the JVM executed plan:
    numFiles / numPartitions (selected AFTER static+dynamic pruning)
    per FileSourceScan leaf."""
    out = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if "Scan" in name and "parquet" in node.simpleString(200):
            m = node.metrics()
            row = {"node": name}
            it = m.keysIterator()
            while it.hasNext():
                k = it.next()
                if k in ("numFiles", "numPartitions", "numOutputRows",
                         "staticFilesNum", "pruningTime"):
                    row[k] = m.apply(k).value()
            out.append(row)
        # AQE and query-stage nodes hide their subtree behind accessor
        # methods, not children()
        if name == "AdaptiveSparkPlan":
            stack.append(node.executedPlan())
            continue
        if "QueryStage" in name:
            stack.append(node.plan())
            continue
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
    return out


def main() -> None:
    spark = get_spark(app_name="layout-demo")
    report: dict = {"src": SRC}

    if not os.path.exists(os.path.join(OUT, "events")) or os.environ.get("LAYOUT_REBUILD"):
        t0 = time.perf_counter()
        ev = load_table(spark, SRC, "events").filter(F.col("ts").isNotNull())
        (
            ev.withColumn("event_date", F.to_date("ts"))
            .repartition("event_date")  # one task-file set per day
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(os.path.join(OUT, "events"))
        )
        li = load_table(spark, SRC, "lineitem")
        (
            li.withColumn(
                "ship_month", F.date_format("l_shipdate", "yyyy-MM")
            )
            .repartition("ship_month")
            .write.partitionBy("ship_month")
            .mode("overwrite")
            .parquet(os.path.join(OUT, "lineitem"))
        )
        report["build_sec"] = round(time.perf_counter() - t0, 1)

    ev_files, ev_parts = count_files(os.path.join(OUT, "events"))
    li_files, li_parts = count_files(os.path.join(OUT, "lineitem"))
    report["on_disk"] = {
        "events": {"files": ev_files, "partitions": ev_parts},
        "lineitem": {"files": li_files, "partitions": li_parts},
    }

    events = spark.read.parquet(os.path.join(OUT, "events"))
    lineitem = spark.read.parquet(os.path.join(OUT, "lineitem"))

    # pick a real day / month to probe
    day = events.select(F.min("event_date").alias("d")).head()["d"]
    month = lineitem.select(F.max("ship_month").alias("m")).head()["m"]

    # --- probe 1: static partition pruning, daily events rollup
    t0 = time.perf_counter()
    q1 = (
        events.filter(F.col("event_date") == F.lit(day))
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
    )
    n1 = len(q1.collect())
    report["static_day"] = {
        "day": str(day),
        "sec": round(time.perf_counter() - t0, 2),
        "rows": n1,
        "scans": scan_metrics(q1),
    }

    # --- probe 2: static pruning, one ship month through the q1 shape
    t0 = time.perf_counter()
    q2 = (
        lineitem.filter(F.col("ship_month") == month)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
        )
    )
    n2 = len(q2.collect())
    report["static_month"] = {
        "month": str(month),
        "sec": round(time.perf_counter() - t0, 2),
        "rows": n2,
        "scans": scan_metrics(q2),
    }

    # --- probe 3: DYNAMIC partition pruning — the filter lives on a
    # dim attribute the fact doesn't carry, so only the runtime DPP
    # subquery can prune fact partitions
    months = [r["ship_month"] for r in lineitem.select("ship_month").distinct().collect()]
    months.sort()
    dim = spark.createDataFrame(
        [(m, "peak" if i >= len(months) - 2 else "off") for i, m in enumerate(months)],
        "ship_month string, season string",
    )
    t0 = time.perf_counter()
    q3 = (
        lineitem.join(dim.filter(F.col("season") == "peak").hint("broadcast"), "ship_month")
        .groupBy("ship_month")
        .agg(F.count("*").alias("n"))
    )
    n3 = len(q3.collect())
    dpp_plan = q3._jdf.queryExecution().executedPlan().toString()
    report["dpp"] = {
        "peak_months": 2,
        "total_months": len(months),
        "sec": round(time.perf_counter() - t0, 2),
        "rows": n3,
        "scans": scan_metrics(q3),
        "dpp_in_plan": "dynamicpruning" in dpp_plan.lower(),
    }

    print(json.dumps(report, indent=1, default=str))


if __name__ == "__main__":
    main()
