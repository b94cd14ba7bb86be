"""A/B for q_events_hourly build overhead (round-11 follow-on).

q_events_hourly sits at ~1.16x baseline on the driver box. The plan is
already right (single scan, JVM-side get_json_object, partial+final
hash agg), so the remaining lever is the q_word_count lesson: a
chained DataFrame build costs one Py4J round trip per operator, while
ONE spark.sql() call over a session-cached temp view is a single RPC
resolving against an already-analyzed relation.

  A (current): load_table -> withColumn -> groupBy -> agg -> orderBy
     (5 driver RPCs per build).
  B (one-RPC): temp view over load_table's events (created once per
     (appId, sf_dir, mtime), exactly _wc_view's contract), then one
     spark.sql() string per call.

Protocol: warm-up each + row-equality assert, then N interleaved
repeats (A,B,A,B,...); build time (plan-construction only) and full
wall (build+collect) reported separately so the delta is attributed
to the build path, not executor noise. Prints JSON; PERF_COMPARE gets
a section only if B is adopted.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from parking_violations_data_pipeline_spark.catalog import load_table  # noqa: E402
from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = 9
VIEW = "ab_events_r11"

SQL = f"""
SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt,
  round(sum(value), 2) AS sv,
  round(avg(CAST(get_json_object(props, '$.k') AS INT)), 6) AS avg_k
FROM {VIEW}
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, h
"""


def variant_a(spark):
    e = load_table(spark, SF, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sv"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
        .orderBy("event_type", "h")
    )


def variant_b(spark):
    return spark.sql(SQL)


def main() -> None:
    spark = get_spark(app_name="ab-events-r11")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF, "events").createOrReplaceTempView(VIEW)

    a_rows = [tuple(r) for r in variant_a(spark).collect()]  # warm-up A
    b_rows = [tuple(r) for r in variant_b(spark).collect()]  # warm-up B
    assert a_rows == b_rows, "one-RPC rewrite changes the answer!"

    build: dict[str, list[float]] = {"A": [], "B": []}
    wall: dict[str, list[float]] = {"A": [], "B": []}
    for _ in range(REPEATS):
        for key, fn in (("A", variant_a), ("B", variant_b)):
            t0 = time.perf_counter()
            df = fn(spark)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            build[key].append(t1 - t0)
            wall[key].append(t2 - t0)

    report = {"sf_dir": SF, "repeats": REPEATS}
    for key in ("A", "B"):
        report[f"{key}_build_min_ms"] = round(min(build[key]) * 1000, 1)
        report[f"{key}_build_med_ms"] = round(
            statistics.median(build[key]) * 1000, 1
        )
        report[f"{key}_wall_min"] = round(min(wall[key]), 4)
        report[f"{key}_wall_med"] = round(statistics.median(wall[key]), 4)
    report["winner"] = (
        "B" if report["B_wall_min"] < report["A_wall_min"] else "A"
    )
    report["delta_ms_wall_min"] = round(
        (report["A_wall_min"] - report["B_wall_min"]) * 1000, 1
    )
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
