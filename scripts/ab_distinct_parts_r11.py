"""A/B for q_distinct_parts (round-11 verdict item 6).

q_distinct_parts has been the second-worst bench row for three rounds
(1.23x driver / 0.97x idle). The spread says mostly floor+contention,
but this settles whether there is real plan time on the table:

  A (current): groupBy(l_returnflag).agg(countDistinct(l_partkey),
     count(*)) — Catalyst plans the mixed distinct/non-distinct agg
     with an Expand (2 projections per input row: one for the distinct
     group, one for the plain count), i.e. the first shuffle sees 2x
     the input rows.
  B (two-phase rewrite): groupBy(l_returnflag, l_partkey).count()
     then groupBy(l_returnflag).agg(count(*) AS ndp, sum(c) AS cnt) —
     no Expand; shuffle 1 carries (flag, partkey) partials (map-side
     combine collapses duplicates), shuffle 2 is #distinct-pairs rows.

Protocol: warm-up each, then N interleaved repeats (A,B,A,B,...), min
and median reported, identical .collect() surface. Also records each
plan's Expand presence so the structural claim is pinned, not assumed.

Appends a '## round 11' section to PERF_COMPARE.md and prints JSON.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from parking_violations_data_pipeline_spark.catalog import load_table  # noqa: E402
from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = 7


def variant_a(spark):
    li = load_table(spark, SF, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("ndp"), F.count("*").alias("cnt"))
        .orderBy("l_returnflag")
    )


def variant_b(spark):
    li = load_table(spark, SF, "lineitem")
    pairs = li.groupBy("l_returnflag", "l_partkey").agg(
        F.count("*").alias("c")
    )
    return (
        pairs.groupBy("l_returnflag")
        .agg(F.count("*").alias("ndp"), F.sum("c").alias("cnt"))
        .orderBy("l_returnflag")
    )


def main() -> None:
    spark = get_spark(app_name="ab-distinct-r11")
    spark.sparkContext.setLogLevel("ERROR")

    a_rows = [tuple(r) for r in variant_a(spark).collect()]  # warm-up A
    b_rows = [tuple(r) for r in variant_b(spark).collect()]  # warm-up B
    assert a_rows == b_rows, "rewrite changes the answer!"

    plans = {
        "A_expand": "Expand" in variant_a(spark)._jdf.queryExecution()
        .executedPlan().toString(),
        "B_expand": "Expand" in variant_b(spark)._jdf.queryExecution()
        .executedPlan().toString(),
    }

    ts: dict[str, list[float]] = {"A": [], "B": []}
    for _ in range(REPEATS):
        for key, fn in (("A", variant_a), ("B", variant_b)):
            t0 = time.perf_counter()
            fn(spark).collect()
            ts[key].append(time.perf_counter() - t0)

    report = {
        "sf_dir": SF,
        "repeats": REPEATS,
        "plans": plans,
        "A_min": round(min(ts["A"]), 4),
        "A_med": round(statistics.median(ts["A"]), 4),
        "B_min": round(min(ts["B"]), 4),
        "B_med": round(statistics.median(ts["B"]), 4),
    }
    report["winner"] = "B" if report["B_min"] < report["A_min"] else "A"
    report["delta_ms_min"] = round(
        (report["A_min"] - report["B_min"]) * 1000, 1
    )
    print(json.dumps(report, indent=2))

    md = Path(__file__).resolve().parent.parent / "PERF_COMPARE.md"
    section = (
        "\n## round 11 — q_distinct_parts exact-distinct A/B\n\n"
        "| variant | plan | min (s) | med (s) |\n|---|---|---|---|\n"
        f"| A: countDistinct+count in one agg | Expand={plans['A_expand']} "
        f"| {report['A_min']} | {report['A_med']} |\n"
        f"| B: two-phase (flag,partkey) group then fold | "
        f"Expand={plans['B_expand']} | {report['B_min']} | "
        f"{report['B_med']} |\n\n"
        f"Winner: **{report['winner']}** by {abs(report['delta_ms_min'])} ms "
        f"on mins ({REPEATS} interleaved repeats at {SF}).\n"
    )
    with open(md, "a") as f:
        f.write(section)
    print("appended to", md)
    spark.stop()


if __name__ == "__main__":
    main()
