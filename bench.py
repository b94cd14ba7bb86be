"""Bench harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: warm-up run, then best-of-3 wall time per
query (collect() included).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q_window_rank",
    "q_distinct_parts",
    "q_events_hourly",
    "q_sessionize",
    "q_word_count",
    "q_knn_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries
    from parking_violations_data_pipeline_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name="pvdp-bench")

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).collect()  # warm-up (JIT, parquet footer cache)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_9q_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
