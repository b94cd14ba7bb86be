"""Per-headliner BUILD time (round-11, guide §1): time fn(spark,
sf_dir) alone — plan construction / Py4J RPC cost, no action. The
one-RPC spark.sql() rewrites only pay off here, so this isolates the
win candidate per query before any rewrite.

Usage: python scripts/r11_build_times.py [sf_dir] [--repeats=N]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINERS = [
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


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    repeats = 7
    for a in sys.argv[1:]:
        if a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])

    import __spark_entry__ as E

    qs = E.queries()
    spark = get_spark(app_name="r11-build-times")
    # warm-up: one full build+collect pass (footer caches, views, JIT)
    for n in HEADLINERS:
        qs[n](spark, sf_dir).collect()

    samples: dict[str, list[float]] = {n: [] for n in HEADLINERS}
    for _ in range(repeats):
        for n in HEADLINERS:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir)
            samples[n].append(time.perf_counter() - t0)
    out = {}
    for n, ts in samples.items():
        ts.sort()
        out[n] = {
            "build_min_ms": round(ts[0] * 1000, 1),
            "build_med_ms": round(ts[len(ts) // 2] * 1000, 1),
        }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
