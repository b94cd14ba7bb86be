"""Round-12 parallel-scaling artifact (VERDICT r11 'Next round' item 2).

The shipped sf fixtures are one single-row-group file per table, so
every scan stage is ONE task and the r11 scaling block measured 8 cores
>= 32 cores for every headliner. This harness measures the same nine
headliner queries on a multi-file / multi-row-group rewrite of the
fixtures (scripts/gen_scale_fixtures.py) where scans and shuffles have
real parallelism to expose, and times the COMPUTATION with the noop
sink (guide §1.4) — .collect() of the result (the bench contract's
timed action) is a driver-side row transfer that cannot parallelize
and at 10x data masks everything (measured: q_sessionize 10x = 1.3 s
noop vs 8.1 s collect of 954k rows).

Usage:
  one worker (invoked per core count):
    python scripts/scaling_r12.py worker SF_DIR CPUS OUT_JSON
  full artifact:
    python scripts/scaling_r12.py run SF_DIR OUT_JSON   # spawns 32- and 8-core workers
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
REPEATS = 3


def worker(sf_dir: str, cpus: str, out: str) -> int:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries
    from parking_violations_data_pipeline_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name=f"scaling-r12-c{cpus}")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in HEADLINERS:  # warm-up pass (JIT, footer cache)
        noop(REGISTRY[name].fn(spark, sf_dir))
    samples: dict[str, list[float]] = {n: [] for n in HEADLINERS}
    floors: list[float] = []
    for _ in range(REPEATS):  # interleaved, bench.py methodology
        t0 = time.perf_counter()
        spark.range(1).collect()
        floors.append(time.perf_counter() - t0)
        for name in HEADLINERS:
            spark.sparkContext.setJobDescription(f"scaling:{name}")
            t0 = time.perf_counter()
            noop(REGISTRY[name].fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    res = {
        "cpus": int(cpus),
        "sf_dir": sf_dir,
        "queries": {n: round(min(ts), 4) for n, ts in samples.items()},
        "floor_min": round(min(floors), 4),
        "action": "noop",
    }
    Path(out).write_text(json.dumps(res, indent=1))
    spark.stop()
    print(json.dumps(res))
    return 0


def run(sf_dir: str, out: str) -> int:
    parts = {}
    for cpus in ("32", "8"):
        tmp = f"/tmp/scaling_r12_c{cpus}.json"
        subprocess.run(
            [sys.executable, __file__, "worker", sf_dir, cpus, tmp],
            check=True,
        )
        parts[cpus] = json.loads(Path(tmp).read_text())
    q32, q8 = parts["32"]["queries"], parts["8"]["queries"]
    artifact = {
        "round": 12,
        "sf_dir": sf_dir,
        "method": "noop-sink min-of-3 interleaved per core count; "
        "multi-file multi-row-group fixtures from scripts/gen_scale_fixtures.py",
        "c32": parts["32"],
        "c8": parts["8"],
        "speedup_32_over_8": {
            n: round(q8[n] / q32[n], 2) if q32[n] > 0 else None for n in q32
        },
    }
    Path(out).write_text(json.dumps(artifact, indent=1))
    print(json.dumps(artifact["speedup_32_over_8"]))
    return 0


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "worker":
        raise SystemExit(worker(sys.argv[2], sys.argv[3], sys.argv[4]))
    raise SystemExit(run(sys.argv[2], sys.argv[3]))
