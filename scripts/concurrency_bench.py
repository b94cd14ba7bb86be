"""Throughput under concurrency (round-11 verdict item 5).

The 6-thread soak proves CORRECTNESS under concurrent submission;
nothing measured THROUGHPUT — a real job-server submits many queries
at once and the questions are (a) how much aggregate speedup concurrent
submission buys on one driver, and (b) whether any query starves
(p95 under concurrency >> its sequential time).

Protocol (idle box, local[32], sf0.1 — same surface as bench.py):
  * warm-up pass over the 9 headline queries (discarded);
  * N_ROUNDS rounds, each = one SEQUENTIAL pass (each query timed
    back-to-back on one thread) then one CONCURRENT pass (all 9
    queries submitted to a 6-thread pool; per-query wall measured
    from submit-slot start, i.e. scheduler queueing inside the pool
    is excluded, Spark-side contention included);
  * FAIR scheduler would change the sharing policy; we measure the
    default FIFO the engine actually ships with.

Reported per query: sequential min, concurrent p95 (over rounds),
ratio. Aggregate: sequential total (sum of per-query mins — the
one-at-a-time cost), concurrent wall p50/p95 (the 9-query batch
turnaround), aggregate speedup = seq_total_min / conc_wall_min.
Alarm condition the verdict sets: no query's concurrent p95 may
exceed 2x its sequential min.

Writes CONCURRENCY_BENCH_r11.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES  # noqa: E402

N_ROUNDS = 5
POOL = 6


def p95(xs: list[float]) -> float:
    xs = sorted(xs)
    i = max(0, min(len(xs) - 1, round(0.95 * (len(xs) - 1))))
    return xs[i]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parking_violations_data_pipeline_spark.registry import (
        REGISTRY,
        all_queries,
    )
    from parking_violations_data_pipeline_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name="pvdp-conc-bench")

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).collect()
        return time.perf_counter() - t0

    # warm-up (JIT, footer cache, view builds) — discarded
    for name in BENCH_QUERIES:
        run_one(name)

    seq: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    conc: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    seq_walls: list[float] = []
    conc_walls: list[float] = []

    for _ in range(N_ROUNDS):
        t0 = time.perf_counter()
        for name in BENCH_QUERIES:
            seq[name].append(run_one(name))
        seq_walls.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=POOL) as pool:
            futs = {n: pool.submit(run_one, n) for n in BENCH_QUERIES}
            for n, f in futs.items():
                conc[n].append(f.result())
        conc_walls.append(time.perf_counter() - t0)

    queries = {}
    worst = 0.0
    for n in BENCH_QUERIES:
        s_min = min(seq[n])
        c_p95 = p95(conc[n])
        ratio = round(c_p95 / s_min, 2)
        worst = max(worst, ratio)
        queries[n] = {
            "seq_min": round(s_min, 4),
            "seq_med": round(statistics.median(seq[n]), 4),
            "conc_med": round(statistics.median(conc[n]), 4),
            "conc_p95": round(c_p95, 4),
            "conc_over_seq_p95": ratio,
        }

    seq_total_min = sum(q["seq_min"] for q in queries.values())
    report = {
        "protocol": (
            f"{N_ROUNDS} rounds of (sequential pass, then all 9 queries "
            f"into a {POOL}-thread pool) at {sf_dir} on local[32], FIFO "
            "scheduler; per-query concurrent wall measured from pool-slot "
            "start; warm-up discarded"
        ),
        "queries": queries,
        "seq_total_min_s": round(seq_total_min, 3),
        "seq_wall_min_s": round(min(seq_walls), 3),
        "conc_wall_min_s": round(min(conc_walls), 3),
        "conc_wall_med_s": round(statistics.median(conc_walls), 3),
        "conc_wall_p95_s": round(p95(conc_walls), 3),
        "aggregate_speedup_minwall": round(min(seq_walls) / min(conc_walls), 2),
        "worst_conc_over_seq_p95": round(worst, 2),
        "starvation_alarm_2x": worst > 2.0,
    }
    out = Path(__file__).resolve().parent.parent / "CONCURRENCY_BENCH_r11.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
