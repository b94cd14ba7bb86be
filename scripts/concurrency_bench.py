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
  * BOTH scheduler modes measured, one process each (the mode is a
    SparkContext-creation conf): FIFO (Spark default) and FAIR with
    one pool per submitting thread. FIFO lets an early long job's
    task wave delay later submissions (that IS the starvation
    mechanism); FAIR round-robins task slots across jobs, which is
    the documented job-server posture.

Reported per query: sequential min/med, concurrent med/p95, and TWO
ratios — p95/seq_min (the verdict's strict tail bound: worst observed
concurrent sample vs best-ever sequential sample) and med/seq_med (the
typical-vs-typical starvation signal; a med ratio near 1 with a p95
ratio above 2 means tail variance under core-sharing, not a starved
query). Aggregate: sequential total (sum of per-query mins — the
one-at-a-time cost), concurrent wall p50/p95 (the 9-query batch
turnaround), aggregate speedup = seq_total_min / conc_wall_min.
Alarm conditions: strict = any p95/seq_min > 2x; median = any
med/seq_med > 2x.

Writes CONCURRENCY_BENCH_r11.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_QUERIES  # noqa: E402

N_ROUNDS = 10
POOL = 6


def p95(xs: list[float]) -> float:
    xs = sorted(xs)
    i = max(0, min(len(xs) - 1, round(0.95 * (len(xs) - 1))))
    return xs[i]


def run_mode(mode: str, sf_dir: str) -> dict:
    from parking_violations_data_pipeline_spark.registry import (
        REGISTRY,
        all_queries,
    )
    from parking_violations_data_pipeline_spark.session import get_spark

    all_queries()
    spark = get_spark(
        app_name=f"pvdp-conc-bench-{mode.lower()}",
        extra_conf={"spark.scheduler.mode": mode},
    )
    assert spark.conf.get("spark.scheduler.mode").upper() == mode

    def run_one(name: str) -> float:
        if mode == "FAIR":
            # one fair pool per thread (default pool config: FAIR across
            # pools, equal weights) — the job-server submission shape
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"pool_{threading.get_ident()}"
            )
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
    floors: list[float] = []

    for _ in range(N_ROUNDS):
        # zero-work job floor (bench.py protocol): makes a contended-box
        # grade self-attributing — floor.min >> ~30-40 ms means the box,
        # not the scheduler, moved
        t0 = time.perf_counter()
        spark.range(1).collect()
        floors.append(time.perf_counter() - t0)
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
    worst_med = 0.0
    for n in BENCH_QUERIES:
        s_min = min(seq[n])
        s_med = statistics.median(seq[n])
        c_med = statistics.median(conc[n])
        c_p95 = p95(conc[n])
        ratio = round(c_p95 / s_min, 2)
        ratio_med = round(c_med / s_med, 2)
        worst = max(worst, ratio)
        worst_med = max(worst_med, ratio_med)
        queries[n] = {
            "seq_min": round(s_min, 4),
            "seq_med": round(s_med, 4),
            "conc_med": round(c_med, 4),
            "conc_p95": round(c_p95, 4),
            "conc_over_seq_p95": ratio,
            "conc_med_over_seq_med": ratio_med,
        }

    seq_total_min = sum(q["seq_min"] for q in queries.values())
    report = {
        "scheduler_mode": mode,
        "queries": queries,
        "seq_total_min_s": round(seq_total_min, 3),
        "seq_wall_min_s": round(min(seq_walls), 3),
        "conc_wall_min_s": round(min(conc_walls), 3),
        "conc_wall_med_s": round(statistics.median(conc_walls), 3),
        "conc_wall_p95_s": round(p95(conc_walls), 3),
        "aggregate_speedup_minwall": round(min(seq_walls) / min(conc_walls), 2),
        "worst_conc_over_seq_p95": round(worst, 2),
        "worst_conc_med_over_seq_med": round(worst_med, 2),
        "starvation_alarm_2x": worst > 2.0,
        "starvation_alarm_med_2x": worst_med > 2.0,
        "floor": {
            "min": round(min(floors), 4),
            "med": round(statistics.median(floors), 4),
            "max": round(max(floors), 4),
        },
    }
    spark.stop()
    return report


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = sys.argv[1] if len(sys.argv) > 1 else None
    if mode:  # child: one scheduler mode per process
        print(json.dumps(run_mode(mode, sf_dir)))
        return
    import subprocess

    by_mode = {}
    for m in ("FIFO", "FAIR"):
        p = subprocess.run(
            [sys.executable, __file__, m],
            capture_output=True, text=True, check=True,
        )
        by_mode[m] = json.loads(p.stdout.strip().splitlines()[-1])
        print(m, "worst p95 ratio:", by_mode[m]["worst_conc_over_seq_p95"],
              "speedup:", by_mode[m]["aggregate_speedup_minwall"], flush=True)
    report = {
        "protocol": (
            f"{N_ROUNDS} rounds of (sequential pass, then all 9 headline "
            f"queries into a {POOL}-thread pool) at {sf_dir} on local[32], "
            "one process per scheduler mode (FIFO = Spark default, FAIR = "
            "one pool per submitting thread); per-query concurrent wall "
            "measured from pool-slot start; warm-up discarded; strict alarm "
            "= any query's concurrent p95 > 2x its sequential min; median "
            "alarm = any query's concurrent median > 2x its sequential median"
        ),
        "modes": by_mode,
    }
    out = Path(__file__).resolve().parent.parent / "CONCURRENCY_BENCH_r11.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps({m: {
        "worst_conc_over_seq_p95": r["worst_conc_over_seq_p95"],
        "worst_conc_med_over_seq_med": r["worst_conc_med_over_seq_med"],
        "aggregate_speedup_minwall": r["aggregate_speedup_minwall"],
        "starvation_alarm_2x": r["starvation_alarm_2x"],
        "starvation_alarm_med_2x": r["starvation_alarm_med_2x"],
    } for m, r in by_mode.items()}, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
