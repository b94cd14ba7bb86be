"""Scaling-exponent measurement: time the linear-class heavy ops at
two scale points built from the SAME generator in ONE warm session,
and report the fitted log-log growth exponent per op.

exponent = log(t_hi / t_lo) / log(hi / lo)
  ~1.0  -> linear (shuffle-bound with healthy parallelism)
  <1.0  -> sub-linear (fixed overhead still amortizing)
  >1.3  -> superlinear — a plan that will NOT survive 100 TB

The dup-pipeline ops (minhash, sim-self-join, triangle count) are
EXCLUDED by design: on a key-shifted replicated corpus their true
output pair mass grows quadratically in the copy factor, so a time
exponent against rows conflates output growth with plan growth —
SCALE_SMOKE.md's dedicated pair-mass tables cover them.

Usage:
    python scripts/scale_exponents.py [--lo=100] [--hi=1000] [--out=FILE]

Builds .tmp/scale10 at each factor via scale_smoke.build (key-shifted
replication of sf0.1). Timing protocol: warm the JVM with q1 at each
scale point and discard, then time each op once (these ops run 5-300 s
at these scales — run-to-run noise is small relative to a 10x scale
step, and one pass keeps the whole protocol under an hour).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OPS = [
    "q1_pricing_summary",   # scan + exact-cents agg
    "q5_region_revenue",    # 6-way join
    "c_sort_merge_join",    # large-large SMJ
    "q_window_rank",        # global-ish window
    "q_sessionize",         # two window passes, one user shuffle
    "q_word_count",         # explode + groupBy
    "q_knn_cosine",         # brute-force cosine top-k
    "g_dedup_exact",        # hash-distinct
    "etl_deletion_vectors", # per-file position bitmap (r7 rework)
    "s_chunked_replay",     # 4 micro-batch replay (r7 rework)
    "etl_scd2_merge",       # dimension merge
    "q_events_hourly",      # ns-ts scan + hour rollup
]


def main() -> None:
    lo, hi, out_path = 100, 1000, None
    for a in sys.argv[1:]:
        if a.startswith("--lo="):
            lo = int(a.split("=", 1)[1])
        elif a.startswith("--hi="):
            hi = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    import scripts.scale_smoke as SS
    from parking_violations_data_pipeline_spark.registry import (
        REGISTRY,
        all_queries,
    )
    from parking_violations_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-exponents")
    all_queries()
    results: dict[str, dict] = {name: {} for name in OPS}

    base_out = SS.OUT
    for copies in (lo, hi):
        SS.COPIES = copies
        # a DISTINCT directory per scale point: Spark's file-listing
        # cache has an infinite TTL and refreshByPath does not reach
        # the V2 parquet read path, so re-using one dir across a
        # rmtree+rebuild fails FILE_NOT_EXIST on the stale listing
        SS.OUT = f"{base_out}_x{copies}"
        shutil.rmtree(SS.OUT, ignore_errors=True)
        t0 = time.perf_counter()
        SS.build(spark)
        print(f"# built {copies}x in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        # JVM/code-path warmup at this scale point; discarded
        REGISTRY["q1_pricing_summary"].fn(spark, SS.OUT).count()
        for name in OPS:
            t0 = time.perf_counter()
            n = REGISTRY[name].fn(spark, SS.OUT).count()
            sec = round(time.perf_counter() - t0, 2)
            results[name][f"t{copies}"] = sec
            results[name][f"rows{copies}"] = n
            print(f"# {copies}x {name}: {sec}s ({n} rows)", file=sys.stderr)

    for name, r in results.items():
        if r.get(f"t{lo}") and r.get(f"t{hi}"):
            r["exponent"] = round(
                math.log(r[f"t{hi}"] / r[f"t{lo}"]) / math.log(hi / lo), 3
            )
    payload = {"lo": lo, "hi": hi, "src": SS.SRC, "ops": results}
    print(json.dumps(payload))
    if out_path:
        Path(out_path).write_text(json.dumps(payload, indent=1))
    spark.stop()
    # the hi-point dataset is ~26 GB — reclaim it (scale_smoke rebuilds
    # any factor on demand)
    for copies in (lo, hi):
        shutil.rmtree(f"{base_out}_x{copies}", ignore_errors=True)


if __name__ == "__main__":
    main()
