"""Spill-attributed scaling exponents (round 8, VERDICT item 1).

Round 7 left three 100x->1000x exponents above the n-log-n band
(c_sort_merge_join 1.37, q_window_rank 1.26, q5_region_revenue 1.25)
with the curvature UNATTRIBUTED: a second same-day session re-timed
them ~linear (SCALE_KNOB_r7), which smells like page-cache state, but
smell is not attribution. This probe makes the measurement
self-attributing:

  - N interleaved repeats per (op, scale): suite order op1..opK, then
    again — a cache/co-tenant burst taxes one REPEAT, not one op's
    whole triplet; the exponent is fitted on the per-op MIN (the
    least-contended pass) and the med/max band is reported alongside;
  - per-run executor task metrics from the UI REST API (the probe
    session runs with spark.ui.enabled=true): memoryBytesSpilled,
    diskBytesSpilled, peakExecutionMemory summed over exactly the
    stages the run created — if time curves superlinearly while spill
    per input row stays flat, the residual is IO/cache variance, not
    a plan defect; if spill per row GROWS, the plan genuinely degrades
    and the partition knob is the fix to pin.

Usage:
    python scripts/spill_probe.py [--copies=100,1000] [--reps=3]
        [--ops=a,b,c] [--partitions=32] [--out=FILE]

Datasets are scale_smoke.build key-shifted replicas of sf0.1 in
.tmp/scale10_x{copies} (built if missing, LEFT IN PLACE for follow-up
probes; remove by hand when done — the 1000x build is ~26 GB).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_OPS = ["c_sort_merge_join", "q_window_rank", "q5_region_revenue"]
UI_PORT = 4056


def _stages(app_id: str) -> list[dict]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    return json.load(urllib.request.urlopen(url))


def main() -> None:
    copies_list, reps, ops, out_path, partitions = [100, 1000], 3, DEFAULT_OPS, None, 32
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            copies_list = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--ops="):
            ops = a.split("=", 1)[1].split(",")
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--partitions="):
            partitions = int(a.split("=", 1)[1])

    import scripts.scale_smoke as SS
    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries
    from parking_violations_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="spill-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.sql.shuffle.partitions": str(partitions),
            # keep the executor-side story in one place: local mode =
            # one JVM, so driver memory IS the execution memory pool
        },
    )
    all_queries()
    app_id = spark.sparkContext.applicationId

    base_out = SS.OUT
    results: dict[str, dict] = {op: {} for op in ops}
    meta = {
        "reps": reps,
        "partitions": partitions,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "8"),
    }

    for copies in copies_list:
        SS.COPIES = copies
        SS.OUT = f"{base_out}_x{copies}"
        if not os.path.exists(f"{SS.OUT}/lineitem.parquet"):
            shutil.rmtree(SS.OUT, ignore_errors=True)
            t0 = time.perf_counter()
            SS.build(spark)
            print(f"# built {copies}x in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        # warm the JVM/codegen at this scale point; discarded
        REGISTRY["q1_pricing_summary"].fn(spark, SS.OUT).count()

        for op in ops:
            results[op].setdefault(f"t{copies}", [])
            results[op].setdefault(f"spill_disk{copies}", [])
            results[op].setdefault(f"spill_mem{copies}", [])
            results[op].setdefault(f"peak_exec_mem{copies}", [])

        for rep in range(reps):
            for op in ops:
                seen = {s["stageId"] for s in _stages(app_id)}
                t0 = time.perf_counter()
                n = REGISTRY[op].fn(spark, SS.OUT).count()
                sec = time.perf_counter() - t0
                new = [s for s in _stages(app_id) if s["stageId"] not in seen]
                disk = sum(s.get("diskBytesSpilled", 0) for s in new)
                mem = sum(s.get("memoryBytesSpilled", 0) for s in new)
                peak = max((s.get("peakExecutionMemory", 0) for s in new), default=0)
                results[op][f"t{copies}"].append(round(sec, 2))
                results[op][f"spill_disk{copies}"].append(disk)
                results[op][f"spill_mem{copies}"].append(mem)
                results[op][f"peak_exec_mem{copies}"].append(peak)
                results[op][f"rows{copies}"] = n
                print(
                    f"# {copies}x rep{rep} {op}: {sec:.1f}s"
                    f" disk_spill={disk/1e9:.2f}GB mem_spill={mem/1e9:.2f}GB"
                    f" peak={peak/1e9:.2f}GB ({n} rows)",
                    file=sys.stderr,
                )

    lo, hi = copies_list[0], copies_list[-1]
    for op, r in results.items():
        tl, th = r.get(f"t{lo}"), r.get(f"t{hi}")
        if tl and th and lo != hi:
            for stat, pick in (("min", min), ("med", lambda x: sorted(x)[len(x) // 2])):
                r[f"exponent_{stat}"] = round(
                    math.log(pick(th) / pick(tl)) / math.log(hi / lo), 3
                )
            # spill per input row at each scale: the attribution signal
            dl = sum(r[f"spill_disk{lo}"]) / max(1, len(r[f"spill_disk{lo}"]))
            dh = sum(r[f"spill_disk{hi}"]) / max(1, len(r[f"spill_disk{hi}"]))
            r["disk_spill_ratio"] = round(dh / dl, 2) if dl else None

    payload = {"lo": lo, "hi": hi, "meta": meta, "ops": results}
    print(json.dumps(payload))
    if out_path:
        Path(out_path).write_text(json.dumps(payload, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
