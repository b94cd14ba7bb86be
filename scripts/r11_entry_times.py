"""Spark-only per-entry timing (round-11 optimization measurement).

The driver-gate per-entry `ms` conflates Spark query + DuckDB oracle +
pandas compare, so it cannot attribute cost to the engine. This script
times ONLY the Spark side of each registry entry: plan build +
execution to a noop sink (guide §1.4 — computes every column of every
row, no sink/driver-transfer cost, full plan visible). One warm-up
entry, then each entry timed `--repeats` times (default 1), min kept.

Usage:
    python scripts/r11_entry_times.py [sf_dir] --out=FILE \
        [--only=n1,n2] [--repeats=N] [--skip-streaming]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out = None
    only = None
    repeats = 1
    skip_streaming = "--skip-streaming" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        if a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])

    import __spark_entry__ as E

    qs = E.queries()
    names = only or sorted(qs)
    if skip_streaming:
        names = [n for n in names if not n.startswith("s_")]

    spark = get_spark(app_name="r11-entry-times")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # JVM warm-up

    def scrub() -> None:
        try:
            spark.catalog.clearCache()
            it = (
                spark.sparkContext._jsc.sc()
                .getPersistentRDDs()
                .values()
                .iterator()
            )
            while it.hasNext():
                it.next().unpersist(False)
        except Exception:
            pass

    results: dict[str, dict] = {}
    t_all = time.time()
    for name in names:
        best = None
        err = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                spark.sparkContext.setJobDescription(f"r11-time:{name}")
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"[:200]
                break
            finally:
                spark.sparkContext.setJobDescription(None)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            scrub()
        results[name] = {"ms": None if best is None else int(best * 1000), "err": err}
        print(f"  {results[name]['ms']} ms  {name}" + (f"  ERR {err}" if err else ""), flush=True)
    print(f"\n{len(names)} entries in {time.time() - t_all:.0f}s", flush=True)
    if out:
        Path(out).write_text(json.dumps(
            {"sf_dir": sf_dir, "cpus": os.environ.get("SPARK_GRAFT_CPUS"), "entries": results},
            indent=1,
        ))
        print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
