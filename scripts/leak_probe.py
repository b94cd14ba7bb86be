"""Retained-block canary: run EVERY registry entry at sf0.001 in ONE
vanilla JVM and record the persistent-RDD count after each. A rising
staircase = an operator leaking pinned blocks (localCheckpoint without
release, persist without unpersist) — the class that OOMed
q_triangle_count at entry #430 of the sf0.1 gate (round 6) and the
100x dup-cluster pipeline (round 5).

Steady-state contract: the count may breathe by ±1-2 (final-result
checkpoints linger until ContextCleaner reclaims them when Python
drops the frame) but must not climb monotonically.

Usage: python scripts/leak_probe.py [--out FILE]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    out = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    jsc = spark.sparkContext._jsc.sc()
    prev, peak = 0, 0
    results: dict[str, object] = {}
    for name in sorted(qs):
        try:
            qs[name](spark, sf).count()
        except Exception as ex:  # noqa: BLE001
            results[name] = f"ERR {type(ex).__name__}"
            continue
        n = jsc.getPersistentRDDs().size()
        if n != prev:
            print(f"{name}: persistent RDDs {prev} -> {n}", flush=True)
        prev, peak = n, max(peak, n)
        results[name] = n
    # Self-attributing final reading (round-10): the raw final count
    # depends on reclaim timing — final-result localCheckpoints
    # (dup-cluster chain) stay pinned until (a) Python drops the frame,
    # (b) py4j flushes the queued detach messages (they ride on the
    # NEXT gateway round trip, so an idle tail never flushes), and
    # (c) a JVM GC lets ContextCleaner unpersist the now-unreachable
    # RDD. A run that ENDS on those entries therefore reads high (r10
    # first pass: final 6) while identical code read 2 a round earlier.
    # Measured recipe (4 pinned checkpoints -> 0 in one cycle): python
    # GC, one dummy py4j call to flush detaches, JVM GC, short poll.
    # A residue that survives THIS is a real leak, not reclaim latency.
    import gc
    import time as _t

    post_gc = prev
    for _ in range(6):
        gc.collect()
        spark.range(1).count()  # py4j traffic flushes pending detaches
        spark._jvm.System.gc()
        _t.sleep(2.0)
        post_gc = jsc.getPersistentRDDs().size()
        if post_gc == 0:
            break
    print(f"FINAL persistent: {prev} (peak {peak}); post-GC: {post_gc}")
    if out:
        Path(out).write_text(json.dumps(
            {"final": prev, "final_post_gc": post_gc, "peak": peak,
             "per_entry": results}, indent=1))
        print(f"wrote {out}")
    # a healthy registry ends in single digits pre-GC and ~0 post-GC
    return 1 if (prev > 9 or post_gc > 2) else 0


if __name__ == "__main__":
    raise SystemExit(main())
