"""Full-registry driver simulation: run EVERY registered query pair at
sf0.01 with a vanilla SparkSession (no engine confs — the driver builds
its own session) and compare through the driver-faithful pandas
comparator (type-sensitive hash, list-cell crash, no rows-only
fallback). Writes a CORRECTNESS-shaped JSON and exits non-zero on any
red row.

Usage:
    python scripts/driver_gate.py [sf_dir] [--out FILE] [--only n1,n2]
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_harness import OracleMismatch, compare_frames, duck_connect  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out = None
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")

    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # --conf=k:v — one pair per flag, repeatable. A comma-joined list
    # (--conf=k:v,k:v) is still accepted for back-compat, but ONLY when
    # every comma-piece parses as k:v; otherwise the commas are treated
    # as part of the value (extraJavaOptions, csv-style lists).
    for a in sys.argv[1:]:
        if a.startswith("--conf="):
            raw = a.split("=", 1)[1]
            pieces = raw.split(",")
            if len(pieces) > 1 and all(":" in p for p in pieces):
                pairs = pieces
            else:
                pairs = [raw]
            for kv in pairs:
                if ":" not in kv:
                    raise SystemExit(
                        f"--conf expects key:value, got {kv!r}"
                    )
                k, v = kv.split(":", 1)
                builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    names = only or sorted(qs)
    # Warm the JVM before the timed loop: without this the FIRST entry
    # absorbs ~5-8 s of executor spin-up + codegen bootstrap, which
    # poisons its recorded ms (measured: d_moments_exact 9.2 s when
    # listed first via --only, 0.7 s warm — a phantom 'regression').
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def scrub_retained() -> None:
        """Drop blocks an entry left cached/checkpointed: entries are
        self-contained, so anything still pinned after toPandas() is
        dead weight — 477 entries' worth of it starved a later sort of
        execution memory (q_triangle_count UNABLE_TO_ACQUIRE_MEMORY at
        sf0.1). This is what any multi-tenant job server does between
        jobs; the per-operator releases are still the real fix, this
        is the backstop."""
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
    con = duck_connect(sf_dir)
    results: dict[str, dict] = {}
    t0 = time.time()
    n_fail = 0
    for name in names:
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        t_entry = time.time()
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            row["spark_rows"] = len(spark_pdf)
            if name not in oracles:
                raise OracleMismatch(f"{name}: no_oracle — permanently red under driver protocol")
            oracle_pdf = con.execute(oracles[name]).df()
            row["oracle_rows"] = len(oracle_pdf)
            compare_frames(name, spark_pdf, oracle_pdf)
            row.update(rows_match=True, schema_match=True, hash_match=True)
            print(f"  ok   {name} ({row['spark_rows']} rows)", flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            row["err"] = f"{type(e).__name__}: {e}"
            print(f"  FAIL {name}: {row['err'][:300]}", flush=True)
            if not isinstance(e, OracleMismatch):
                traceback.print_exc(limit=3)
        # per-entry wall time (Spark query + oracle + compare): the
        # registry-wide perf budget — diffed round-over-round to flag
        # silent regressions outside the 9 benched headliners
        row["ms"] = int((time.time() - t_entry) * 1000)
        results[name] = row
        scrub_retained()
    con.close()
    dt = time.time() - t0
    print(f"\n{len(names) - n_fail}/{len(names)} green in {dt:.0f}s", flush=True)
    if out:
        Path(out).write_text(json.dumps(results, indent=1))
        print(f"wrote {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
