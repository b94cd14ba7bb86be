"""Adversarial-fixture robustness sweep (round-6 item 1, VERDICT r5).

Runs the FULL registry + DuckDB oracle comparator (the exact driver
protocol: vanilla session, type-sensitive hash, no rows-only fallback)
against a degenerate fixture variant produced by gen_adversarial.py.

Row classification:
  ok     — Spark and oracle agree (rows + schema + value hash)
  xfail  — the entry raised an error that the expectations table in
           adversarial_expectations.py DOCUMENTS as the correct
           contract for this variant (e.g. pq_build refusing a corpus
           smaller than k). The error message must match the declared
           pattern; an xfail whose pattern stops matching turns FAIL.
  FAIL   — anything else: crash, silent wrong answer, oracle mismatch.

Usage:
    python scripts/adversarial_sweep.py <variant> [--out FILE] [--only n1,n2]
    python scripts/adversarial_sweep.py all        # every variant
"""

from __future__ import annotations

import json
import re
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402

from scripts.adversarial_expectations import EXPECTED  # noqa: E402
from tests.oracle_harness import OracleMismatch, compare_frames, duck_connect  # noqa: E402

VARIANTS = [
    "empty", "single", "allnull", "zerovar", "unicode", "dupkeys", "nullts",
    "extremes", "geoskew", "vecskew",
]


def run_variant(spark, variant: str, only=None) -> tuple[dict, int]:
    import __spark_entry__ as E

    sf_dir = str(REPO / "fixtures_adv" / variant)
    qs, oracles = E.queries(), E.oracle_sql()
    names = only or sorted(qs)
    expected = EXPECTED.get(variant, {})
    con = duck_connect(sf_dir)
    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        row: dict = {"status": None, "err": None}
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            row["spark_rows"] = len(spark_pdf)
            if name not in oracles:
                raise OracleMismatch(f"{name}: no_oracle")
            oracle_pdf = con.execute(oracles[name]).df()
            row["oracle_rows"] = len(oracle_pdf)
            compare_frames(name, spark_pdf, oracle_pdf)
            row["status"] = "ok"
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"
            row["err"] = err[:400]
            pat = expected.get(name)
            if pat is not None and re.search(pat, err, re.DOTALL):
                row["status"] = "xfail"
            else:
                row["status"] = "FAIL"
                n_fail += 1
                print(f"  FAIL [{variant}] {name}: {err[:300]}", flush=True)
                if not isinstance(e, OracleMismatch):
                    traceback.print_exc(limit=2)
        results[name] = row
    con.close()
    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    n_x = sum(1 for r in results.values() if r["status"] == "xfail")
    print(
        f"[{variant}] {n_ok} ok, {n_x} xfail, {n_fail} FAIL "
        f"of {len(names)}",
        flush=True,
    )
    return results, n_fail


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    variant = args[0] if args else "all"
    out = None
    only = None
    confs = []
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        if a.startswith("--conf="):
            # one key:value pair per flag, repeatable (round-7
            # cross-product runs: fixture x adversarial conf)
            kv = a.split("=", 1)[1]
            if ":" not in kv:
                raise SystemExit(f"--conf expects key:value, got {kv!r}")
            confs.append(kv.split(":", 1))

    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in confs:
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    variants = VARIANTS if variant == "all" else [variant]
    total_fail = 0
    t0 = time.time()
    for v in variants:
        results, n_fail = run_variant(spark, v, only)
        total_fail += n_fail
        if only and not out:
            # a subset run must never clobber the full-registry artifact
            continue
        path = out or str(REPO / f"ROBUSTNESS_r7_{v}.json")
        Path(path).write_text(json.dumps(results, indent=1))
        print(f"wrote {path}")
    print(f"total: {total_fail} FAIL in {time.time() - t0:.0f}s")
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
