"""Engine self-stability under adversarial confs (round 8, VERDICT
item 5).

oracle_stability.py pins the DuckDB side of the round-7 flake class
(NULL window keys → probabilistic oracle). This is the SPARK side of
the same question: an entry whose VALUES depend on partition count,
AQE re-planning, codegen, timezone, dialect, or Arrow batch shape is
a probabilistic gate — it can pass one conf-robustness sweep and fail
the next, because each sweep runs it once. The detector: under EACH of
the seven CONF_ROBUST confs, run every order-risk entry TWICE in the
same session and hash-compare the canonicalized results; any run-pair
divergence is a nondeterminism bug regardless of what the oracle says.

The order-risk subset is selected mechanically (AST-free, source
scan): entries whose implementation uses window functions, positional
aggregation (collect_list/first/last), limit-without-total-order
shapes, or streaming choreography — the constructs whose output CAN
legally vary with execution order. Entries outside the subset compute
order-free aggregates whose canonical sort makes any row-order change
invisible to the comparator.

Usage:
    python scripts/engine_stability.py [--confs=a,b] [--out=FILE]
        [--sf=/root/testdata/sf0.01] [--runs=2]
"""

from __future__ import annotations

import hashlib
import inspect
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CONFS: dict[str, dict[str, str]] = {
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "shuf1": {"spark.sql.shuffle.partitions": "1"},
    "shuf97": {"spark.sql.shuffle.partitions": "97"},
    "nocodegen": {"spark.sql.codegen.wholeStage": "false"},
    "tokyo": {"spark.sql.session.timeZone": "Asia/Tokyo"},
    "noansi": {"spark.sql.ansi.enabled": "false"},
    "arrow1": {"spark.sql.execution.arrow.maxRecordsPerBatch": "1"},
}

RISK_MARKERS = (
    "Window",
    "collect_list",
    "collect_set",
    "F.first",
    "F.last",
    "row_number",
    "rank(",
    "ntile",
    "lag(",
    "lead(",
    "limit(",
    "monotonically_increasing",
    "foreachBatch",
    "writeStream",
    "mapInPandas",
    "applyInPandas",
)


def result_hash(name: str, pdf) -> str:
    from tests.oracle_harness import canon

    c = canon(name, "spark", pdf)
    return hashlib.md5(
        c.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    confs = list(CONFS)
    out = None
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--confs="):
            confs = a.split("=", 1)[1].split(",")
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])

    from pyspark.sql import SparkSession

    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

    all_queries()
    subset = sorted(
        name
        for name, q in REGISTRY.items()
        if any(m in inspect.getsource(q.fn) for m in RISK_MARKERS)
    )
    print(f"# order-risk subset: {len(subset)}/{len(REGISTRY)} entries", file=sys.stderr)

    report: dict[str, dict] = {}
    overall_unstable = 0
    for cname in confs:
        builder = (
            SparkSession.builder.master("local[8]")
            .appName(f"engine-stability-{cname}")
            .config("spark.ui.showConsoleProgress", "false")
        )
        for k, v in CONFS[cname].items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm

        unstable: dict[str, list[str]] = {}
        err: dict[str, str] = {}
        t0 = time.time()
        for name in subset:
            try:
                hashes = [
                    result_hash(name, REGISTRY[name].fn(spark, sf_dir).toPandas())
                    for _ in range(runs)
                ]
                if len(set(hashes)) != 1:
                    unstable[name] = hashes
                    print(f"  UNSTABLE[{cname}] {name}: {hashes}", flush=True)
            except Exception as e:  # noqa: BLE001
                err[name] = f"{type(e).__name__}: {str(e)[:200]}"
                print(f"  ERR[{cname}] {name}: {err[name][:120]}", flush=True)
        report[cname] = {
            "subset": len(subset),
            "runs": runs,
            "unstable": unstable,
            "errors": err,
            "secs": round(time.time() - t0, 1),
        }
        overall_unstable += len(unstable) + len(err)
        print(
            f"# {cname}: {len(unstable)} unstable, {len(err)} errors"
            f" in {report[cname]['secs']}s",
            flush=True,
        )
        spark.stop()

    if out:
        Path(out).write_text(json.dumps(report, indent=1))
    print(json.dumps({c: {"unstable": len(r["unstable"]), "errors": len(r["errors"])} for c, r in report.items()}))
    return 1 if overall_unstable else 0


if __name__ == "__main__":
    sys.exit(main())
