"""Capture .explain('formatted') for named registry entries into
plans/r12/<name>_<suffix>.txt (round-12 optimization evidence).

Usage:
    python scripts/r12_capture_plans.py before q1_pricing_summary q3_top_orders ...
    python scripts/r12_capture_plans.py after --all-headliners
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402

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


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    extra = [a for a in names if a.startswith("--sf=")]
    if extra:
        sf_dir = extra[0].split("=", 1)[1]
        names = [a for a in names if not a.startswith("--sf=")]
    if "--all-headliners" in names:
        names = HEADLINERS + [n for n in names if n != "--all-headliners"]

    import __spark_entry__ as E

    qs = E.queries()
    spark = get_spark(app_name="r12-plans")
    outdir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = outdir / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print(f"wrote {p} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
