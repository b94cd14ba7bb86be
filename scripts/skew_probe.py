"""C10 skew-at-scale probe (round-7 item 7, VERDICT r6).

The gate exercises c_skew_salted_join at fixture scale where skew is
mild. Here we synthesize a genuinely hot key — ONE key owning ~30% of
a 100x fact — and measure the thing salting actually buys: per-task
time balance in the join stage, salted vs plain-AQE, at identical
results.

Measurement is from Spark's own task metrics (REST API
/api/v1/applications/<id>/stages), not wall-clock faith: for the
slowest stage of each variant we report task-duration quantiles and
the max/median ratio — the straggler factor a 1000-executor cluster
would feel as a stage tail.

Usage: python scripts/skew_probe.py [scale_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parking_violations_data_pipeline_spark.catalog import load_table  # noqa: E402
from parking_violations_data_pipeline_spark.operators.skew import salted_join  # noqa: E402
from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".tmp", "scale10")
FACT = os.path.join(REPO, ".tmp", "skew_fact")


def rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1{path}", timeout=30) as r:
        return json.load(r)


def stage_tail(spark, app_id: str, after_stage: int) -> dict:
    """Task-duration spread of the heaviest completed stage with
    id > after_stage (the variant's own stages only)."""
    stages = rest(spark, f"/applications/{app_id}/stages?status=complete")
    mine = [s for s in stages if s["stageId"] > after_stage]
    if not mine:
        return {}
    worst = None
    for s in mine:
        sid = s["stageId"]
        try:
            q = rest(
                spark,
                f"/applications/{app_id}/stages/{sid}/0/taskSummary"
                "?quantiles=0.0,0.5,0.95,1.0",
            )
        except Exception:
            continue
        dur = q.get("duration") or [0, 0, 0, 0]
        med = dur[1] or 1.0
        row = {
            "stage": sid,
            "n_tasks": s.get("numCompleteTasks"),
            "task_ms_min": dur[0],
            "task_ms_median": dur[1],
            "task_ms_p95": dur[2],
            "task_ms_max": dur[3],
            "straggler_ratio": round(dur[3] / med, 2),
        }
        # the straggler story lives in the stage with the most
        # UNBALANCED tasks (the reduce/join stage), not the stage with
        # the longest task (often the balanced 8-task scan); ignore
        # noise stages (trivial medians or singleton task counts)
        if (row["n_tasks"] or 0) >= 4 and row["task_ms_max"] >= 50:
            if worst is None or row["straggler_ratio"] > worst["straggler_ratio"]:
                worst = row
    return worst or {}


def last_stage_id(spark, app_id: str) -> int:
    stages = rest(spark, f"/applications/{app_id}/stages")
    return max((s["stageId"] for s in stages), default=-1)


def main() -> None:
    spark = get_spark(
        app_name="skew-probe",
        extra_conf={"spark.ui.enabled": "true"},  # task metrics via REST
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    report: dict = {"src": SRC}

    if not os.path.exists(FACT) or os.environ.get("SKEW_REBUILD"):
        ev = load_table(spark, SRC, "events").filter(F.col("ts").isNotNull())
        # ~30% of rows land on ONE key; the rest spread over 1000 keys
        fact = ev.select(
            F.when(F.pmod(F.col("event_id"), F.lit(10)) < 3, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("event_id"), F.lit(1000)) + 1)
            .alias("k"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        fact.write.mode("overwrite").parquet(FACT)

    fact = spark.read.parquet(FACT)
    n = fact.count()
    hot = fact.filter(F.col("k") == 0).count()
    report["fact_rows"] = n
    report["hot_share"] = round(hot / n, 3)

    dim = spark.range(0, 1001).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 7 + 1).cast("long").alias("w"),
    )
    # deny broadcast so both variants genuinely shuffle the fact
    dim_big = dim.hint("shuffle_hash")

    def run(label: str, make):
        t0 = time.perf_counter()
        before = last_stage_id(spark, app_id)
        out = make()
        rows = out.orderBy("k").limit(5).collect()
        sec = round(time.perf_counter() - t0, 2)
        tail = stage_tail(spark, app_id, before)
        report[label] = {"sec": sec, "sample": [tuple(r) for r in rows], **tail}

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # enough reduce partitions that a balanced key is SMALL — the hot
    # key then shows as the single fat task a cluster would feel
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    # variant 0 (control): plain shuffle join with NO mitigation — the
    # straggler this whole operator class exists to kill (coalescing
    # off too: it is itself an AQE mitigation)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    run(
        "unmitigated",
        lambda: fact.join(dim_big, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("cents") * F.col("w")).alias("wc")),
    )

    # variant A: plain shuffle join, full AQE ON (Spark's own tools)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    run(
        "plain_aqe_skewjoin",
        lambda: fact.join(dim_big, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("cents") * F.col("w")).alias("wc")),
    )

    # variant B: explicit salting (salt=16), AQE skew-join OFF so the
    # balance comes from the salt alone
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run(
        "salted_16",
        lambda: salted_join(fact, dim, on=["k"], salt=16)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("cents") * F.col("w")).alias("wc")),
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    # equality of results (full, not sample)
    a = (
        fact.join(dim, "k").groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("cents") * F.col("w")).alias("wc"))
    )
    b = (
        salted_join(fact, dim, on=["k"], salt=16).groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("cents") * F.col("w")).alias("wc"))
    )
    report["results_equal"] = (
        a.exceptAll(b).limit(1).count() == 0
        and b.exceptAll(a).limit(1).count() == 0
    )

    print(json.dumps(report, indent=1, default=str))


if __name__ == "__main__":
    main()
