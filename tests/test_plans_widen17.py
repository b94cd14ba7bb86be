"""Physical-plan pins for the widen17 batch (bitmap distinct, batch
session_window, sequential folds).
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


def test_bitmap_distinct_mergeable_no_expand(spark):
    # bitmap path must NOT fall back to count(DISTINCT)'s Expand plan:
    # two aggregation levels per key (bucket bitmaps, then popcount
    # sum), no Expand operator anywhere
    p = _final_plan(spark, "h_bitmap_distinct")
    assert "bitmap_construct_agg" in p or "bitmap_count" in p
    assert "Expand" not in p


def test_session_window_is_native_operator(spark):
    # the gap-merge happens inside the aggregation (session_window
    # expression), not via lag/prefix-sum windows
    p = _final_plan(spark, "q_session_window_fn")
    assert "session_window" in p
    assert "Window" not in p  # no manual window scaffolding


def test_ewma_fold_jvm_side_no_python(spark):
    # the recursion runs as a higher-order aggregate over per-key
    # arrays: no BatchEvalPython / ArrowEvalPython in the plan
    p = _final_plan(spark, "e_ewma_fold")
    assert "EvalPython" not in p
    assert "aggregate(" in p or "Aggregate" in p


def test_clamped_fold_single_user_shuffle(spark):
    p = _final_plan(spark, "q_clamped_balance_fold")
    assert "EvalPython" not in p
    assert p.count("Exchange hashpartitioning(user_id") == 1
