"""Physical-plan pins for the widen13 batch (Welch t-test, masking).
j_ivf_recall_curve is covered semantically via its in-plan invariants
(and j_ivf_knn's recall floor test); its plan is the IVF operator's,
already exercised elsewhere, and re-running the k-means build here
would triple plan-suite wall time for no new pin.
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


def test_ttest_sufficient_stats_no_join(spark):
    # the test reduces to 6 sufficient statistics: one shuffle to the
    # 2-row group table, scalar algebra after — no join, pushed filter
    p = _final_plan(spark, "d_ttest_welch")
    assert "Join" not in p
    assert "PushedFilters" in p and "purchase" in p
    assert p.count("HashAggregate") >= 2


def test_mask_pattern_profile_union_topk(spark):
    # two sources union map-side; top-k is TakeOrderedAndProject
    p = _final_plan(spark, "h_mask_funcs")
    assert "Union" in p
    assert "TakeOrderedAndProject" in p
    assert "Join" not in p
