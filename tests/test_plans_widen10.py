"""Physical-plan pins for the widen10 batch (OHLC bars, rolling active
users, windowed funnel, weighted median).
"""

from __future__ import annotations

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED

all_queries()


def _final_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MED)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-execution "Initial Plan" — keep
    # only the final plan so exchange COUNTS aren't double-counted
    return p.split("== Initial Plan ==")[0]


def test_ohlc_single_hour_shuffle(spark):
    # both rank passes and the final aggregate ride ONE hour_id
    # hash-partitioning; the filter reaches the scan
    p = _final_plan(spark, "q_ohlc_bars")
    assert p.count("Exchange hashpartitioning(hour_id") == 1
    assert "Window" in p
    assert "PushedFilters" in p and "purchase" in p


def test_rolling_active_users_bounded_explode(spark):
    # the 7-day contribution is a Generate (bounded explode), the
    # max_day bound arrives by broadcast — no cartesian anywhere
    p = _final_plan(spark, "e_rolling_active_users")
    assert "Generate explode" in p
    assert "CartesianProduct" not in p


def test_funnel_windowed_no_cartesian_no_window(spark):
    # three user-key equi-joins; the only non-equi joins are the
    # final one-row scalar combines (broadcast nested loop, not
    # CartesianProduct); no window over raw events
    p = _final_plan(spark, "q_funnel_windowed")
    assert "CartesianProduct" not in p
    assert "Window" not in p


def test_weighted_median_compressed_grain(spark):
    # the prefix-sum window runs AFTER the distinct-value aggregation
    # (agg before window), and there is no join
    p = _final_plan(spark, "d_weighted_median")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2
    assert "Window" in p
