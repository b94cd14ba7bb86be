"""Physical-plan pins for the widen11 batch (target encoding,
quantile binning, grouped split, partial-aggregate merge).
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


def test_target_encode_broadcasts_stats_no_window(spark):
    # category stats and the global mean come back by broadcast, never
    # a per-category window (one category = one partition at scale)
    p = _final_plan(spark, "l_target_encode_loo")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_quantile_binning_compressed_grain(spark):
    # prefix sum after the distinct-value aggregation; no join
    p = _final_plan(spark, "l_quantile_binning")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2
    assert "Window" in p


def test_grouped_split_no_shuffle_explosion(spark):
    # the hash-split label is map-side; the leak audit joins back as a
    # one-row broadcast — no cartesian, no sort-merge
    p = _final_plan(spark, "l_grouped_split")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_partial_agg_merge_two_levels_no_join(spark):
    # two explicit aggregation levels (shard-local then merged), the
    # decimal sum-of-squares stays inside hash aggregation
    p = _final_plan(spark, "d_partial_agg_merge")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2
    assert "Window" not in p
