"""Physical-plan pins for the widen9 batch (runtime bloom-filter join,
VARIANT access, collations, null ordering) — the .explain properties
that must survive a 100× scale-up.
"""

from __future__ import annotations

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED

all_queries()


def _final_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MED)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_join_broadcasts_at_tiny_sf(spark):
    # hint-free by design: at this SF the filtered dim is tiny, so the
    # right plan is a broadcast join (bloom pruning would be pure
    # overhead); the scale regime is pinned in the next test
    p = _final_plan(spark, "c_bloom_pruned_join")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bloom_filter_injected_in_scale_regime(spark):
    # the 100 TB regime: build side too big to broadcast, application
    # side clears the scan-size threshold — Catalyst must inject the
    # runtime bloom filter so the fact scan gains might_contain(...)
    # and non-joining rows die before the shuffle
    conf = spark.conf
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = REGISTRY["c_bloom_pruned_join"].fn(spark, SF_MED)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in p
        assert "SortMergeJoin" in p
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_variant_single_pass_no_join(spark):
    # parse-once typed extraction: one scan, partial+final aggregate,
    # nothing else
    p = _final_plan(spark, "h_variant_funcs")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2 or "SortAggregate" in p


def test_collation_single_scan(spark):
    p = _final_plan(spark, "h_collation_compare")
    assert "Join" not in p
    assert "Exchange" in p  # global aggregate still needs one merge


def test_null_ordering_explicit_in_sort(spark):
    # both orderings must be pinned explicitly in the executed sorts
    p = _final_plan(spark, "f_null_ordering")
    assert "NULLS FIRST" in p
    assert "NULLS LAST" in p
