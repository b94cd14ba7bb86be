"""Physical-plan regression tests: the scale-critical plan properties
(pushdown, pruning, broadcast vs sort-merge, no accidental cartesian,
codegen) must not silently regress. These assert on the executed plan
string — the same thing a human checks with .explain("formatted").
"""

from __future__ import annotations

import pytest

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED

all_queries()


def _final_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MED)
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    p = _final_plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # only the 7 needed columns reach the scan (of 11)
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]
    assert "Batched: true" in p  # vectorized parquet reader


def test_q1_codegen_and_partial_agg(spark):
    p = _final_plan(spark, "q1_pricing_summary")
    assert "*(" in p  # whole-stage codegen spans
    assert p.count("HashAggregate") >= 2  # partial + final (map-side combine)


def test_q3_broadcasts_filtered_dims(spark):
    p = _final_plan(spark, "q3_top_orders")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p  # top-k without global sort
    assert "CartesianProduct" not in p


def test_q5_all_dims_broadcast_no_smj(spark):
    p = _final_plan(spark, "q5_region_revenue")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p


def test_sort_merge_join_is_smj(spark):
    p = _final_plan(spark, "c_sort_merge_join")
    assert "SortMergeJoin" in p  # merge hint respected for the fact-fact join


def test_knn_has_no_join_stage(spark):
    p = _final_plan(spark, "q_knn_cosine")
    assert "Join" not in p
    assert "TakeOrderedAndProject" in p


def test_semi_anti_join_strategies(spark):
    psemi = _final_plan(spark, "c_semi_join")
    panti = _final_plan(spark, "c_anti_join")
    assert "LeftSemi" in psemi
    assert "LeftAnti" in panti


def test_word_count_partial_agg(spark):
    p = _final_plan(spark, "q_word_count")
    assert p.count("HashAggregate") >= 2  # explode output combined map-side


@pytest.mark.parametrize("name", ["b_filter_between", "b_filter_set_pattern"])
def test_filters_reach_parquet(spark, name):
    p = _final_plan(spark, name)
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p


def test_bucketed_join_has_no_exchange(spark):
    df = REGISTRY["c_bucketed_join"].fn(spark, SF_MED)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]  # AQE prints the pre-AQE plan after the final one
    assert "SortMergeJoin" in final
    assert "Bucketed: true" in final
    join_subtree = final.split("SortMergeJoin")[1]
    assert "Exchange" not in join_subtree  # co-located: bucket layout replaces the shuffle


def test_q1_money_is_integer_fixed_point(spark):
    """The exact money path must keep per-row arithmetic in int64
    (whole-stage codegen) and accumulate via the round-5 split scheme:
    TWO plain long sums (u div 1e6 / u mod 1e6) with the decimal
    reconstruction Σq·1e6 + Σr running once per GROUP. A regression to
    per-row decimal multiplies OR to a per-row decimal(38,0) sum is a
    measured slowdown (26% on q1 at sf0.1); a regression to a single
    bare long sum is an overflow at 100-TB group sizes."""
    import re

    p = _final_plan(spark, "q1_pricing_summary")
    # split accumulators present in the aggregate: a mod-1e6 long sum
    # (tolerate formatting/paren variants across Spark versions)
    assert re.search(r"%\s*1000000", p), "mod-1e6 split accumulator missing"
    # no per-row decimal aggregation buffer: inspect the AGGREGATE
    # EXPRESSIONS of the optimized logical plan (stable API objects,
    # not plan-string formatting) — every sum() buffer must be
    # bigint/double, never decimal
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_MED)
    qe = df._jdf.queryExecution()
    lp = qe.optimizedPlan().toString()
    agg_line = next(ln for ln in lp.splitlines() if "Aggregate [" in ln)

    def _sum_args(text):
        """Balanced-paren extraction of every sum(...) argument —
        stable against plan-string formatting, unlike a fixed regex."""
        out = []
        i = 0
        while True:
            i = text.find("sum(", i)
            if i < 0:
                return out
            depth, j = 0, i + 3
            while j < len(text):
                depth += text[j] == "("
                depth -= text[j] == ")"
                if depth == 0:
                    break
                j += 1
            out.append(text[i + 4 : j])
            i = j

    sums = _sum_args(agg_line)
    assert sums, "no sum() aggregates found in the optimized Aggregate node"
    decimal_sums = [s for s in sums if "as decimal" in s]
    assert not decimal_sums, decimal_sums
    # the per-group decimal reconstruction of the hi part exists in the
    # optimized logical plan (executedPlan truncates result exprs);
    # tolerate spacing variants
    assert re.search(r"decimal\(38,\s*0\)\)?\s*\*\s*1000000", lp)


def test_jdbc_scan_is_partitioned(spark):
    """The Derby round trip must read back as a PARTITIONED JDBC scan
    (numPartitions=4) — a single-partition JDBC read serializes the
    whole pull through one task at scale."""
    df = REGISTRY["etl_jdbc_roundtrip"].fn(spark, SF_MED)
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation(nation_jdbc) [numPartitions=4]" in scan


def test_q6_pure_pushdown_no_join(spark):
    """Q6 is the pushdown showcase: every predicate reaches the scan,
    no join/window anywhere, partial+final agg."""
    p = _final_plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2


def test_q8_market_share_broadcasts_dims(spark):
    p = _final_plan(spark, "q8_market_share")
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p


def test_q19_bracket_disjunction_still_pushes_common_filters(spark):
    """The OR-of-AND-brackets must not defeat pushdown of the shared
    predicates (part join keys prune; lineitem qty/part filters)."""
    p = _final_plan(spark, "q19_bracket_revenue")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_contamination_broadcasts_benchmark_set(spark):
    """The benchmark shingle side must broadcast — the corpus side of
    a decontamination join is never shuffled at 100 TB."""
    p = _final_plan(spark, "t_contamination")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_scd2_merge_no_cartesian_single_key_shuffle(spark):
    p = _final_plan(spark, "etl_scd2_merge")
    assert "CartesianProduct" not in p
    assert "LeftAnti" in p  # unchanged/inserts branches are anti-joins
