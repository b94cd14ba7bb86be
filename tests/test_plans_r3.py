"""Physical-plan pins for the round-3 additions (TPC-H completion +
corpus/mining ops) — same contract as test_plans.py: the scale-critical
properties a human would check with .explain("formatted") must not
silently regress.
"""

from __future__ import annotations

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED

all_queries()


def _final_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MED)
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_q2_broadcasts_dims_no_cartesian(spark):
    p = _final_plan(spark, "q2_min_cost_supplier")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2  # partial+final min agg


def test_q11_single_fact_shuffle(spark):
    p = _final_plan(spark, "q11_important_stock")
    assert "BroadcastHashJoin" in p  # supplier set and 1-row total both broadcast
    assert "SortMergeJoin" not in p


def test_q12_filters_reach_scan(spark):
    p = _final_plan(spark, "q12_late_lines_priority")
    # flag IN-list and shipdate window push to the lineitem scan;
    # the cross-table lateness predicate stays post-join
    assert "PushedFilters: [" in p and "In(l_returnflag" in p
    assert p.count("HashAggregate") >= 2


def test_q20_part_filter_broadcasts(spark):
    p = _final_plan(spark, "q20_dominant_suppliers")
    assert "BroadcastHashJoin" in p
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_q21_semi_then_anti(spark):
    p = _final_plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p  # top-100 without global sort


def test_doc_chunk_is_pure_map(spark):
    p = _final_plan(spark, "j_doc_chunk")
    assert "Generate" in p  # the explode
    assert "Join" not in p  # chunking never joins/shuffles except the output sort


def test_unigram_logprob_broadcasts_vocab(spark):
    p = _final_plan(spark, "j_unigram_logprob")
    assert "BroadcastHashJoin" in p  # vocab + total stay broadcast
    assert "SortMergeJoin" not in p


def test_token_entropy_two_combined_shuffles(spark):
    p = _final_plan(spark, "j_token_entropy")
    # stacked (doc,w) -> doc aggs: exactly two hash exchanges, BOTH fed
    # by map-side partial aggregates. (A single-shuffle variant exists —
    # repartition(doc_id) up front — but it ships every raw token
    # uncombined; two combined shuffles move strictly less data at
    # scale, so that plan, not the 1-exchange one, is the pin.)
    final = p.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert final.count("Exchange hashpartitioning") == 2
    assert final.count("HashAggregate") == 4  # partial+final at each level


def test_histogram_partial_agg(spark):
    p = _final_plan(spark, "d_value_histogram")
    assert p.count("HashAggregate") >= 2
    assert "Join" not in p


def test_rfm_broadcasts_scalar_max(spark):
    p = _final_plan(spark, "q_rfm_segments")
    assert "SortMergeJoin" not in p  # 1-row max broadcasts


def test_anomaly_zscore_broadcasts_stats(spark):
    p = _final_plan(spark, "e_anomaly_zscore")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_embedding_quantize_broadcasts_ranges(spark):
    p = _final_plan(spark, "j_embedding_quantize")
    assert "Generate" in p  # posexplode
    assert "BroadcastHashJoin" in p  # 64-row per-dim ranges
    assert "SortMergeJoin" not in p


def test_nullsafe_join_still_broadcasts(spark):
    p = _final_plan(spark, "c_nullsafe_join")
    assert "BroadcastHashJoin" in p  # null-safe key doesn't demote the BHJ
    assert "CartesianProduct" not in p


def test_winsorize_broadcasts_quantiles(spark):
    p = _final_plan(spark, "etl_winsorize")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert p.count("HashAggregate") >= 2


def test_grouped_map_is_arrow_exchange(spark):
    p = _final_plan(spark, "k_grouped_map")
    assert "FlatMapGroupsInPandas" in p  # the documented Python boundary


def test_time_range_frame_no_join(spark):
    p = _final_plan(spark, "e_time_range_frames")
    assert "Window" in p
    assert "Join" not in p


def test_dedup_end_to_end_no_cartesian(spark):
    p = _final_plan(spark, "t_dedup_end_to_end")
    # pair generation is the shingle equi-join; removal is an anti join
    assert "CartesianProduct" not in p
    assert "LeftAnti" in p
