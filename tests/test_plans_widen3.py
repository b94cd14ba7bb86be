"""Physical-plan pins for the widen3 batch — the scale-critical
properties a human would check with .explain("formatted"): no
cartesian products, windows and aggs sharing shuffles, pushdown, and
pure-map ngram formation.
"""

from __future__ import annotations

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED

all_queries()


def _final_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MED)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_count_if_one_shuffle(spark):
    # all four conditional metrics ride one partial+final agg pair
    p = _final_plan(spark, "d_count_if")
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_union_by_name_no_shuffle_before_agg(spark):
    # Union is narrow; the only exchange is the single-row final agg
    p = _final_plan(spark, "g_union_by_name")
    assert "Union" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_path_transitions_window_then_counter_agg(spark):
    p = _final_plan(spark, "e_path_transitions")
    assert "Window" in p
    assert "TakeOrderedAndProject" in p  # top-15 without global sort
    assert "CartesianProduct" not in p


def test_interval_overlap_join_is_hash_not_cartesian(spark):
    # day equality is the join key; overlap bounds are residual filters
    p = _final_plan(spark, "c_interval_overlap_join")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Join" in p


def test_top_ngrams_pure_map_formation(spark):
    # bigrams form via Generate (explode) — no self-join of the corpus
    p = _final_plan(spark, "q_top_ngrams_per_group")
    assert "Generate" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_chunk_dedup_single_window_no_join(spark):
    # keep-first is one row_number window partitioned by chunk text
    p = _final_plan(spark, "t_chunk_dedup")
    assert "Window" in p
    assert "Join" not in p


def test_feature_assembly_one_user_shuffle(spark):
    # three PIT features share the user_id sort/shuffle
    p = _final_plan(spark, "l_feature_assembly")
    assert "Window" in p
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_shuffle_hash_hint_is_respected(spark):
    p = _final_plan(spark, "c_join_hint_shuffle_hash")
    assert "ShuffledHashJoin" in p
    assert "SortMergeJoin" not in p


def test_explode_outer_is_generate_outer(spark):
    p = _final_plan(spark, "h_explode_outer")
    assert "Generate" in p and "explode" in p
    assert "Join" not in p


def test_lang_balance_quota_broadcast(spark):
    # the 1-row quota joins via broadcast, never a shuffle join
    p = _final_plan(spark, "t_lang_balance_resample")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_containment_no_cartesian(spark):
    # posting-list equi-join: pairs sharing zero shingles never form
    p = _final_plan(spark, "j_shingle_containment")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_grouping_id_single_expand(spark):
    p = _final_plan(spark, "d_grouping_id_matrix")
    assert "Expand" in p
    assert p.count("HashAggregate") >= 2


def test_aqe_coalesces_shuffle_reads(spark):
    # runtime re-planning evidence: with AQE on, the post-shuffle read
    # of a small intermediate is coalesced (AQEShuffleRead) instead of
    # fanning out to the static shuffle.partitions count
    p = _final_plan(spark, "e_path_transitions")
    assert "AQEShuffleRead" in p and "coalesced" in p


def test_seasonality_single_broadcast_of_global_mean(spark):
    p = _final_plan(spark, "q_seasonality_profile")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_embedding_dim_variance_no_join(spark):
    # O(dims) shuffle: explode then one partial+final agg, no join
    p = _final_plan(spark, "j_embedding_dim_variance")
    assert "Generate" in p
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2
