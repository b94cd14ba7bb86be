"""Physical-plan pins for the widen4 (drift stats, LATERAL, multiset
set-ops, perplexity buckets, Matryoshka energy) and widen5 (DPP,
Z-order, Mann-Whitney) batches — the .explain("formatted") properties
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


def test_ks_drift_pushdown_and_distinct_grain(spark):
    # the purchase filter reaches the parquet scan; the ECDF prefix-sum
    # runs AFTER the distinct-value aggregation (two agg phases), so
    # the single-partition window sees the compressed series only
    p = _final_plan(spark, "d_ks_drift")
    assert "PushedFilters" in p and "purchase" in p
    assert p.count("HashAggregate") >= 2
    assert "Window" in p


def test_psi_drift_bin_grain_no_join(spark):
    # PSI is groupBy(bin) + a 10-row window; no join anywhere
    p = _final_plan(spark, "d_psi_drift")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2


def test_benford_string_digit_no_join(spark):
    p = _final_plan(spark, "d_benford_profile")
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_median_gap_broadcast_dim(spark):
    # customer dim broadcasts; the lag window shuffles on o_custkey once
    p = _final_plan(spark, "q_median_order_gap")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" in p


def test_lateral_decorrelates_to_window_not_loop(spark):
    # Catalyst rewrites LATERAL + ORDER BY + LIMIT into a partitioned
    # rank — the executed plan must be a window, not a per-row nested
    # loop over supplier
    p = _final_plan(spark, "c_lateral_join")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_except_all_no_sort_merge(spark):
    # multiset EXCEPT/INTERSECT plan as per-key count aggregates +
    # Generate (row re-expansion), never a sort-merge join of the bags;
    # the only nested-loop is the 1-row × 1-row summary crossJoin
    p = _final_plan(spark, "g_except_all")
    assert "Generate" in p
    assert "SortMergeJoin" not in p


def test_perplexity_buckets_broadcast_lang_totals(spark):
    # token→vocab join shuffles at token grain; the per-lang totals
    # (tiny) broadcast instead of shuffling the token stream again
    p = _final_plan(spark, "t_perplexity_buckets")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_matryoshka_stays_jvm_side(spark):
    # slice + aggregate fold are codegen'd higher-order functions —
    # no Python evaluation anywhere in the plan
    p = _final_plan(spark, "j_matryoshka_energy")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    # THE pin of the batch: the fact scan's partition filters carry a
    # dynamicpruning expression fed by the broadcast dim — a static
    # planner cannot know which flags survive the dim filter
    df = REGISTRY["c_dpp_partition_pruned_join"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    assert "BroadcastHashJoin" in plan


def test_zorder_bounds_both_envelopes(spark):
    # semantic pin (layout claim, not just plan shape): every z-file
    # bounds BOTH key spans to < 40% of the range, while at least one
    # linear file leaves supp_span at > 80% of the range
    df = REGISTRY["etl_zorder_cluster"].fn(spark, SF_MED)
    rows = df.collect()
    z = [r for r in rows if r["scheme"] == "zorder"]
    lin = [r for r in rows if r["scheme"] == "linear"]
    # linear files span the FULL suppkey range (no clustering on the
    # trailing key); its max supp_span is therefore ≈ the key range
    supp_range = max(r["supp_span"] for r in lin) * 1.0
    part_range = 16.0 * max(r["part_span"] for r in lin)
    # every z-file bounds BOTH keys to ~1/4 of their range (top 2 bits
    # of each key select the file) → a predicate on EITHER key skips
    # ~3/4 of z-files, while a suppkey predicate skips zero linear files
    assert all(r["supp_span"] <= 0.30 * supp_range for r in z)
    assert all(r["part_span"] <= 0.30 * part_range for r in z)
    assert all(r["supp_span"] >= 0.90 * supp_range for r in lin)


def test_mann_whitney_pushdown_distinct_grain(spark):
    p = _final_plan(spark, "e_mann_whitney")
    assert "PushedFilters" in p and "purchase" in p
    assert p.count("HashAggregate") >= 2
    assert "Join" not in p


def test_locf_two_fills_one_user_shuffle(spark):
    # forward LOCF and backward interpolation windows both partition by
    # user_id — Catalyst shares the shuffle; no join after the spine
    p = _final_plan(spark, "e_locf_interpolate")
    assert "Window" in p
    assert "Generate" in p  # sequence() spine explode
    assert "CartesianProduct" not in p


def test_temperature_mix_source_grain(spark):
    p = _final_plan(spark, "t_temperature_mix")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2


def test_generator_funcs_pure_map(spark):
    p = _final_plan(spark, "h_generator_funcs")
    assert "Generate" in p and "posexplode" in p
    assert "Join" not in p


def test_correlated_exists_decorrelates(spark):
    # EXISTS / NOT EXISTS become existence joins over one orders pass
    # each — never a per-customer nested loop
    p = _final_plan(spark, "c_correlated_exists")
    assert "ExistenceJoin" in p or "LeftSemi" in p or "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_value_streaks_islands_one_shuffle(spark):
    # lag + running-sum share the (user_id) shuffle; the run-length
    # rollup is the only additional exchange
    p = _final_plan(spark, "e_value_streaks")
    assert "Window" in p
    assert "Join" not in p


def test_centroid_drift_no_pairwise(spark):
    # drift is centroid-vs-centroid: the only join is at (label, dim)
    # grain (<= labels x 64 rows) — never a vector-vector product
    p = _final_plan(spark, "j_centroid_drift")
    assert "Generate" in p  # posexplode to dim grain
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_chi2_margins_on_contingency_only(spark):
    # margins are windows over the (type, cohort) table, not re-scans
    p = _final_plan(spark, "d_chi2_independence")
    assert "Join" not in p
    assert "Window" in p
    assert p.count("HashAggregate") >= 2


def test_format_funcs_codegen(spark):
    p = _final_plan(spark, "h_format_funcs")
    assert "Join" not in p
    assert "BatchEvalPython" not in p


def test_ngram_novelty_posting_list_shape(spark):
    # distinct grams -> min(doc_id) posting -> join-back: the same
    # scale shape as the dedup family, no pairwise comparison
    p = _final_plan(spark, "t_ngram_novelty")
    assert "Generate" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ab_ztest_two_aggs_no_join(spark):
    # user-grain conversion + 2x2 cells: two agg phases, no join, one
    # events scan
    p = _final_plan(spark, "d_ab_proportions_ztest")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2


def test_stage_audit_broadcasts_counts(spark):
    # stage counts union; the source-total attaches via broadcast of a
    # 1-row agg, never a shuffle join
    p = _final_plan(spark, "etl_stage_row_audit")
    assert "Union" in p
    assert "SortMergeJoin" not in p


def test_label_confusion_centroid_join_only(spark):
    # the only join is dims x (labels*64)-row normalized centroids,
    # broadcast — no vector-vector pairs anywhere
    p = _final_plan(spark, "j_label_confusion")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
