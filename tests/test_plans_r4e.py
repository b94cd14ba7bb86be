"""Semantics checks for round-4 batches widen100-110: streaming
observe, arrow UDTF, ensembles, bootstrap, salted agg, batched kNN,
TWAP, systematic sampling, pHash, set ops, econ signs, deciles,
deletion vectors.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_SMALL

all_queries()


def _run(spark, name: str, sf=SF_SMALL):
    return REGISTRY[name].fn(spark, sf).collect()


def test_stream_observe_equals_batch(spark):
    row = _run(spark, "s_stream_observe")[0]
    e = load_table(spark, SF_SMALL, "events")
    assert row["observed_rows"] == e.count()


def test_arrow_udtf_matches_sql_split(spark):
    rows = _run(spark, "k_arrow_udtf")
    d = load_table(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 200)
    want = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    assert sum(r["cnt"] for r in rows) == want


def test_anomaly_ensemble_consensus_bound(spark):
    for r in _run(spark, "e_anomaly_ensemble"):
        # consensus can never exceed any two rules' combined hits
        assert r["consensus_hits"] <= r["z_hits"] + r["mad_hits"] + r["tukey_hits"]
        assert r["consensus_hits"] <= r["n_days"]


def test_bootstrap_brackets_observed(spark):
    row = _run(spark, "d_poisson_bootstrap_ci")[0]
    assert row["observed_in_range"] is True
    assert row["boot_min"] <= row["boot_mean"] <= row["boot_max"]


def test_salted_agg_equals_direct(spark):
    rows = _run(spark, "d_salted_agg")
    e = load_table(spark, SF_SMALL, "events")
    direct = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {r["event_type"]: r["n"] for r in rows} == direct


def test_batch_knn_per_query_counts(spark):
    rows = _run(spark, "j_batch_knn")
    from collections import Counter

    per_q = Counter(r["qid"] for r in rows)
    assert set(per_q) == set(range(10))
    assert all(v == 3 for v in per_q.values())
    assert all(r["vec_id"] != r["qid"] for r in rows)


def test_twap_between_min_max(spark):
    rows = _run(spark, "e_twap")
    e = load_table(spark, SF_SMALL, "events").filter(F.col("value") > 0)
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in e.groupBy("event_type")
        .agg(
            F.min(F.round(F.col("value") * 100, 0).cast("long")).alias("lo"),
            F.max(F.round(F.col("value") * 100, 0).cast("long")).alias("hi"),
        )
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r["event_type"]]
        assert lo <= r["twap_cents"] <= hi


def test_phash_bucket_census(spark):
    row = _run(spark, "m_phash_neardup")[0]
    assert row["n_docs"] >= row["n_distinct_hashes"]
    assert row["largest_bucket"] >= 1
    assert row["n_candidate_dups"] != 1  # dup candidates come in groups ≥2


def test_symmetric_diff_identity(spark):
    row = _run(spark, "g_symmetric_diff")[0]
    assert row["inclusion_exclusion_ok"] is True
    assert row["n_sym_diff"] == row["n_a"] + row["n_b"] - 2 * row["n_both"]


def test_burstiness_signs_valid(spark):
    for r in _run(spark, "e_interevent_burstiness"):
        assert r["bursty_sign"] in (-1, 0, 1)


def test_decile_migration_partition(spark):
    row = _run(spark, "q_decile_migration")[0]
    assert (
        row["n_up"] + row["n_down"] + row["n_stable"] == row["n_customers"]
    )
    assert row["n_collapsed"] <= row["n_down"]


def test_harmonic_mean_inequality(spark):
    row = _run(spark, "d_harmonic_mean_quantized")[0]
    assert row["am_hm_inequality_ok"] is True
    assert 0 < row["harmonic_mean_cents"] <= row["arith_mean_cents"]


def test_topn_other_shares(spark):
    rows = _run(spark, "q_topn_other_rollup")
    assert len(rows) == 4  # top 3 + OTHER
    assert abs(sum(r["share_ppm"] for r in rows) - 1_000_000) <= 4


def test_deletion_vectors_conserve(spark):
    row = _run(spark, "etl_deletion_vectors")[0]
    assert row["base_untouched"] is True
    assert row["base_rows"] == row["live_rows"] + row["deleted_rows"]


def test_partition_hint_injects_exchange(spark):
    df = REGISTRY["b_partition_hints"].fn(spark, SF_SMALL)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(pri" in p or "hashpartitioning(o_orderpriority" in p


def test_price_change_census_bounds(spark):
    row = _run(spark, "q_price_change_census")[0]
    assert row["n_parts_repriced"] <= row["n_parts"]
    assert row["n_repricings"] >= row["n_parts_repriced"]


def test_orphan_gc_safety(spark):
    row = _run(spark, "etl_orphan_gc")[0]
    assert row["orphans_found"] is True
    assert row["read_unaffected"] is True


def test_merge_intervals_compression(spark):
    row = _run(spark, "q_merge_intervals")[0]
    assert 1 <= row["n_merged"] <= row["n_intervals"]
    assert row["longest_merged_us"] <= row["covered_us"]


def test_underwater_accounting(spark):
    row = _run(spark, "e_underwater_duration")[0]
    assert row["days_underwater"] <= row["n_days"]
    assert row["longest_underwater"] <= row["days_underwater"]
    assert (row["n_underwater_spells"] == 0) == (row["days_underwater"] == 0)


def test_pandas_window_udaf_parity(spark):
    row = _run(spark, "k_pandas_window_udaf")[0]
    assert row["udaf_matches_builtin"] is True


def test_stream_sink_partition_layout(spark):
    rows = _run(spark, "s_stream_sink_partitioned")
    e = load_table(spark, SF_SMALL, "events").filter(
        F.col("event_type") == "purchase"
    )
    assert sum(r["cnt"] for r in rows) == e.count()


def test_consistent_sample_stability(spark):
    row = _run(spark, "t_consistent_sample")[0]
    assert row["subset_stable"] is True
    # ~10% of corpus within generous bounds
    d = load_table(spark, SF_SMALL, "documents").count()
    assert 0.02 * d < row["n_sampled"] < 0.3 * d


def test_three_valued_logic_grid(spark):
    rows = {(r["ai"], r["bi"]): r for r in _run(spark, "b_three_valued_logic")}
    assert len(rows) == 9
    # the two asymmetries that drop rows in real filters
    assert rows[(2, 1)]["and_r"] == "false"   # NULL AND FALSE = FALSE
    assert rows[(2, 0)]["and_r"] == "NULL"    # NULL AND TRUE  = NULL
    assert rows[(2, 0)]["or_r"] == "true"     # NULL OR TRUE   = TRUE
    assert rows[(2, 2)]["nullsafe_eq"] == "true"  # NULL <=> NULL
