"""Plan pins + semantics checks for round-4 batches widen77-86:
binned range join, cogroup bucketing, compressed/composite ANN,
streaming outer join, growth accounting, medallion, cache reuse.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED, SF_SMALL

all_queries()


def _final_plan(spark, name: str, sf=SF_MED) -> str:
    df = REGISTRY[name].fn(spark, sf)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _run(spark, name: str, sf=SF_SMALL):
    return REGISTRY[name].fn(spark, sf).collect()


# --- widen77: binned range join ---------------------------------------


def test_range_join_binned_no_nested_loop(spark):
    """The whole point: interval containment WITHOUT BroadcastNestedLoop
    — the bin column must turn it into a hash join."""
    p = _final_plan(spark, "c_range_join_binned")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_l_diversity_bounds(spark):
    row = _run(spark, "t_l_diversity")[0]
    assert row["min_l"] >= 1
    assert row["n_low_diversity"] <= row["n_groups"]
    assert (row["n_low_diversity"] == 0) == (row["docs_at_risk"] == 0)


# --- widen78: cogroup + transpose -------------------------------------


def test_cogrouped_map_conservation(spark):
    """Order counts across statuses must equal the orders table."""
    rows = _run(spark, "k_cogrouped_map")
    n_orders = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders


def test_transpose_metrics(spark):
    rows = _run(spark, "b_transpose_frame")
    assert [r["metric"] for r in rows] == ["n_orders", "total_cents"]


# --- widen79/80/81: stats + API surfaces ------------------------------


def test_spearman_pieces_consistent(spark):
    row = _run(spark, "d_spearman_rho")[0]
    n = row["n"]
    assert row["denom6"] == n * (n * n - 1)
    # rho in [-1, 1]  ⟺  0 ≤ 6·Σd² ≤ 2·n(n²−1)
    assert 0 <= 6 * row["sum_d2"] <= 2 * row["denom6"]


def test_repeat_curve_monotone(spark):
    rows = _run(spark, "q_repeat_purchase_curve")
    counts = [r["n_customers"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # ≥n is monotone


def test_keyset_matches_offset_window(spark):
    """The keyset page must equal rows 41-60 of the global order."""
    rows = _run(spark, "f_keyset_pagination")
    o = (
        load_table(spark, SF_SMALL, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(60)
        .collect()[40:]
    )
    assert [r["o_orderkey"] for r in rows] == [r["o_orderkey"] for r in o]


def test_kmeans_invariants(spark):
    row = _run(spark, "j_kmeans_purity")[0]
    assert row["inertia_decreased"] is True
    assert row["purity_above_random"] is True


def test_key_gap_audit_consistent(spark):
    row = _run(spark, "etl_key_gap_audit")[0]
    assert row["max_key"] - row["min_key"] + 1 == row["n_keys"] + row["n_missing"]
    assert row["largest_gap"] <= row["n_missing"]


# --- widen82: streaming outer join ------------------------------------


def test_stream_outer_join_unmatched_nonzero(spark):
    """The eviction path must actually produce unmatched rows (the
    semantic the flush choreography exists for) and match batch."""
    row = _run(spark, "s_stream_stream_outer")[0]
    assert row["n_unmatched"] > 0
    assert row["n_rows"] == row["n_matched"] + row["n_unmatched"]


# --- widen83/85: pipelines --------------------------------------------


def test_growth_accounting_conserved(spark):
    rows = _run(spark, "q_growth_accounting")
    assert len(rows) >= 2
    assert all(r["conserved"] for r in rows)
    # the first week is all-new by definition
    assert rows[0]["new_users"] == rows[0]["mau"]


def test_medallion_conservation(spark):
    row = _run(spark, "etl_medallion")[0]
    assert row["bronze_conserved"] is True
    assert row["gold_conserved"] is True


def test_log_compaction_partition(spark):
    row = _run(spark, "etl_log_compaction")[0]
    assert row["n_keys_seen"] == row["n_live"] + row["n_tombstoned"]


# --- widen84: IVF-PQ ---------------------------------------------------


def test_ivf_pq_recall(spark):
    row = _run(spark, "j_ivf_pq")[0]
    assert row["recall_ok"] is True


# --- widen86: cache + hashing -----------------------------------------


def test_cached_reuse_hits_memory(spark):
    """Both derived aggregates must read the InMemoryTableScan."""
    name = "b_cached_reuse"
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_orders"))
        .cache()
    )
    try:
        derived = base.agg(F.sum("n_orders").alias("t"))
        derived.collect()
        p = derived._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in p
    finally:
        base.unpersist()
    row = _run(spark, name)[0]
    assert row["total_orders"] == o.count()


def test_feature_hashing_bounds(spark):
    for r in _run(spark, "j_feature_hashing"):
        assert r["nnz_dims"] <= 16
        assert abs(r["signed_total"]) <= r["l1_norm"]
