"""Semantics + plan checks for round-4 batches widen87-94: FIM splits,
preference pairs, attribution conservation, Little's law, price
indices, OBT, Luhn/IPv4, IVM retraction, DTW, AUC, SQL UDF/scripting,
time travel.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_SMALL

all_queries()


def _run(spark, name: str, sf=SF_SMALL):
    return REGISTRY[name].fn(spark, sf).collect()


def test_fim_reconstruction(spark):
    rows = _run(spark, "t_fim_split")
    assert all(r["reconstructed"] for r in rows)
    for r in rows:
        assert 0 < r["middle_ppm"] < 1_000_000


def test_preference_pairs_ordered(spark):
    rows = _run(spark, "t_preference_pairs")
    assert all(r["ordered_ok"] for r in rows)
    assert all(r["min_margin"] >= 0 for r in rows)


def test_attribution_conserves(spark):
    rows = _run(spark, "q_multi_touch_attribution")
    assert all(r["conserved"] for r in rows)


def test_littles_law_exact(spark):
    row = _run(spark, "q_littles_law")[0]
    assert row["littles_law_holds"] is True
    assert row["peak_concurrency"] >= 1


def test_price_index_positive(spark):
    row = _run(spark, "q_price_index")[0]
    assert row["n_brands"] > 0
    assert row["laspeyres_ppm"] > 0
    assert row["paasche_ppm"] > 0


def test_obt_matches_star(spark):
    """The OBT rollup total must equal a direct fact-side revenue sum
    (every line appears exactly once through the dim chain)."""
    rows = _run(spark, "c_denormalize_obt")
    li = load_table(spark, SF_SMALL, "lineitem")
    total = li.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
        ).alias("c")
    ).collect()[0]["c"]
    assert sum(r["rev_cents"] for r in rows) == total
    assert sum(r["n_lines"] for r in rows) == li.count()


def test_luhn_distribution(spark):
    row = _run(spark, "h_luhn_check")[0]
    # ~1/10 of arbitrary numbers validate; bounds are loose but real
    assert 0 < row["n_valid"] < row["n_keys"]


def test_ipv4_roundtrip(spark):
    row = _run(spark, "h_ipv4_funcs")[0]
    assert row["roundtrip_ok"] is True
    assert row["max_last_octet"] <= 255


def test_ivm_retraction_matches(spark):
    rows = _run(spark, "etl_ivm_retract")
    assert all(r["ivm_matches_recompute"] for r in rows)


def test_dtw_invariants(spark):
    row = _run(spark, "e_dtw_kernel")[0]
    assert row["dtw_le_l1"] is True
    assert row["self_zero"] is True


def test_auc_in_range(spark):
    row = _run(spark, "d_auc_rank")[0]
    assert 0 <= row["auc_ppm"] <= 1_000_000
    assert row["u_statistic"] <= row["n_pos"] * row["n_neg"]


def test_sql_udf_tiers_cover(spark):
    rows = _run(spark, "h_sql_udf")
    li = load_table(spark, SF_SMALL, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_quantity") <= 45)
    )
    assert sum(r["n_lines"] for r in rows) == li.count()


def test_sql_scripting_fixed_point(spark):
    row = _run(spark, "h_sql_scripting")[0]
    t = row["threshold_cents"]
    assert t & (t - 1) == 0  # a power of two
    assert row["n_above"] < 100
    o = load_table(spark, SF_SMALL, "orders")
    # t/2 must NOT satisfy the bound (minimality), unless t == 1
    if t > 1:
        n_half = o.filter(
            F.round(F.col("o_totalprice") * 100, 0).cast("long") > t // 2
        ).count()
        assert n_half >= 100


def test_time_travel_isolation(spark):
    rows = {r["version"]: r for r in _run(spark, "a_time_travel_versions")}
    assert rows["v2"]["n_rows"] > rows["v1"]["n_rows"]
    o = load_table(spark, SF_SMALL, "orders")
    assert rows["v1"]["n_rows"] == o.filter(F.col("o_orderkey") % 3 == 0).count()


def test_lateral_alias_chain(spark):
    for r in _run(spark, "b_lateral_alias"):
        assert r["bucket"] == r["cents"] // 100000
        assert r["bucket2"] == r["bucket"] * 2
