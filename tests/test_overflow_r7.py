"""Round-7 int64-overflow pins at 100-TB-scale magnitudes.

The first (aggressive) extremes sweep ran the fixture with 1e13 money
and 1e4 embedding components and exposed a coherent engine bug class:
fixed-point integer arithmetic that overflows int64 once values reach
magnitudes a 100-TB deployment actually produces —

  - d_hhi_concentration: `cents * 1e6` overflows at ~$92B revenue
    per (nation, supplier);
  - d_min_max_by: the `cents*1e7 + key` packed argmax key overflows
    at ~$92B AND silently mis-ranks once keys reach 1e7 (2^53 ids);
  - h_math_funcs: DECIMAL(12,6) refuses prices ≥ 1e7;
  - j_embedding_zscore / j_gram_power_iteration /
    j_hard_negative_mining / j_intrinsic_dimension: micro-unit
    quantized q reaches 1e10 on unnormalized embeddings, so q*q
    (1e20) overflows int64.

All were widened to DECIMAL(38,0)/HUGEINT (or IEEE double-floor where
both engines share the op sequence). The shipped extremes fixture
deliberately caps float-aggregated magnitudes at 1e6 (comparator
round(9) is ABSOLUTE, so correct double stddev at 1e13 false-fails on
1-ULP summation-order noise) — these tests re-create the aggressive
magnitudes on entries whose outputs are integer/decimal-exact and run
the full engine-vs-DuckDB differential on them.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.gen_adversarial import SCHEMAS, _tbl, variant_extremes  # noqa: E402
from tests.oracle_harness import compare_frames, duck_connect  # noqa: E402

BIG = 9_007_199_254_740_993  # 2^53 + 1


def _write_fixture(tmpdir: Path, overrides: dict) -> str:
    tables = variant_extremes()
    tables.update(overrides)
    for tname, tbl in tables.items():
        assert tbl.schema.equals(SCHEMAS[tname]), tname
        pq.write_table(tbl, str(tmpdir / f"{tname}.parquet"))
    return str(tmpdir)


def _diff(spark, sf_dir: str, name: str) -> None:
    from parking_violations_data_pipeline_spark.registry import (
        REGISTRY,
        all_oracles,
        all_queries,
    )

    all_queries()
    spark_pdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
    con = duck_connect(sf_dir)
    oracle_pdf = con.execute(all_oracles()[name]).df()
    compare_frames(name, spark_pdf, oracle_pdf)


@pytest.fixture(scope="module")
def big_money_dir(tmp_path_factory):
    """orders/lineitem at $1e11-per-row magnitudes with 2^53 keys:
    per-supplier cents sums pass 2^63/1e6, the old packing range."""
    d = tmp_path_factory.mktemp("bigmoney")
    n = 12
    lineitem = _tbl(
        "lineitem",
        {
            "l_orderkey": [BIG + i for i in range(n)],
            "l_partkey": [1] * n,
            "l_suppkey": [1 if i < 10 else 2 for i in range(n)],
            "l_linenumber": [1] * n,
            "l_quantity": [10.0] * n,
            # $1e11 per line, exact cents: 10 lines on supplier 1
            # puts its cents sum at 1e15 — `cents * 1e6` is 1e21,
            # far past int64
            "l_extendedprice": [99_999_999_999.99] * n,
            "l_discount": [0.05] * n,
            "l_tax": [0.02] * n,
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": [1_600_000_000_000_000] * n,
        },
    )
    orders = _tbl(
        "orders",
        {
            "o_orderkey": [BIG + i for i in range(8)],
            "o_custkey": [1] * 8,
            "o_orderstatus": ["F", "O"] * 4,
            "o_totalprice": [99_999_999_999.99 - i for i in range(8)],
            "o_orderdate": [1_600_000_000_000_000] * 8,
            "o_orderpriority": ["1-URGENT", "5-LOW"] * 4,
        },
    )
    yield _write_fixture(d, {"lineitem": lineitem, "orders": orders})


@pytest.fixture(scope="module")
def big_vec_dir(tmp_path_factory):
    """embeddings with 1e4-magnitude components: micro-unit q = 1e10,
    q*q = 1e20 — the int64-overflow zone for every fixed-point
    dot/norm/Gram sum."""
    d = tmp_path_factory.mktemp("bigvec")
    vecs = []
    for v in range(12):
        if v == 0:
            vec = [1e4 if k == 0 else 1.0 for k in range(64)]
        else:
            vec = [1e4 * ((k * (v + 2)) % 64) / 64 + 1.0 for k in range(64)]
        vecs.append(vec)
    emb = _tbl(
        "embeddings",
        {
            "vec_id": [0 if v == 0 else (BIG + v if v % 2 == 0 else v)
                       for v in range(12)],
            "embedding": vecs,
            "label": [v % 3 for v in range(12)],
        },
    )
    yield _write_fixture(d, {"embeddings": emb})


class TestBigMoneyOverflow:
    def test_hhi_concentration(self, spark, big_money_dir):
        _diff(spark, big_money_dir, "d_hhi_concentration")

    def test_min_max_by(self, spark, big_money_dir):
        _diff(spark, big_money_dir, "d_min_max_by")

    def test_min_max_by_ranks_correctly(self, spark, big_money_dir):
        """The old int64 packing could overflow WITHOUT erroring on
        some inputs (silent mis-rank) — assert the actual argmax."""
        from parking_violations_data_pipeline_spark.registry import (
            REGISTRY,
            all_queries,
        )

        all_queries()
        rows = {
            r["o_orderpriority"]: r
            for r in REGISTRY["d_min_max_by"].fn(spark, big_money_dir).collect()
        }
        # prices DESCEND with i, so per priority the argmax is the
        # LOWEST key of that priority's arithmetic sequence
        assert rows["1-URGENT"]["biggest_order"] == BIG + 0
        assert rows["1-URGENT"]["smallest_order"] == BIG + 6
        assert rows["5-LOW"]["biggest_order"] == BIG + 1
        assert rows["5-LOW"]["smallest_order"] == BIG + 7

    def test_math_funcs_wide_decimal(self, spark, big_money_dir):
        _diff(spark, big_money_dir, "h_math_funcs")


class TestBigVectorOverflow:
    def test_embedding_zscore(self, spark, big_vec_dir):
        _diff(spark, big_vec_dir, "j_embedding_zscore")

    def test_gram_power_iteration(self, spark, big_vec_dir):
        _diff(spark, big_vec_dir, "j_gram_power_iteration")

    def test_hard_negative_mining(self, spark, big_vec_dir):
        _diff(spark, big_vec_dir, "j_hard_negative_mining")

    def test_intrinsic_dimension(self, spark, big_vec_dir):
        _diff(spark, big_vec_dir, "j_intrinsic_dimension")
