"""Independent-derivation sweep, round 7: the ETL composites and the
lakehouse trio, re-derived from RAW parquet with pyarrow + pure-python
dicts — no engine code, no oracle SQL, no pandas joins (VERDICT r6
item 2: the `etl_*` family was excluded from the r5/r6 re-derivation
sweeps, and a Luhn-class self-consistent bug could hide there).

Each test recomputes the expected result from first principles
(modular-residue commits, conservation laws, SCD2 version algebra,
weighted-delta maintenance) and compares against the ENGINE's
collected output at sf0.001.
"""

from __future__ import annotations

import json
from decimal import Decimal, ROUND_HALF_UP

import pyarrow.parquet as pq
import pytest

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

SF = "/root/testdata/sf0.001"


def run(spark, name: str):
    all_queries()
    return REGISTRY[name].fn(spark, SF).toPandas()


def cents(x: float) -> int:
    """HALF_UP integer cents — mirrors Spark round(x*100, 0)."""
    return int(Decimal(repr(x * 100)).to_integral_value(ROUND_HALF_UP))


def cols(table: str, names: list[str]) -> list[tuple]:
    t = pq.read_table(f"{SF}/{table}.parquet", columns=names)
    return list(zip(*(t.column(n).to_pylist() for n in names)))


class TestTimeTravelVersions:
    def test_v1_v2_from_residues(self, spark):
        got = run(spark, "a_time_travel_versions").set_index("version")
        rows = cols("orders", ["o_orderkey", "o_totalprice"])
        v1 = [(k, p) for k, p in rows if k % 3 == 0]
        v2 = [(k, p) for k, p in rows if k % 3 <= 1]
        assert int(got.loc["v1", "n_rows"]) == len(v1)
        assert int(got.loc["v2", "n_rows"]) == len(v2)
        assert int(got.loc["v1", "cents"]) == sum(cents(p) for _, p in v1)
        assert int(got.loc["v2", "cents"]) == sum(cents(p) for _, p in v2)
        # snapshot isolation: v1 must NOT see v2's added residue class
        assert len(v1) < len(v2)


class TestDeletionVectors:
    def test_census_from_residues(self, spark):
        got = run(spark, "etl_deletion_vectors").iloc[0]
        rows = cols("orders", ["o_orderkey", "o_totalprice"])
        deleted = [(k, p) for k, p in rows if k % 13 == 0]
        live = [(k, p) for k, p in rows if k % 13 != 0]
        assert int(got["base_rows"]) == len(rows)
        assert int(got["deleted_rows"]) == len(deleted)
        assert int(got["live_rows"]) == len(live)
        assert int(got["live_cents"]) == sum(cents(p) for _, p in live)
        assert bool(got["base_untouched"]) is True
        # conservation: live + deleted = base
        assert int(got["live_rows"]) + int(got["deleted_rows"]) == int(
            got["base_rows"]
        )


class TestOrphanGC:
    def test_live_census(self, spark):
        got = run(spark, "etl_orphan_gc").iloc[0]
        rows = cols("orders", ["o_orderkey", "o_totalprice"])
        live = [(k, p) for k, p in rows if k % 4 == 0]
        assert int(got["live_rows"]) == len(live)
        assert int(got["live_cents"]) == sum(cents(p) for _, p in live)
        assert bool(got["orphans_found"]) is True
        assert bool(got["read_unaffected"]) is True


class TestMedallionConservation:
    def test_layer_counts_and_laws(self, spark):
        got = run(spark, "etl_medallion").iloc[0]
        rows = cols("events", ["event_id", "user_id", "value", "props",
                               "event_type"])

        def props_ok(p):
            if p is None:
                return False
            try:
                json.loads(p)
                return True
            except (ValueError, TypeError):
                return False

        silver = [
            r for r in rows
            if props_ok(r[3]) and r[2] is not None and r[2] >= 0
            and r[1] is not None
        ]
        bronze_n = len(rows)
        quarantined = bronze_n - len(silver)
        gold_groups = len({r[4] for r in silver})
        assert int(got["bronze_rows"]) == bronze_n
        assert int(got["quarantined"]) == quarantined
        assert int(got["silver_rows"]) == len(silver)
        assert int(got["gold_groups"]) == gold_groups
        assert int(got["gold_total_rows"]) == len(silver)
        assert bool(got["bronze_conserved"]) is True
        assert bool(got["gold_conserved"]) is True


class TestIVMRetract:
    def test_maintained_equals_recompute(self, spark):
        got = run(spark, "etl_ivm_retract").set_index("pri")
        rows = cols("orders", ["o_orderkey", "o_totalprice",
                               "o_orderpriority"])
        base = [r for r in rows if r[0] % 10 != 7]
        delta_ins = [r for r in rows if r[0] % 10 == 7]
        # final table = base minus %10==3 plus the inserts
        final = [r for r in base if r[0] % 10 != 3] + delta_ins
        expect: dict[str, tuple[int, int]] = {}
        for k, p, pri in final:
            n, c = expect.get(pri, (0, 0))
            expect[pri] = (n + 1, c + cents(p))
        expect = {pri: v for pri, v in expect.items() if v[0] > 0}
        assert set(got.index) == set(expect)
        for pri, (n, c) in expect.items():
            assert int(got.loc[pri, "n_orders"]) == n
            assert int(got.loc[pri, "cents"]) == c
            assert bool(got.loc[pri, "ivm_matches_recompute"]) is True


class TestSCD2Merge:
    def test_version_algebra(self, spark):
        got = run(spark, "etl_scd2_merge")
        rows = cols("customer", ["c_custkey", "c_name", "c_acctbal"])

        def r2(x):
            # round(x, 2) HALF_UP on the shortest double repr
            return float(
                Decimal(repr(x)).quantize(Decimal("0.01"), ROUND_HALF_UP)
            )

        dim = {k: (nm, r2(b)) for k, nm, b in rows}
        upd: dict[int, tuple[str, float]] = {}
        for k, nm, b in rows:
            if k % 7 == 0:
                upd[k] = (nm, r2(r2(b) + 100))
        for k, nm, b in rows:
            if k % 11 == 0:
                upd[k + 1_000_000] = (nm + " (new)", r2(b))

        expect = []  # (key, name, bal, from, to, is_current)
        for k, (nm, b) in dim.items():
            if k not in upd or upd[k][1] == b:
                expect.append((k, nm, b, "2024-01-01", None, True))
            else:
                expect.append((k, nm, b, "2024-01-01", "2024-06-01", False))
                expect.append((k, nm, upd[k][1], "2024-06-01", None, True))
        for k, (nm, b) in upd.items():
            if k not in dim:
                expect.append((k, nm, b, "2024-06-01", None, True))
        expect.sort(key=lambda r: (r[0], r[3]))

        assert len(got) == len(expect)
        for row, (k, nm, b, vf, vt, cur) in zip(got.itertuples(), expect):
            assert int(row.c_custkey) == k
            assert row.c_name == nm
            assert abs(float(row.c_acctbal) - b) < 1e-9
            assert str(row.valid_from)[:10] == vf
            if vt is None:
                assert row.valid_to is None or str(row.valid_to) in (
                    "NaT", "None"
                )
            else:
                assert str(row.valid_to)[:10] == vt
            assert bool(row.is_current) is cur

    def test_member_conservation(self, spark):
        """Every original member survives (as current or closed), and
        current-version count = |dim ∪ inserts|."""
        got = run(spark, "etl_scd2_merge")
        rows = cols("customer", ["c_custkey"])
        keys = {k for (k,) in rows}
        inserts = {k + 1_000_000 for k in keys if k % 11 == 0}
        current = got[got.is_current]
        assert set(current.c_custkey.astype(int)) == keys | inserts
        assert set(got.c_custkey.astype(int)) == keys | inserts
