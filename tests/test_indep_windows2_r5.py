"""Independent-derivation sweep, part 33: window frames, rank
variants, pivot/unpivot, conditional aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run


@pytest.fixture(scope="module")
def orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


class TestRunningFrames:
    def test_three_frames_one_pass(self, spark, orders):
        got = run(spark, "e_running_frames").set_index(["o_custkey", "o_orderkey"])
        for ck, grp in orders.groupby("o_custkey"):
            rows = sorted(zip(grp.o_orderdate, grp.o_orderkey, grp.o_totalprice))
            vals = [v for _, _, v in rows]
            for i, (_, ok, _) in enumerate(rows):
                r = got.loc[(ck, ok)]
                assert abs(r["running_total"] - round(sum(vals[: i + 1]), 2)) < 1e-6
                wnd = vals[max(0, i - 2) : i + 1]
                assert abs(r["moving_avg3"] - sum(wnd) / len(wnd)) < 1e-5
                assert int(r["n_orders"]) == len(vals)


class TestFirstLast:
    def test_frame_default_trap(self, spark, orders):
        got = run(spark, "e_first_last_value").set_index("o_custkey")
        for ck, grp in orders.groupby("o_custkey"):
            rows = sorted(zip(grp.o_orderdate, grp.o_orderkey))
            r = got.loc[ck]
            assert int(r["first_order"]) == rows[0][1]
            assert int(r["last_order"]) == rows[-1][1]


class TestRankVariants:
    def test_four_rank_functions(self, spark, orders):
        got = run(spark, "e_rank_variants").set_index(["o_orderpriority", "o_orderkey"])
        for pri, grp in orders.groupby("o_orderpriority"):
            rows = sorted(zip(grp.o_totalprice, grp.o_orderkey), key=lambda t: (-t[0], t[1]))
            n = len(rows)
            # dense_rank over distinct prices; ntile(4) SQL split
            prices = [p for p, _ in rows]
            seen = []
            base, rem = divmod(n, 4)
            tile_of = {}
            idx = 0
            for tile in range(1, 5):
                size = base + (1 if tile <= rem else 0)
                for _ in range(size):
                    tile_of[idx] = tile
                    idx += 1
            for i, (p, ok) in enumerate(rows):
                if not seen or seen[-1] != p:
                    seen.append(p)
                r = got.loc[(pri, ok)]
                assert int(r["drk"]) == len(seen)
                assert int(r["quartile"]) == tile_of[i]
                assert abs(r["prk"] - (0.0 if n == 1 else i / (n - 1))) < 1e-6
                assert abs(r["cd"] - (i + 1) / n) < 1e-6


class TestPivotUnpivot:
    def test_pivot(self, spark):
        got = run(spark, "d_pivot").set_index("l_returnflag")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        for rf, grp in li.groupby("l_returnflag"):
            r = got.loc[rf]
            assert abs(r["qty_F"] - round(grp[grp.l_linestatus == "F"].l_quantity.sum(), 2)) < 1e-6
            assert abs(r["qty_O"] - round(grp[grp.l_linestatus == "O"].l_quantity.sum(), 2)) < 1e-6

    def test_unpivot_inverts(self, spark):
        got = run(spark, "d_unpivot").set_index(["l_returnflag", "metric"])
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        for rf, grp in li.groupby("l_returnflag"):
            assert abs(got.loc[(rf, "sum_qty"), "val"] - round(grp.l_quantity.sum(), 2)) < 1e-6
            assert (
                abs(got.loc[(rf, "sum_price"), "val"] - round(grp.l_extendedprice.sum(), 2))
                < 1e-2
            )


class TestCountIf:
    def test_filtered_aggregates(self, spark):
        got = run(spark, "d_count_if").set_index("event_type")
        e = pd.read_parquet(f"{SF}/events.parquet")
        for et, grp in e.groupby("event_type"):
            big = grp.value[grp.value > 50]
            r = got.loc[et]
            assert int(r["n_big"]) == len(big)
            assert int(r["n_small"]) == len(grp) - len(big)
            assert abs(r["avg_big"] - big.mean()) < 1e-3
            if et == "purchase":
                assert abs(r["purchase_sum"] - round(grp.value.sum(), 2)) < 1e-6
            else:
                assert pd.isna(r["purchase_sum"])
            assert int(r["n_big"]) + int(r["n_small"]) == len(grp)
