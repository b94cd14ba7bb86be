"""Independent-derivation sweep, part 36: WAU curves, cross-sell
penetration, trade balance, brand entry.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run

DAY_US = 86_400_000_000


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestRollingWau:
    def test_trailing_7d_distinct(self, spark, tbl):
        got = run(spark, "e_rolling_active_users").set_index("day_id")
        e = tbl("events")
        us = e.ts.astype("int64")
        active = set(zip(e.user_id, us // DAY_US))
        days = sorted({d for _, d in active})
        max_day = max(days)
        by_day = defaultdict(set)
        for u, d in active:
            by_day[d].add(u)
        for d in range(min(days), max_day + 1):
            wau = set()
            for back in range(7):
                wau |= by_day.get(d - back, set())
            if not wau:
                assert d not in got.index
                continue
            dau = len(by_day.get(d, set()))
            row = got.loc[d]
            assert int(row["wau"]) == len(wau)
            assert int(row["dau"]) == dau
            assert abs(row["stickiness"] - dau / len(wau)) < 1e-4
            assert dau <= len(wau)  # DAU subset of WAU


class TestCrossSell:
    def test_penetration_matrix(self, spark, tbl):
        got = run(spark, "q_cross_sell_matrix").set_index(["seg", "brand"])
        li, o, c, p = tbl("lineitem"), tbl("orders"), tbl("customer"), tbl("part")
        df = li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        df = df.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
        df = df.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        pen = df.groupby(["c_mktsegment", "p_brand"])["c_custkey"].nunique()
        seg_size = c.groupby("c_mktsegment").size()
        assert len(got) == len(pen)
        for (seg, brand), n in pen.items():
            row = got.loc[(seg, brand)]
            assert int(row["n_buyers"]) == n
            assert int(row["penetration_ppm"]) == n * 1_000_000 // int(seg_size[seg])
            assert n <= seg_size[seg]  # penetration <= 100%


class TestTradeBalance:
    def test_exports_minus_imports(self, spark, tbl):
        got = run(spark, "q_trade_balance").set_index("nation")
        li, o, c, s, nat = (
            tbl("lineitem"),
            tbl("orders"),
            tbl("customer"),
            tbl("supplier"),
            tbl("nation"),
        )
        names = nat.set_index("n_nationkey")["n_name"]
        df = li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        df = df.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        df = df.merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        df["src"] = df.s_nationkey.map(names)
        df["dst"] = df.c_nationkey.map(names)
        df = df[df.src != df.dst]
        df["cc"] = [cents(v) for v in df.l_extendedprice]
        exp = df.groupby("src")["cc"].sum()
        imp = df.groupby("dst")["cc"].sum()
        nations = set(exp.index) | set(imp.index)
        assert len(got) == len(nations)
        total_balance = 0
        for n in nations:
            row = got.loc[n]
            ex = int(exp.get(n, 0))
            im = int(imp.get(n, 0))
            assert int(row["exp_cents"]) == ex
            assert int(row["imp_cents"]) == im
            assert int(row["balance_cents"]) == ex - im
            total_balance += ex - im
        # closed system: global surpluses and deficits cancel exactly
        assert total_balance == 0


class TestBrandEntry:
    def test_first_seen_curve(self, spark, tbl):
        got = run(spark, "q_brand_entry_curve").set_index("quarter_idx")
        li, p = tbl("lineitem"), tbl("part")
        df = li.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        sd = pd.to_datetime(df.l_shipdate)
        df["q"] = sd.dt.year * 4 + (sd.dt.month - 1) // 3
        firsts = df.groupby("p_brand")["q"].min()
        per_q = firsts.value_counts().sort_index()
        cum = 0
        assert len(got) == len(per_q)
        for q, n in per_q.items():
            cum += n
            row = got.loc[q]
            assert int(row["n_new"]) == n
            assert int(row["cum_brands"]) == cum
        assert cum == df.p_brand.nunique()  # every brand enters once
