"""Independent-derivation sweep, part 14: behavioral analytics
(cumulative distinct, cohort retention, basket lift, interval-union
coverage, clamped balance fold, DAU/MAU stickiness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestCumulativeDistinct:
    def test_first_seen_rollup(self, spark, tbl):
        got = run(spark, "e_cumulative_distinct")
        e = tbl("events")
        first = e.groupby("user_id")["ts"].min().dt.floor("h")
        daily = first.value_counts().sort_index()
        assert len(got) == len(daily)
        cum = 0
        for (_, row), (h, n) in zip(got.iterrows(), daily.items()):
            cum += n
            assert pd.Timestamp(row["d"]) == h
            assert int(row["new_users"]) == n
            assert int(row["cum_users"]) == cum
        assert cum == e.user_id.nunique()  # everyone counted once


class TestCohortRetention:
    def test_week_offsets(self, spark, tbl):
        got = run(spark, "q_cohort_retention").set_index(["cohort_week", "week_offset"])
        e = tbl("events")
        cw = e.groupby("user_id")["ts"].min().dt.to_period("W-SUN").dt.start_time
        df = pd.DataFrame(
            {
                "u": e.user_id,
                "w": e.ts.dt.to_period("W-SUN").dt.start_time,
            }
        )
        df["cohort"] = df.u.map(cw)
        df["off"] = ((df.w - df.cohort).dt.days // 7).astype(int)
        expect = df.groupby(["cohort", "off"])["u"].nunique()
        assert len(got) == len(expect)
        for (cohort, off), n in expect.items():
            assert int(got.loc[(cohort, off), "n_active"]) == n
        # cohort sizes equal the offset-0 counts and never grow later
        for cohort in expect.index.get_level_values(0).unique():
            base = expect[(cohort, 0)]
            for off in expect[cohort].index:
                assert expect[(cohort, off)] <= base


class TestBasketLift:
    def test_support_confidence_lift(self, spark, tbl):
        got = run(spark, "q_basket_lift")
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        ob = set(zip(df.l_orderkey, df.p_brand))
        n_orders = len({o for o, _ in ob})
        brand_n: dict[str, int] = {}
        for _, b in ob:
            brand_n[b] = brand_n.get(b, 0) + 1
        pair_n: dict[tuple[str, str], int] = {}
        from collections import defaultdict

        per_order = defaultdict(set)
        for o, b in ob:
            per_order[o].add(b)
        for brands in per_order.values():
            bs = sorted(brands)
            for i in range(len(bs)):
                for j in range(i + 1, len(bs)):
                    pair_n[(bs[i], bs[j])] = pair_n.get((bs[i], bs[j]), 0) + 1
        rows = [
            (
                a,
                b,
                nab,
                nab * 1_000_000 // brand_n[a],
                nab * n_orders * 1_000_000 // (brand_n[a] * brand_n[b]),
            )
            for (a, b), nab in pair_n.items()
        ]
        rows.sort(key=lambda r: (-r[4], r[0], r[1]))
        want = rows[:15]
        assert len(got) == len(want)
        for (_, g), w in zip(got.iterrows(), want):
            assert (g["brand_a"], g["brand_b"]) == (w[0], w[1])
            assert int(g["n_ab"]) == w[2]
            assert int(g["conf_ppm"]) == w[3]
            assert int(g["lift_ppm"]) == w[4]
            # float lift twin
            lift = (w[2] * n_orders) / (brand_n[w[0]] * brand_n[w[1]])
            assert abs(w[4] / 1e6 - lift) < 1e-4


class TestIntervalUnion:
    def test_day_partitioned_sweep(self, spark, tbl):
        got = run(spark, "e_interval_union_coverage").iloc[0]
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame({"s": us, "eid": e.event_id})
        df["d"] = df.s // 86_400_000_000
        df["e"] = np.minimum(df.s + 60_000_000, (df.d + 1) * 86_400_000_000)
        n_islands = 0
        covered = 0
        longest = 0
        for d, grp in df.groupby("d"):
            spans = sorted(zip(grp.s, grp.eid, grp.e))
            cur_s, cur_e = spans[0][0], spans[0][2]
            for s, _, en in spans[1:]:
                if s > cur_e:
                    n_islands += 1
                    covered += cur_e - cur_s
                    longest = max(longest, cur_e - cur_s)
                    cur_s, cur_e = s, en
                else:
                    cur_e = max(cur_e, en)
            n_islands += 1
            covered += cur_e - cur_s
            longest = max(longest, cur_e - cur_s)
        assert int(got["n_days"]) == df.d.nunique()
        assert int(got["n_islands"]) == n_islands
        assert int(got["covered_s"]) == covered // 1_000_000
        assert int(got["longest_island_s"]) == longest // 1_000_000


class TestClampedFold:
    def test_nonlinear_recursion(self, spark, tbl):
        got = run(spark, "q_clamped_balance_fold").set_index("user_id")
        e = tbl("events")
        mv = e[e.event_type.isin(["purchase", "error"])]
        for uid, grp in mv.groupby("user_id"):
            rows = sorted(
                zip(grp.ts.astype("int64"), grp.event_id, grp.event_type, grp.value)
            )
            bal = 0
            for _, _, et, v in rows:
                delta = cents(v) if et == "purchase" else -cents(v)
                bal = max(0, bal + delta)
            row = got.loc[uid]
            assert int(row["n_moves"]) == len(rows)
            assert int(row["final_balance_cents"]) == bal
            assert bal >= 0


class TestStickiness:
    def test_dau_mau(self, spark, tbl):
        got = run(spark, "e_user_stickiness").set_index("ep_day")
        e = tbl("events")
        ep_day = (e.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        ym = e.ts.dt.year * 100 + e.ts.dt.month
        df = pd.DataFrame({"u": e.user_id, "d": ep_day, "ym": ym})
        dau = df.groupby(["ym", "d"])["u"].nunique()
        mau = df.groupby("ym")["u"].nunique()
        assert len(got) == len(dau)
        for (m, d), n in dau.items():
            row = got.loc[d]
            assert int(row["dau"]) == n
            assert int(row["mau"]) == mau[m]
            assert abs(row["stickiness"] - n / mau[m]) < 1e-6
            assert row["stickiness"] <= 1.0
