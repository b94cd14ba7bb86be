"""Independent-derivation sweep, part 18: BI composites (MoM growth,
SaaS revenue bridge, 2-D skyline, percent_rank/cume_dist, mode,
histogram).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestMonthlyGrowth:
    def test_mom_ratio(self, spark, tbl):
        got = run(spark, "q_monthly_growth").set_index("ym")
        o = tbl("orders")
        od = pd.to_datetime(o.o_orderdate)
        df = pd.DataFrame(
            {"ym": od.dt.year * 100 + od.dt.month, "c": [cents(v) for v in o.o_totalprice]}
        )
        m = df.groupby("ym")["c"].sum().sort_index()
        prev = None
        for ym, c in m.items():
            row = got.loc[ym]
            assert abs(row["revenue"] - c / 100.0) < 1e-6
            if prev is None:
                assert pd.isna(row["mom_growth"])
            else:
                assert abs(row["mom_growth"] - (c - prev) / prev) < 1e-6
            prev = c


class TestRevenueBridge:
    def test_bridge_ties_out(self, spark, tbl):
        got = run(spark, "q_revenue_bridge_saas").iloc[0]
        o = tbl("orders")
        o = o.assign(y=pd.to_datetime(o.o_orderdate).dt.year)
        o = o[o.y.isin([1997, 1998])]
        o["cc"] = [cents(v) for v in o.o_totalprice]
        yr = o.groupby(["o_custkey", "y"])["cc"].sum().unstack()
        c97 = yr.get(1997)
        c98 = yr.get(1998)
        start = int(c97.fillna(0).sum())
        end = int(c98.fillna(0).sum())
        new = int(c98[c97.isna()].fillna(0).sum())
        both = yr.dropna()
        expansion = int((both[1998] - both[1997]).clip(lower=0).sum())
        contraction = int((both[1997] - both[1998]).clip(lower=0).sum())
        churn = int(c97[c98.isna()].fillna(0).sum())
        assert int(got["starting"]) == start
        assert int(got["new_rev"]) == new
        assert int(got["expansion"]) == expansion
        assert int(got["contraction"]) == contraction
        assert int(got["churned"]) == churn
        assert int(got["ending"]) == end
        assert bool(got["conserves"])
        assert start + new + expansion - contraction - churn == end


class TestSkyline:
    def test_pareto_frontier_vs_quadratic(self, spark, tbl):
        got = run(spark, "q_skyline_parts").set_index("p_brand")
        p = tbl("part")
        pts = [
            (cents(pr), int(sz), br)
            for pr, sz, br in zip(p.p_retailprice, p.p_size, p.p_brand)
        ]
        # independent O(n^2) dominance check — the naive definition the
        # windowed rewrite must reproduce
        sky = []
        for i, (pi, si, bi) in enumerate(pts):
            dominated = any(
                (pj <= pi and sj <= si and (pj < pi or sj < si))
                for j, (pj, sj, _) in enumerate(pts)
                if j != i
            )
            if not dominated:
                sky.append((pi, si, bi))
        agg: dict[str, list] = {}
        for pr, sz, br in sky:
            a = agg.setdefault(br, [0, 1 << 62, 1 << 62, 0])
            a[0] += 1
            a[1] = min(a[1], pr)
            a[2] = min(a[2], sz)
            a[3] += pr
        assert set(got.index) == set(agg)
        for br, (n, mp, ms, sp) in agg.items():
            row = got.loc[br]
            assert int(row["n_sky"]) == n
            assert int(row["min_price_cents"]) == mp
            assert int(row["min_size"]) == ms
            assert int(row["sum_price_cents"]) == sp


class TestRelativeRanks:
    def test_percent_rank_cume_dist(self, spark, tbl):
        got = run(spark, "e_percent_rank_cume").set_index(["o_custkey", "o_orderkey"])
        o = tbl("orders")
        o = o[o.o_custkey < 100]
        for ck, grp in o.groupby("o_custkey"):
            rows = sorted((cents(v), ok) for v, ok in zip(grp.o_totalprice, grp.o_orderkey))
            n = len(rows)
            for i, (c, ok) in enumerate(rows):
                # textbook definitions over the total order
                pr = 0.0 if n == 1 else i / (n - 1)
                cd = (i + 1) / n
                row = got.loc[(ck, ok)]
                assert abs(row["pr"] - pr) < 1e-6
                assert abs(row["cd"] - cd) < 1e-6


class TestMode:
    def test_mode_per_group(self, spark, tbl):
        got = run(spark, "d_mode_per_group").set_index("l_returnflag")
        li = tbl("lineitem")
        for rf, grp in li.groupby("l_returnflag"):
            counts = grp.l_quantity.astype(int).value_counts()
            best_n = counts.max()
            best_q = min(q for q, n in counts.items() if n == best_n)
            row = got.loc[rf]
            assert int(row["mode_qty"]) == best_q
            assert int(row["n_occurrences"]) == best_n


class TestHistogram:
    def test_equi_width_buckets(self, spark, tbl):
        got = run(spark, "d_value_histogram").set_index("bucket")
        o = tbl("orders")
        cc = [cents(v) for v in o.o_totalprice]
        buckets: dict[int, list[int]] = {}
        for c in cc:
            buckets.setdefault(c // 500_000, []).append(c)
        assert set(got.index) == set(buckets)
        for b, vals in buckets.items():
            row = got.loc[b]
            assert int(row["cnt"]) == len(vals)
            assert abs(row["bucket_total"] - sum(vals) / 100.0) < 1e-6
        assert sum(len(v) for v in buckets.values()) == len(cc)
