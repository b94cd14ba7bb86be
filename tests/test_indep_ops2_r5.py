"""Independent-derivation sweep, part 20: cohort LTV, price-volume
bridge, peak concurrency sweep, time-to-milestone, newsvendor stock.
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


class TestCohortLtv:
    def test_cumulative_curve(self, spark, tbl):
        got = run(spark, "q_cohort_ltv").set_index(["cohort_month", "age"])
        o = tbl("orders")
        od = pd.to_datetime(o.o_orderdate)
        df = pd.DataFrame(
            {
                "ck": o.o_custkey,
                "m": od.dt.year * 12 + od.dt.month - 1,
                "c": [cents(v) for v in o.o_totalprice],
            }
        )
        m0 = df.groupby("ck")["m"].min()
        df["m0"] = df.ck.map(m0)
        df["age"] = df.m - df.m0
        rev = df.groupby(["m0", "age"]).agg(c=("c", "sum"), na=("ck", "nunique"))
        sizes = m0.value_counts()
        for cohort in rev.index.get_level_values(0).unique():
            cum = 0
            sub = rev.loc[cohort].sort_index()
            for age, r in sub.iterrows():
                cum += int(r.c)
                row = got.loc[(cohort, age)]
                assert int(row["cohort_size"]) == sizes[cohort]
                assert int(row["n_active"]) == int(r.na)
                assert int(row["ltv_cum_cents"]) == cum
                assert int(row["n_active"]) <= sizes[cohort]


class TestPriceVolumeBridge:
    def test_waterfall_is_additive(self, spark, tbl):
        got = run(spark, "q_price_volume_bridge").set_index("brand")
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        df["y"] = pd.to_datetime(df.l_shipdate).dt.year
        df = df[df.y.isin([1997, 1998])]
        df["c"] = [cents(v) for v in df.l_extendedprice]
        yr = df.groupby(["p_brand", "y"]).agg(q=("l_quantity", "sum"), c=("c", "sum"))
        for brand in got.index:
            q0, c0 = int(yr.loc[(brand, 1997), "q"]), int(yr.loc[(brand, 1997), "c"])
            q1, c1 = int(yr.loc[(brand, 1998), "q"]), int(yr.loc[(brand, 1998), "c"])
            p0 = trunc_div(c0 * 1000, q0)
            p1 = trunc_div(c1 * 1000, q1)
            vol = trunc_div((q1 - q0) * p0, 1000)
            pri = trunc_div((p1 - p0) * q1, 1000)
            row = got.loc[brand]
            assert int(row["delta_cents"]) == c1 - c0
            assert int(row["volume_effect"]) == vol
            assert int(row["price_effect"]) == pri
            assert int(row["residual"]) == c1 - c0 - vol - pri
            # additivity by construction
            assert (
                int(row["volume_effect"]) + int(row["price_effect"]) + int(row["residual"])
                == int(row["delta_cents"])
            )


class TestPeakConcurrency:
    def test_sweep_depth(self, spark, tbl):
        got = run(spark, "e_peak_concurrency").iloc[0]
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame({"s": us, "eid": e.event_id})
        df["d"] = df.s // 86_400_000_000
        df["e"] = np.minimum(df.s + 60_000_000, (df.d + 1) * 86_400_000_000)
        peaks = []
        for d, grp in df.groupby("d"):
            marks = sorted(
                [(s, 0, 1, eid) for s, eid in zip(grp.s, grp.eid)]
                + [(en, 1, -1, eid) for en, eid in zip(grp.e, grp.eid)]
            )
            depth = peak = 0
            for _, _, delta, _ in marks:
                depth += delta
                peak = max(peak, depth)
            peaks.append(peak)
        assert int(got["n_days"]) == len(peaks)
        assert int(got["max_peak"]) == max(peaks)
        assert int(got["sum_daily_peaks"]) == sum(peaks)


class TestTimeToMilestone:
    def test_crossing_quantiles(self, spark, tbl):
        got = run(spark, "q_time_to_milestone").iloc[0]
        e = tbl("events")
        p = e[e.event_type == "purchase"]
        tts = []
        for uid, grp in p.groupby("user_id"):
            rows = sorted(zip(grp.ts.astype("int64"), grp.event_id, grp.value))
            first = rows[0][0]
            c = 0
            for u, _, v in rows:
                c += cents(v)
                if c >= 50_000:
                    tts.append((u - first, uid))
                    break
        tts.sort()
        n = len(tts)
        assert int(got["n_achievers"]) == n
        assert int(got["median_hours"]) == tts[(n + 1) // 2 - 1][0] // 3_600_000_000
        assert int(got["p90_hours"]) == tts[(9 * n + 9) // 10 - 1][0] // 3_600_000_000


class TestServiceLevel:
    def test_p95_and_safety_stock(self, spark, tbl):
        got = run(spark, "q_service_level_stock").set_index("brand")
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        sd = pd.to_datetime(df.l_shipdate)
        df["m"] = sd.dt.year * 12 + sd.dt.month - 1
        monthly = df.groupby(["p_brand", "m"])["l_quantity"].sum().astype(int)
        for brand, grp in monthly.groupby(level=0):
            items = sorted(zip(grp.values, grp.index.get_level_values(1)))
            n = len(items)
            tot = sum(v for v, _ in items)
            p95 = items[(95 * n + 99) // 100 - 1][0]
            row = got.loc[brand]
            assert int(row["n_months"]) == n
            assert int(row["mean_demand"]) == tot // n
            assert int(row["p95_demand"]) == p95
            assert int(row["safety_stock"]) == p95 - tot // n
            # p95 covers at least 95% of months, independently
            assert sum(1 for v, _ in items if v <= p95) * 100 >= 95 * n
