"""Independent-derivation sweep, part 8: SPC charts, forecast accuracy,
peaks, quantile shifts, seasonal indices. Pure-python textbook loops vs
the Spark entries at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


class TestXbarR:
    def test_shewhart_counts(self, spark, events):
        got = run(spark, "e_xbar_r_chart").iloc[0]
        p = events[events.event_type == "purchase"]
        us = p.ts.astype("int64")
        df = pd.DataFrame(
            {
                "d": us // 86_400_000_000,
                "us": us,
                "eid": p.event_id,
                "c": [cents(v) for v in p.value],
            }
        )
        subs = []
        for d, grp in df.groupby("d"):
            rows = sorted(zip(grp.us, grp.eid, grp.c))[:5]
            if len(rows) == 5:
                vals = [c for _, _, c in rows]
                subs.append((sum(vals), max(vals) - min(vals)))
        k = len(subs)
        ss = sum(s for s, _ in subs)
        sr = sum(r for _, r in subs)
        # float A2/D4 control-limit twin (the independent derivation)
        xbarbar = ss / (5 * k)
        rbar = sr / k
        n_x = n_r = 0
        for s, r in subs:
            if abs(s / 5 - xbarbar) > 0.577 * rbar:
                n_x += 1
            if r > 2.114 * rbar:
                n_r += 1
        assert int(got["n_subgroups"]) == k
        assert int(got["n_xbar_ooc"]) == n_x
        assert int(got["n_range_ooc"]) == n_r


class TestWape:
    def test_seasonal_naive(self, spark, events):
        got = run(spark, "e_forecast_wape").set_index("event_type")
        us = events.ts.astype("int64")
        df = pd.DataFrame(
            {
                "et": events.event_type,
                "h": us // 3_600_000_000,
                "c": [cents(v) for v in events.value],
            }
        )
        for et, grp in df.groupby("et"):
            ys = grp.groupby("h")["c"].sum().sort_index().tolist()
            pairs = [(ys[i], ys[i - 168]) for i in range(168, len(ys))]
            if not pairs:
                assert et not in got.index
                continue
            abs_err = sum(abs(y - yh) for y, yh in pairs)
            bias = sum(y - yh for y, yh in pairs)
            sy = sum(y for y, _ in pairs)
            row = got.loc[et]
            assert int(row["n_forecasts"]) == len(pairs)
            assert int(row["abs_err_cents"]) == abs_err
            assert int(row["bias_cents"]) == bias
            assert int(row["wape_ppm"]) == trunc_div(abs_err * 1_000_000, sy)


class TestPeaks:
    def test_strict_local_maxima(self, spark, events):
        got = run(spark, "e_peak_detection").set_index("event_type")
        us = events.ts.astype("int64")
        df = pd.DataFrame(
            {
                "et": events.event_type,
                "h": us // 3_600_000_000,
                "c": [cents(v) for v in events.value],
            }
        )
        for et, grp in df.groupby("et"):
            s = grp.groupby("h")["c"].sum().sort_index()
            hs, ys = s.index.tolist(), s.tolist()
            peaks = [
                (hs[i], ys[i])
                for i in range(1, len(ys) - 1)
                if ys[i] > ys[i - 1] and ys[i] > ys[i + 1]
            ]
            row = got.loc[et]
            assert int(row["n_peaks"]) == len(peaks)
            top = max(c for _, c in peaks)
            # earliest hour among equal-valued top peaks
            top_h = min(h for h, c in peaks if c == top)
            assert int(row["top_peak_cents"]) == top
            assert int(row["top_peak_hour"]) == top_h


class TestQuantileShift:
    def test_decile_table(self, spark):
        got = run(spark, "d_quantile_shift").set_index("decile")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        li["y"] = pd.to_datetime(li.l_shipdate).dt.year
        li = li[li.y.isin([1997, 1998])]
        qs = {}
        for yy, grp in li.groupby("y"):
            rows = sorted(
                (cents(v), ok, ln)
                for v, ok, ln in zip(grp.l_extendedprice, grp.l_orderkey, grp.l_linenumber)
            )
            n = len(rows)
            qs[yy] = {d: rows[(d * n + 9) // 10 - 1][0] for d in range(1, 10)}
        for d in range(1, 10):
            row = got.loc[d]
            assert int(row["q97_cents"]) == qs[1997][d]
            assert int(row["q98_cents"]) == qs[1998][d]
            assert int(row["shift_cents"]) == qs[1998][d] - qs[1997][d]
            # numpy twin: rank-exact decile within one grid step of the
            # interpolated percentile
            vals97 = sorted(cents(v) for v in li[li.y == 1997].l_extendedprice)
            assert abs(qs[1997][d] - np.percentile(vals97, d * 10)) <= max(
                np.diff(vals97).max(), 1
            )


class TestSeasonalIndex:
    def test_ratio_to_moving_average(self, spark):
        got = run(spark, "d_seasonal_index").set_index("cal_month")
        o = pd.read_parquet(f"{SF}/orders.parquet")
        od = pd.to_datetime(o.o_orderdate)
        df = pd.DataFrame(
            {
                "m": od.dt.year * 12 + od.dt.month - 1,
                "cal": od.dt.month,
                "c": [cents(v) for v in o.o_totalprice],
            }
        )
        monthly = df.groupby(["m", "cal"])["c"].sum().reset_index().sort_values("m")
        ms = monthly.m.tolist()
        cals = monthly.cal.tolist()
        cs = monthly.c.tolist()
        per_cal: dict[int, list[int]] = {}
        for i in range(len(ms)):
            w = cs[max(0, i - 5) : i + 7]
            if len(w) != 12:
                continue
            si = trunc_div(cs[i] * 12 * 1_000_000, sum(w))
            per_cal.setdefault(cals[i], []).append(si)
        for cal, sis in per_cal.items():
            row = got.loc[cal]
            assert int(row["n_obs"]) == len(sis)
            assert int(row["seasonal_index_ppm"]) == sum(sis) // len(sis)
            # independent: indices average ~1e6 across the year
        all_mean = np.mean([np.mean(v) for v in per_cal.values()])
        assert abs(all_mean - 1_000_000) < 120_000
