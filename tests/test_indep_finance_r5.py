"""Independent-derivation sweep, part 9: finance/ops analytics
(price indices, Little's law, Lorenz curve, VWAP, OHLC bars).
Pure-python/pandas textbook re-derivations vs the Spark entries at
sf0.001.
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


class TestPriceIndex:
    def test_laspeyres_paasche(self, spark, tbl):
        got = run(spark, "q_price_index").iloc[0]
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        df["y"] = pd.to_datetime(df.l_shipdate).dt.year
        df["c"] = [cents(v) for v in df.l_extendedprice]
        yr = df.groupby(["p_brand", "y"]).agg(c=("c", "sum"), q=("l_quantity", "sum"))
        y0, y1 = df.y.min(), df.y.max()
        rows = []
        for brand in yr.index.get_level_values(0).unique():
            if (brand, y0) in yr.index and (brand, y1) in yr.index:
                r0, r1 = yr.loc[(brand, y0)], yr.loc[(brand, y1)]
                if r0.q > 0 and r1.q > 0:
                    rows.append((int(r0.c), int(r0.q), int(r1.c), int(r1.q)))
        lasp_num = sum(trunc_div(c1 * q0 * 1_000_000, q1) for c0, q0, c1, q1 in rows)
        lasp = trunc_div(lasp_num, max(sum(r[0] for r in rows), 1))
        paasche_den = sum(trunc_div(c0 * q1, q0) for c0, q0, c1, q1 in rows)
        paasche = trunc_div(sum(r[2] for r in rows) * 1_000_000, max(paasche_den, 1))
        assert int(got["n_brands"]) == len(rows)
        assert int(got["laspeyres_ppm"]) == lasp
        assert int(got["paasche_ppm"]) == paasche
        # independent float twins of the textbook index formulas:
        # Laspeyres = sum(p1 q0)/sum(p0 q0), Paasche = sum(p1 q1)/sum(p0 q1)
        lf = sum((c1 / q1) * q0 for c0, q0, c1, q1 in rows) / sum(
            r[0] for r in rows
        )
        pf = sum(r[2] for r in rows) / sum((c0 / q0) * q1 for c0, q0, c1, q1 in rows)
        assert abs(lasp / 1e6 - lf) < 1e-4
        assert abs(paasche / 1e6 - pf) < 1e-4


class TestLittlesLaw:
    def test_integral_identity(self, spark, tbl):
        got = run(spark, "q_littles_law").iloc[0]
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame({"u": e.user_id, "d": e.ts.dt.date, "us": us})
        sess = df.groupby(["u", "d"])["us"].agg(["min", "max"])
        sess["en"] = sess["max"] + 1
        n_sessions = len(sess)
        total_dur = int((sess.en - sess["min"]).sum())
        # sweep-line with entry-before-exit tie order
        pts = sorted(
            [(t, 1) for t in sess["min"]] + [(t, -1) for t in sess.en],
            key=lambda p: (p[0], -p[1]),
        )
        conc = 0
        peak = 0
        integral = 0
        for (t, d), nxt in zip(pts, pts[1:] + [None]):
            conc += d
            peak = max(peak, conc)
            if nxt is not None:
                integral += conc * (nxt[0] - t)
        assert int(got["n_sessions"]) == n_sessions
        assert int(got["total_duration_us"]) == total_dur
        assert int(got["concurrency_integral_us"]) == integral
        assert bool(got["littles_law_holds"]) and integral == total_dur
        assert int(got["peak_concurrency"]) == peak


class TestLorenz:
    def test_decile_checkpoints(self, spark, tbl):
        got = run(spark, "q_lorenz_curve").set_index("decile")
        o = tbl("orders")
        spend = (
            o.assign(c=[cents(v) for v in o.o_totalprice])
            .groupby("o_custkey")["c"]
            .sum()
        )
        rows = sorted(zip(spend.values, spend.index))
        n = len(rows)
        tot = sum(c for c, _ in rows)
        cum = 0
        checkpoints = {}
        for rn, (c, _) in enumerate(rows, 1):
            cum += c
            decile = rn * 10 // n
            checkpoints[decile] = (
                rn * 1_000_000 // n,
                cum // max(tot // 1_000_000, 1),
                cum / tot,
            )
        for d in got.index:
            pop, sp, sp_float = checkpoints[d]
            row = got.loc[d]
            assert int(row["pop_share_ppm"]) == pop
            assert int(row["spend_share_ppm"]) == sp
            # float twin: ppm share within quantization of true share
            assert abs(sp / 1e6 - sp_float) < 1e-3
            # Lorenz curve lies under the diagonal
            assert sp <= pop or d == 10


class TestVwap:
    def test_ratio_of_sums(self, spark, tbl):
        got = run(spark, "q_vwap_monthly").set_index("month_idx")
        li = tbl("lineitem")
        sd = pd.to_datetime(li.l_shipdate)
        df = pd.DataFrame(
            {
                "m": sd.dt.year * 12 + sd.dt.month - 1,
                "q": li.l_quantity.astype(int),
                "c": [cents(v) for v in li.l_extendedprice],
            }
        )
        g = df.groupby("m").agg(vol=("q", "sum"), notional=("c", "sum"))
        for m, r in g.iterrows():
            row = got.loc[m]
            assert int(row["volume"]) == r.vol
            assert int(row["notional_cents"]) == r.notional
            assert int(row["vwap_milli"]) == trunc_div(int(r.notional) * 1000, int(r.vol))
        # independent: VWAP bounded by min/max unit price per month
        df["unit"] = df.c / df.q
        for m, grp in df.groupby("m"):
            v = got.loc[m, "vwap_milli"] / 1000
            assert grp.unit.min() - 1e-9 <= v <= grp.unit.max() + 1e-9


class TestOhlc:
    def test_bars(self, spark, tbl):
        got = run(spark, "q_ohlc_bars").set_index("hour_id")
        e = tbl("events")
        p = e[e.event_type == "purchase"]
        us = p.ts.astype("int64")
        df = pd.DataFrame(
            {
                "h": us // 3_600_000_000,
                "us": us,
                "eid": p.event_id,
                "v": p.value.round(2),
            }
        )
        for h, grp in df.groupby("h"):
            rows = sorted(zip(grp.us, grp.eid, grp.v))
            row = got.loc[h]
            assert int(row["n_trades"]) == len(rows)
            assert row["open"] == rows[0][2]
            assert row["close"] == rows[-1][2]
            assert row["high"] == max(v for _, _, v in rows)
            assert row["low"] == min(v for _, _, v in rows)
            assert int(row["volume_cents"]) == sum(cents(v) for _, _, v in rows)
