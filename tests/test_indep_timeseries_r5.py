"""Independent-derivation sweep, part 5: time-series folds and curves
(ACF, EWMA fold, max drawdown, TWAP, CUSUM). The recursions are
re-implemented as plain two-variable python loops — which in particular
verifies the engine's packed-state folds against an UNPACKED textbook
recursion, not just a transcription of the same packing trick.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div


def units4(x: float) -> int:
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x * 10000)).to_integral_value(ROUND_HALF_UP))


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


class TestACF:
    def test_lags_1_3_vs_corrcoef(self, spark, events):
        got = run(spark, "e_autocorrelation").set_index("lag_k")
        p = events[events.event_type == "purchase"]
        us = p.ts.astype("int64")
        hourly = (
            pd.DataFrame({"h": us // 3_600_000_000, "c": [cents(v) for v in p.value]})
            .groupby("h")["c"]
            .sum()
            .sort_index()
            .to_numpy(dtype=float)
        )
        for k in (1, 2, 3):
            x, y = hourly[k:], hourly[:-k]
            r = float(np.corrcoef(x, y)[0, 1])
            assert int(got.loc[k, "n"]) == len(x)
            assert abs(got.loc[k, "acf_r"] - r) < 1e-5


class TestEwmaFold:
    def test_recursion_per_user(self, spark, events):
        got = run(spark, "e_ewma_fold").set_index("user_id")
        p = events[events.event_type == "purchase"]
        for uid, grp in p.groupby("user_id"):
            rows = sorted(
                zip(grp.ts.astype("int64"), grp.event_id, grp.value)
            )
            xs = [units4(v) for _, _, v in rows]
            s = 0
            for x in xs:
                s = (x + s) // 2
            assert int(got.loc[uid, "n"]) == len(xs)
            assert int(got.loc[uid, "ewma_units"]) == s
            # float EWMA twin: per-step floors lose < 2 units total
            f = 0.0
            for x in xs:
                f = (x + f) / 2
            assert 0 <= f - s < 2.5


class TestMaxDrawdown:
    def test_curve(self, spark, events):
        got = run(spark, "e_max_drawdown").iloc[0]
        e = events[events.event_type.isin(["purchase", "error"])]
        us = e.ts.astype("int64")
        net = [
            cents(v) if t == "purchase" else -cents(v)
            for v, t in zip(e.value, e.event_type)
        ]
        daily = (
            pd.DataFrame({"d": us // 86_400_000_000, "n": net})
            .groupby("d")["n"]
            .sum()
            .sort_index()
        )
        cum = daily.cumsum()
        hw = cum.cummax()
        assert int(got["n_days"]) == len(daily)
        assert int(got["peak_cents"]) == int(hw.max())
        assert int(got["max_drawdown_cents"]) == int((hw - cum).max())
        assert int(got["trough_cents"]) == int(cum.min())


class TestTwap:
    def test_step_integral(self, spark, events):
        got = run(spark, "e_twap").set_index("event_type")
        e = events[events.value > 0]
        for et, grp in e.groupby("event_type"):
            rows = sorted(
                zip(grp.ts.astype("int64"), grp.event_id, grp.value)
            )
            num = tot = segs = 0
            for (u1, _, v1), (u2, _, _) in zip(rows, rows[1:]):
                hold = u2 - u1
                num += cents(v1) * hold
                tot += hold
                segs += 1
            row = got.loc[et]
            assert int(row["n_segments"]) == segs
            assert int(row["total_us"]) == tot
            assert int(row["twap_cents"]) == trunc_div(num, tot)
            # the step integral is a duration-weighted mean: bounded by
            # the min/max observed price
            cs = [cents(v) for _, _, v in rows[:-1]]
            assert min(cs) <= trunc_div(num, tot) <= max(cs)


class TestCusum:
    def test_packed_fold_equals_unpacked_recursion(self, spark, events):
        got = run(spark, "e_cusum_alarms").set_index("event_type")
        us = events.ts.astype("int64")
        df = pd.DataFrame(
            {
                "et": events.event_type,
                "h": us // 3_600_000_000,
                "c": [cents(v) for v in events.value],
            }
        )
        for et, grp in df.groupby("et"):
            xs = grp.groupby("h")["c"].sum().sort_index().tolist()
            k = sum(xs) // len(xs)
            # textbook CUSUM with two separate state variables — NOT the
            # engine's bigint packing
            s = alarms = 0
            for x in xs:
                s = max(0, s + x - k)
                if s > 2 * k:
                    alarms += 1
            row = got.loc[et]
            assert int(row["n_hours"]) == len(xs)
            assert int(row["mean_hourly_cents"]) == k
            assert int(row["final_s"]) == s
            assert int(row["n_alarms"]) == alarms
            assert alarms < 65536  # packing precondition holds
