"""Independent-derivation sweep, part 6: change detection, band tests,
records, underwater spells, Theil-Sen. Pure-python textbook loops vs
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


def hourly_series(events, et=None):
    e = events if et is None else events[events.event_type == et]
    us = e.ts.astype("int64")
    return (
        pd.DataFrame({"h": us // 3_600_000_000, "c": [cents(v) for v in e.value]})
        .groupby("h")["c"]
        .agg(["sum", "count"])
        .sort_index()
    )


class TestChangepoint:
    def test_argmax_mean_shift(self, spark, events):
        got = run(spark, "e_changepoint_meanshift").iloc[0]
        hs = hourly_series(events, "purchase")
        cs, ns = hs["sum"].tolist(), hs["count"].tolist()
        hskeys = hs.index.tolist()
        tot_c, tot_n = sum(cs), sum(ns)
        best = None  # (key desc, h) -> max by (num*1000 div den, then min h)
        cum_c = cum_n = 0
        for i in range(len(cs) - 1):
            cum_c += cs[i]
            cum_n += ns[i]
            num = abs(cum_c * (tot_n - cum_n) - (tot_c - cum_c) * cum_n)
            den = cum_n * (tot_n - cum_n)
            key = trunc_div(num * 1000, den)
            if best is None or key > best[0]:
                best = (key, hskeys[i], trunc_div(num * 100, den))
        assert int(got["split_hour"]) == best[1]
        assert int(got["shift_centicents"]) == best[2]
        # independent float twin: the split's mean shift matches
        i = hskeys.index(best[1]) + 1
        shift = abs(
            sum(cs[:i]) / sum(ns[:i]) - sum(cs[i:]) / sum(ns[i:])
        )
        assert abs(best[2] / 100 - shift) < 0.011  # centicents trunc


class TestBollinger:
    def test_integer_band_equals_float_sigma(self, spark, events):
        got = run(spark, "e_bollinger_breaches").set_index("event_type")
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
            tested = breaches = 0
            for i, x in enumerate(xs):
                w = xs[max(0, i - 23) : i]
                n = len(w)
                if n < 12:
                    continue
                tested += 1
                # float 2-sigma test (population sigma over the frame)
                mu = np.mean(w)
                var = np.mean((np.array(w, float) - mu) ** 2)
                if (x - mu) ** 2 > 4 * var:
                    breaches += 1
            row = got.loc[et]
            assert int(row["n_tested"]) == tested
            assert int(row["n_breaches"]) == breaches
            assert int(row["breach_ppm"]) == breaches * 1_000_000 // tested


class TestRecordBreaks:
    def test_strict_running_records(self, spark, events):
        got = run(spark, "e_record_breaks").set_index("event_type")
        e = events[events.value > 0]
        for et, grp in e.groupby("event_type"):
            rows = sorted(zip(grp.ts.astype("int64"), grp.event_id, grp.value))
            best = None
            n_rec = 0
            top = last_us = None
            for u, _, v in rows:
                c = cents(v)
                if best is None or c > best:
                    n_rec += 1
                    best = c
                    top = c
                    last_us = u
            row = got.loc[et]
            assert int(row["n_records"]) == n_rec
            assert int(row["top_record_cents"]) == top
            assert int(row["last_record_us"]) == last_us


class TestUnderwater:
    def test_spell_accounting(self, spark, events):
        got = run(spark, "e_underwater_duration").iloc[0]
        e = events[events.value > 0]
        net = [
            cents(v) if t == "purchase" else -cents(v)
            for v, t in zip(e.value, e.event_type)
        ]
        daily = (
            pd.DataFrame({"d": e.ts.dt.date, "n": net}).groupby("d")["n"].sum().sort_index()
        )
        cum = daily.cumsum().tolist()
        peak = None
        under_flags = []
        for c in cum:
            peak = c if peak is None else max(peak, c)
            under_flags.append(1 if c < peak else 0)
        spells = []
        cur = 0
        for f in under_flags:
            if f:
                cur += 1
            elif cur:
                spells.append(cur)
                cur = 0
        if cur:
            spells.append(cur)
        assert int(got["n_days"]) == len(cum)
        assert int(got["days_underwater"]) == sum(under_flags)
        assert int(got["longest_underwater"]) == (max(spells) if spells else 0)
        assert int(got["n_underwater_spells"]) == len(spells)


class TestTheilSen:
    def test_median_pairwise_slope(self, spark, events):
        got = run(spark, "e_theil_sen").iloc[0]
        p = events[events.event_type == "purchase"]
        us = p.ts.astype("int64")
        daily = (
            pd.DataFrame({"d": us // 86_400_000_000, "c": [cents(v) for v in p.value]})
            .groupby("d")["c"]
            .sum()
            .sort_index()
        )
        ds, ys = daily.index.tolist(), daily.tolist()
        slopes = []
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                slopes.append(
                    (trunc_div((ys[j] - ys[i]) * 1000, ds[j] - ds[i]), ds[i], ds[j])
                )
        slopes.sort()
        n = len(slopes)
        med = slopes[(n + 1) // 2 - 1][0]
        assert int(got["n_pairs"]) == n
        assert int(got["theil_sen_slope_milli"]) == med
        # independent twin: numpy median of raw (unquantized) slopes is
        # within one milli-grid step of the rank-selected quantized one
        raw = [(ys[j] - ys[i]) / (ds[j] - ds[i]) for i in range(len(ds)) for j in range(i + 1, len(ds))]
        assert abs(med / 1000 - float(np.median(raw))) < max(
            abs(np.diff(sorted(set(raw)))).max() if len(set(raw)) > 1 else 1, 1
        )
