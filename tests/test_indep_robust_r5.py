"""Independent-derivation sweep, part 4: robust location/dispersion
and sampling estimators (trimmed mean, weighted median, harmonic mean,
Tukey fences, capture-recapture). Spark entry at sf0.001 vs pure-python
textbook re-derivation.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestTrimmedMean:
    def test_per_priority(self, spark, tbl):
        got = run(spark, "d_trimmed_mean").set_index("pri")
        o = tbl("orders")
        for pri, grp in o.groupby("o_orderpriority"):
            rows = sorted(
                (cents(v), k) for v, k in zip(grp.o_totalprice, grp.o_orderkey)
            )
            n = len(rows)
            cut = n // 10
            kept = [c for c, _ in rows[cut : n - cut]]
            row = got.loc[pri]
            assert int(row["n_total"]) == n
            assert int(row["n_kept"]) == len(kept)
            assert int(row["sum_kept_cents"]) == sum(kept)
            assert int(row["trimmed_mean_millicents"]) == trunc_div(
                sum(kept) * 1000, len(kept)
            )
            # independent twin: numpy trimmed mean (same trim counts)
            tm = float(np.mean(kept))
            assert abs(int(row["trimmed_mean_millicents"]) / 1000 - tm) < 1e-3


class TestWeightedMedian:
    def test_lower_weighted_median(self, spark, tbl):
        got = run(spark, "d_weighted_median").set_index("l_returnflag")
        li = tbl("lineitem")
        li = li.assign(c=[cents(v) for v in li.l_extendedprice])
        for rf, grp in li.groupby("l_returnflag"):
            w = grp.groupby("c")["l_quantity"].sum().astype(int).sort_index()
            tot = int(w.sum())
            cum = 0
            med = None
            for val, wt in w.items():
                cum += wt
                if 2 * cum >= tot:
                    med = val
                    break
            row = got.loc[rf]
            assert int(row["median_cents"]) == med
            assert int(row["total_weight"]) == tot
            assert int(row["n_distinct_values"]) == len(w)
            # textbook check: med is a weighted median — weight strictly
            # below it <= tot/2 and weight strictly above it <= tot/2
            below = int(w[w.index < med].sum())
            above = int(w[w.index > med].sum())
            assert 2 * below <= tot and 2 * above <= tot


class TestHarmonicMean:
    def test_quantized_hm(self, spark, tbl):
        got = run(spark, "d_harmonic_mean_quantized").iloc[0]
        li = tbl("lineitem")
        li = li[li.l_quantity > 0]
        units = [
            trunc_div(cents(p), int(q))
            for p, q in zip(li.l_extendedprice, li.l_quantity)
        ]
        units = [u for u in units if u > 0]
        n = len(units)
        s_r = sum(1_000_000_000_000 // u for u in units)
        hm_q = n * 1_000_000_000_000 // s_r
        am = sum(units) // n
        assert int(got["n"]) == n
        assert int(got["sum_recip_pico"]) == s_r
        assert int(got["harmonic_mean_cents"]) == hm_q
        assert int(got["arith_mean_cents"]) == am
        assert bool(got["am_hm_inequality_ok"]) == (hm_q <= am)
        # independent twin: float harmonic mean (quantization only
        # lowers the reported HM, by < 1 cent at these magnitudes)
        hm_f = n / sum(1 / u for u in units)
        assert hm_q <= hm_f + 1e-9 and hm_f - hm_q < 1.0
        assert hm_f <= sum(units) / n  # AM-HM in floats too


class TestTukeyFences:
    def test_fences_and_outliers(self, spark, tbl):
        got = run(spark, "d_outlier_tukey").set_index("event_type")
        e = tbl("events")
        for et, grp in e.groupby("event_type"):
            rows = sorted((cents(v), i) for v, i in zip(grp.value, grp.event_id))
            vals = [c for c, _ in rows]
            n = len(vals)
            q1 = vals[(n + 3) // 4 - 1]
            q3 = vals[(3 * n + 3) // 4 - 1]
            lo = q1 - trunc_div(3 * (q3 - q1), 2)
            hi = q3 + trunc_div(3 * (q3 - q1), 2)
            n_out = sum(1 for v in vals if v < lo or v > hi)
            row = got.loc[et]
            assert (int(row["q1"]), int(row["q3"])) == (q1, q3)
            assert (int(row["lo"]), int(row["hi"])) == (lo, hi)
            assert int(row["n_outliers"]) == n_out
            # sanity vs numpy percentiles: rank-selected q1/q3 within
            # one grid step of the interpolated ones
            nq1, nq3 = np.percentile(vals, [25, 75])
            assert abs(q1 - nq1) <= max(abs(np.diff(sorted(set(vals)))).max(), 1)
            assert q1 <= q3


class TestCaptureRecapture:
    def test_lincoln_petersen(self, spark, tbl):
        got = run(spark, "d_capture_recapture").iloc[0]
        o = tbl("orders")
        custs = sorted(set(o.o_custkey))
        in_a = in_b = both = 0
        for ck in custs:
            h = hashlib.md5(str(ck).encode()).hexdigest()
            a = ord(h[0]) % 4 == 0
            b = ord(h[1]) % 4 == 0
            in_a += a
            in_b += b
            both += a and b
        est = in_a * in_b // max(both, 1)
        assert int(got["true_n"]) == len(custs)
        assert (int(got["n_a"]), int(got["n_b"]), int(got["n_both"])) == (
            in_a,
            in_b,
            both,
        )
        assert int(got["lincoln_petersen_est"]) == est
        assert bool(got["within_30pct"]) == (abs(est - len(custs)) * 10 <= len(custs) * 3)
