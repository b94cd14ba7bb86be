"""Independent-derivation sweep, part 7: burstiness, survival,
moving-average signals. Pure-python loops vs the Spark entries at
sf0.001; the Kaplan-Meier curve is additionally checked against a
float product-limit estimator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


def hourly_cents(events):
    us = events.ts.astype("int64")
    return pd.DataFrame(
        {
            "et": events.event_type,
            "h": us // 3_600_000_000,
            "c": [cents(v) for v in events.value],
        }
    )


class TestFano:
    def test_variance_to_mean(self, spark, events):
        got = run(spark, "e_fano_burstiness").set_index("event_type")
        df = hourly_cents(events)
        for et, grp in df.groupby("et"):
            counts = grp.groupby("h").size().tolist()
            n, s1 = len(counts), sum(counts)
            s2 = sum(c * c for c in counts)
            row = got.loc[et]
            assert int(row["n"]) == n and int(row["total_events"]) == s1
            assert int(row["fano_ppm"]) == trunc_div(
                (n * s2 - s1 * s1) * 1_000_000, n * s1
            )
            # independent: float Fano factor (population var / mean)
            fano = np.var(counts) / np.mean(counts)
            regime = "regular" if fano < 1 else ("poisson" if fano == 1 else "bursty")
            assert row["regime"] == regime
            assert abs(int(row["fano_ppm"]) / 1e6 - fano) < 5e-3


class TestInterEvent:
    def test_sigma_vs_mu_sign(self, spark, events):
        got = run(spark, "e_interevent_burstiness").set_index("event_type")
        us = events.ts.astype("int64")
        df = pd.DataFrame({"et": events.event_type, "us": us, "eid": events.event_id})
        for et, grp in df.groupby("et"):
            t = [u for u, _ in sorted(zip(grp.us, grp.eid))]
            gaps = [b - a for a, b in zip(t, t[1:])]
            n = len(gaps)
            sx = sum(gaps)
            sxx = sum(g * g for g in gaps)
            sign = (n * sxx - 2 * sx * sx > 0) - (n * sxx - 2 * sx * sx < 0)
            row = got.loc[et]
            assert int(row["n_gaps"]) == n
            assert int(row["bursty_sign"]) == sign
            # independent: the sign encodes sigma^2 > mu^2 exactly
            g = np.array(gaps, float)
            sigma2, mu2 = g.var(), g.mean() ** 2
            assert sign == np.sign(sigma2 - mu2) or abs(sigma2 - mu2) < 1e-6 * mu2


class TestKaplanMeier:
    def test_product_limit(self, spark, events):
        got = run(spark, "e_km_survival_curve").set_index("age")
        us = events.ts.astype("int64")
        life = (
            pd.DataFrame({"u": events.user_id, "d": us // 86_400_000_000})
            .groupby("u")["d"]
            .agg(lambda s: s.max() - s.min())
        )
        per_age = life.value_counts().sort_index()
        ages = per_age.index.tolist()
        ds = per_age.tolist()
        total = sum(ds)
        # suffix risk sets + quantized prefix product
        s_ppm = 1_000_000
        at_risk = total
        surv_float = 1.0
        for age, d in zip(ages, ds):
            s_ppm = s_ppm * ((at_risk - d) * 1_000_000 // at_risk) // 1_000_000
            surv_float *= (at_risk - d) / at_risk
            row = got.loc[age]
            assert int(row["n_churned"]) == d
            assert int(row["n_at_risk"]) == at_risk
            assert int(row["survival_ppm"]) == s_ppm
            # float product-limit twin: ppm quantization only lowers,
            # and by < len(ages) ppm-steps
            assert s_ppm <= surv_float * 1e6 + 1e-6
            assert surv_float * 1e6 - s_ppm < len(ages) + 1
            at_risk -= d
        assert at_risk == 0


class TestWMA:
    def test_weights_4321(self, spark, events):
        got = run(spark, "e_weighted_moving_avg").set_index("event_type")
        df = hourly_cents(events)
        for et, grp in df.groupby("et"):
            xs = grp.groupby("h")["c"].sum().sort_index().tolist()
            wmas = [
                trunc_div((4 * xs[i] + 3 * xs[i - 1] + 2 * xs[i - 2] + xs[i - 3]) * 1000, 10)
                for i in range(3, len(xs))
            ]
            row = got.loc[et]
            assert int(row["n"]) == len(wmas)
            assert int(row["sum_wma_milli"]) == sum(wmas)
            assert int(row["max_wma_milli"]) == max(wmas)
            # independent: each WMA is a convex combination -> bounded by
            # the window min/max; check the max one
            i = 3 + wmas.index(max(wmas))
            wnd = xs[i - 3 : i + 1]
            assert min(wnd) * 1000 <= max(wmas) <= max(wnd) * 1000


class TestSmaCrossover:
    def test_signals_and_flips(self, spark, events):
        got = run(spark, "e_sma_crossover").set_index("event_type")
        df = hourly_cents(events)
        for et, grp in df.groupby("et"):
            xs = grp.groupby("h")["c"].sum().sort_index().tolist()
            sigs = []
            for i in range(len(xs)):
                slow = xs[max(0, i - 23) : i + 1]
                if len(slow) < 24:
                    continue
                fast = xs[max(0, i - 5) : i + 1]
                # float mean comparison (ties impossible unless exact)
                sigs.append(1 if sum(fast) * len(slow) > sum(slow) * len(fast) else 0)
            crossings = sum(1 for a, b in zip(sigs, sigs[1:]) if a != b)
            row = got.loc[et]
            assert int(row["n_hours"]) == len(sigs)
            assert int(row["n_fast_above"]) == sum(sigs)
            assert int(row["n_crossings"]) == crossings
