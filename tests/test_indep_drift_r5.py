"""Independent-derivation sweep, part 3: drift statistics and
distribution-shape screens (KS, PSI, Mann-Whitney midranks, Benford,
power-law slope). Same protocol: Spark entry at sf0.001 vs numpy /
pure-python textbook re-derivation from raw parquet.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run, trunc_div


def half_up(x: float) -> int:
    return int(Decimal(repr(x)).to_integral_value(ROUND_HALF_UP))


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


@pytest.fixture(scope="module")
def purchase_halves(tbl):
    e = tbl("events")
    p = e[e.event_type == "purchase"]
    early = p[p.ts.dt.day <= 15].value.to_numpy()
    late = p[p.ts.dt.day > 15].value.to_numpy()
    return early, late


class TestKS:
    def test_ks_stat(self, spark, purchase_halves):
        got = run(spark, "d_ks_drift").iloc[0]
        a, b = purchase_halves
        # textbook two-sample KS: sup over observed values of |F1-F2|
        grid = np.unique(np.concatenate([a, b]))
        f1 = np.searchsorted(np.sort(a), grid, side="right") / len(a)
        f2 = np.searchsorted(np.sort(b), grid, side="right") / len(b)
        ks = float(np.max(np.abs(f1 - f2)))
        assert int(got["n_early"]) == len(a) and int(got["n_late"]) == len(b)
        assert abs(got["ks_stat"] - ks) < 1e-6


class TestPSI:
    def test_psi_terms(self, spark, purchase_halves):
        got = run(spark, "d_psi_drift").set_index("bin")
        a, b = purchase_halves  # a = reference (early), b = current
        bins_a = np.minimum(np.floor(a / 30).astype(int), 9)
        bins_b = np.minimum(np.floor(b / 30).astype(int), 9)
        t_ref, t_cur = len(a), len(b)
        for bin_ in got.index:
            n_ref = int((bins_a == bin_).sum())
            n_cur = int((bins_b == bin_).sum())
            p_ref = (n_ref + 1.0) / (t_ref + 10.0)
            p_cur = (n_cur + 1.0) / (t_cur + 10.0)
            term = (p_cur - p_ref) * math.log(p_cur / p_ref)
            row = got.loc[bin_]
            assert int(row["n_ref"]) == n_ref and int(row["n_cur"]) == n_cur
            assert abs(row["psi_term"] - term) < 1e-6
        # every observed bin is present
        assert set(got.index) == set(np.concatenate([bins_a, bins_b]).tolist())


class TestMannWhitney:
    def test_u_and_z_midranks(self, spark, purchase_halves):
        got = run(spark, "e_mann_whitney").iloc[0]
        a, b = purchase_halves
        pooled = pd.Series(np.concatenate([a, b]))
        ranks = pooled.rank(method="average").to_numpy()  # textbook midranks
        n1, n2 = len(a), len(b)
        r1 = float(ranks[:n1].sum())
        u1 = r1 - n1 * (n1 + 1) / 2.0
        z = (u1 - n1 * n2 / 2.0) / math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
        assert (int(got["n1"]), int(got["n2"])) == (n1, n2)
        assert abs(got["u1"] - u1) < 0.05
        assert abs(got["z_score"] - z) < 1e-3


class TestBenford:
    def test_digit_profile(self, spark, tbl):
        got = run(spark, "d_benford_profile").set_index("digit")
        o = tbl("orders")
        v = o[o.o_totalprice >= 1].o_totalprice
        digits = v.apply(lambda x: int(str(int(math.floor(x)))[0]))
        total = len(digits)
        for d in range(1, 10):
            n = int((digits == d).sum())
            if n == 0:
                assert d not in got.index
                continue
            share = n / total
            bp = math.log10(1 + 1 / d)
            chi2 = total * (share - bp) ** 2 / bp
            row = got.loc[d]
            assert int(row["n"]) == n
            assert abs(row["share"] - share) < 1e-6
            assert abs(row["benford_p"] - bp) < 1e-6
            assert abs(row["chi2_term"] - chi2) < 1e-3


class TestPowerLaw:
    def test_slope_exact_and_polyfit_twin(self, spark, tbl):
        got = run(spark, "d_powerlaw_slope").iloc[0]
        li = tbl("lineitem")[["l_orderkey", "l_partkey"]]
        m = li.merge(li, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        pairs = set(zip(m.l_partkey_x, m.l_partkey_y))
        deg: dict[int, int] = {}
        for x, y in pairs:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        buckets: dict[int, int] = {}
        for d in deg.values():
            buckets[int(math.floor(math.log2(d)))] = (
                buckets.get(int(math.floor(math.log2(d))), 0) + 1
            )
        xs = sorted(buckets)
        ys = [half_up(math.log2(buckets[x]) * 1000) for x in xs]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        assert int(got["n_buckets"]) == n
        assert int(got["slope_num"]) == num
        assert int(got["slope_den"]) == den
        assert int(got["slope_micro"]) == trunc_div(num * 1000, den)
        # independent twin: numpy least squares on the same log-log pts
        slope = np.polyfit(np.array(xs, float), np.array(ys, float) / 1000, 1)[0]
        assert abs(num / den / 1000 - slope) < 1e-6
