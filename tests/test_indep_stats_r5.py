"""Independent-derivation sweep, part 1: classic statistics
(VERDICT r4 next-round #1). Each test runs the REGISTERED Spark entry
at sf0.001 and re-derives the statistic from the raw parquet with
numpy / stdlib / textbook pure-python — code sharing NOTHING with the
engine or its DuckDB oracle. This attacks the residual risk class the
oracle can't see: a bug self-consistent across both authored sides
(the round-4 Luhn defect was exactly this, caught only by an
independent implementation).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def run(spark, name: str) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, SF).toPandas()


def cents(x: float) -> int:
    """HALF_UP integer cents of a double — mirrors Spark's
    round(value*100, 0) (BigDecimal.valueOf uses shortest repr, as
    Python's repr does)."""
    return int(Decimal(repr(x * 100)).to_integral_value(ROUND_HALF_UP))


def trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark `div`)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestTTests:
    def test_welch(self, spark, tbl):
        got = run(spark, "d_ttest_welch").iloc[0]
        e = tbl("events")
        p = e[e.event_type == "purchase"]
        x = np.array([cents(v) for v in p.value], dtype=np.float64)
        early = (p.ts.dt.day <= 15).to_numpy()
        a, b = x[early], x[~early]
        n1, n2 = len(a), len(b)
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        se2 = v1 / n1 + v2 / n2
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
        assert int(got["n_early"]) == n1 and int(got["n_late"]) == n2
        assert abs(got["mean_diff_cents"] - (a.mean() - b.mean())) < 5e-4
        assert abs(got["t_stat"] - t) < 1e-3
        assert abs(got["df_welch"] - df) < 0.02

    def test_paired(self, spark, tbl):
        got = run(spark, "d_ttest_paired").iloc[0]
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        df["y"] = pd.to_datetime(df.l_shipdate).dt.year
        df = df[df.y.isin([1997, 1998])]
        df["c"] = [cents(v) for v in df.l_extendedprice]
        yr = df.groupby(["p_brand", "y"])["c"].sum().unstack()
        yr = yr.dropna()
        d = (yr[1998] - yr[1997]).to_numpy(dtype=np.float64)
        n = len(d)
        t = d.mean() / (d.std(ddof=1) / math.sqrt(n))
        assert int(got["n"]) == n
        assert int(got["sum_delta_cents"]) == int(d.sum())
        assert abs(got["t_stat"] - t) < 1e-4


class TestRankCorrelations:
    def test_spearman(self, spark, tbl):
        got = run(spark, "d_spearman_rho").iloc[0]
        c, o = tbl("customer"), tbl("orders")
        spend_map = (
            o.assign(c=[cents(v) for v in o.o_totalprice])
            .groupby("o_custkey")["c"]
            .sum()
        )
        base = pd.DataFrame(
            {
                "ck": c.c_custkey,
                "bal": [cents(v) for v in c.c_acctbal],
            }
        )
        base["spend"] = base.ck.map(spend_map).fillna(0).astype(int)
        n = len(base)
        # deterministic full-key ranks: position in sort by (value, ck)
        rx = np.empty(n, dtype=np.int64)
        rx[np.lexsort((base.ck.to_numpy(), base.bal.to_numpy()))] = np.arange(1, n + 1)
        ry = np.empty(n, dtype=np.int64)
        ry[np.lexsort((base.ck.to_numpy(), base.spend.to_numpy()))] = np.arange(1, n + 1)
        d2 = int(((rx - ry) ** 2).sum())
        assert int(got["n"]) == n
        assert int(got["sum_d2"]) == d2
        assert int(got["denom6"]) == n * (n * n - 1)
        rho = 1 - 6 * d2 / (n * (n * n - 1))
        assert bool(got["strong_positive"]) == (rho > 0.5)

    def test_kendall(self, spark, tbl):
        got = run(spark, "d_kendall_tau").iloc[0]
        o, c, nat = tbl("orders"), tbl("customer"), tbl("nation")
        df = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        df = df.merge(nat[["n_nationkey", "n_name"]], left_on="c_nationkey", right_on="n_nationkey")
        df["rc"] = [cents(v) for v in df.o_totalprice]
        m = df.groupby("n_name").agg(rev=("rc", "sum"), nc=("o_custkey", "nunique"))
        vals = list(m.itertuples(index=False))
        C = D = P = 0
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                P += 1
                s = (vals[i].rev - vals[j].rev) * (vals[i].nc - vals[j].nc)
                if s > 0:
                    C += 1
                elif s < 0:
                    D += 1
        assert int(got["n_pairs"]) == P
        assert int(got["concordant"]) == C
        assert int(got["discordant"]) == D
        # with C >= D (true on this data) floor == trunc; pin exact ppm
        assert C >= D, "sign flip would expose div-vs-floor semantics; revisit"
        assert int(got["tau_a_ppm"]) == (C - D) * 1_000_000 // P


class TestResidualDiagnostics:
    def test_durbin_watson_integer_pipeline_and_ols_twin(self, spark, tbl):
        got = run(spark, "d_durbin_watson").set_index("event_type")
        e = tbl("events")
        us = e.ts.astype("int64")  # datetime64[us] -> microseconds
        df = pd.DataFrame(
            {
                "et": e.event_type,
                "h": us // 3_600_000_000,
                "c": [cents(v) for v in e.value],
            }
        )
        for et, grp in df.groupby("et"):
            y = grp.groupby("h")["c"].sum().sort_index().to_numpy()
            n = len(y)
            x = np.arange(1, n + 1)
            # (a) exact integer transcription twin (python bigints)
            sx, sy = int(x.sum()), int(y.sum())
            sxx = int((x * x).sum())
            sxy = int((x * y).sum())
            Dd = n * sxx - sx * sx
            S = n * sxy - sx * sy
            r = [
                trunc_div(
                    int(yi) * n * Dd - sy * Dd + S * sx - S * n * int(xi), 1_000_000
                )
                for xi, yi in zip(x, y)
            ]
            num = sum((r[i] - r[i - 1]) ** 2 for i in range(1, n))
            den = max(sum(v * v for v in r), 1)
            dw_micro = trunc_div(num * 1_000_000, den)
            assert int(got.loc[et, "n"]) == n
            assert int(got.loc[et, "dw_micro"]) == dw_micro
            # (b) true independent twin: numpy OLS residual DW
            beta, alpha = np.polyfit(x, y.astype(float), 1)
            res = y - (alpha + beta * x)
            dw = np.sum(np.diff(res) ** 2) / np.sum(res**2)
            assert abs(dw_micro / 1e6 - dw) < 1e-3


class TestMoments:
    def test_skew_kurtosis(self, spark, tbl):
        got = run(spark, "d_moments_exact").set_index("event_type")
        e = tbl("events")
        for et in ("click", "purchase"):
            x = np.array(
                [cents(v) for v in e[e.event_type == et].value], dtype=np.float64
            )
            m2 = ((x - x.mean()) ** 2).mean()
            m3 = ((x - x.mean()) ** 3).mean()
            m4 = ((x - x.mean()) ** 4).mean()
            skew = m3 / m2**1.5
            kurt = m4 / m2**2 - 3
            assert int(got.loc[et, "n"]) == len(x)
            assert abs(got.loc[et, "skewness"] - skew) < 1e-4
            assert abs(got.loc[et, "excess_kurtosis"] - kurt) < 1e-4
