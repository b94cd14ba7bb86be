"""Independent-derivation sweep, part 2: association, concentration,
and rank-based effect sizes. Same protocol as part 1: run the Spark
entry at sf0.001, re-derive from raw parquet with numpy/pure-python
textbook forms sharing nothing with the engine or its oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div  # noqa: F401


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestRegression:
    def test_regr_aggs_match_polyfit(self, spark, tbl):
        got = run(spark, "d_regression").set_index("event_type")
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame(
            {"et": e.event_type, "x": (us // 3_600_000_000).astype(float), "y": e.value}
        )
        for et, grp in df.groupby("et"):
            slope, intercept = np.polyfit(grp.x, grp.y, 1)
            pred = intercept + slope * grp.x
            ss_res = ((grp.y - pred) ** 2).sum()
            ss_tot = ((grp.y - grp.y.mean()) ** 2).sum()
            r2 = 1 - ss_res / ss_tot
            assert int(got.loc[et, "n"]) == len(grp)
            assert abs(got.loc[et, "slope"] - slope) < 1e-5
            assert abs(got.loc[et, "intercept"] - intercept) < 1e-3
            assert abs(got.loc[et, "r2"] - r2) < 1e-5


class TestRobustDispersion:
    def test_mad(self, spark, tbl):
        got = run(spark, "d_mad_robust").set_index("l_returnflag")
        li = tbl("lineitem")
        for rf, grp in li.groupby("l_returnflag"):
            med = float(np.median(grp.l_quantity))
            mad = float(np.median(np.abs(grp.l_quantity - med)))
            assert abs(got.loc[rf, "med_qty"] - med) < 1e-9
            assert abs(got.loc[rf, "mad"] - mad) < 1e-9


class TestConcentration:
    def test_gini(self, spark, tbl):
        got = run(spark, "d_gini_coefficient").set_index("nation")
        o, c, nat = tbl("orders"), tbl("customer"), tbl("nation")
        df = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        df["cc"] = [cents(v) for v in df.o_totalprice]
        spend = df.groupby(["c_nationkey", "o_custkey"])["cc"].sum()
        names = nat.set_index("n_nationkey")["n_name"]
        for nk, grp in spend.groupby(level=0):
            x = np.sort(grp.to_numpy())
            n, tot = len(x), int(x.sum())
            rank_mass = int((np.arange(1, n + 1) * x).sum())
            ppm = trunc_div(
                2 * rank_mass - (n + 1) * tot, max(trunc_div(n * tot, 1_000_000), 1)
            )
            name = names[nk]
            assert int(got.loc[name, "n_customers"]) == n
            assert int(got.loc[name, "gini_ppm"]) == ppm
            # true independent twin: mean-absolute-difference Gini
            if n > 1 and tot > 0:
                mad_g = np.abs(x[:, None] - x[None, :]).sum() / (2 * n * tot)
                assert abs(ppm / 1e6 - mad_g) < 2e-3

    def test_hhi(self, spark, tbl):
        got = run(spark, "d_hhi_concentration").set_index("nation")
        li, s, nat = tbl("lineitem"), tbl("supplier"), tbl("nation")
        df = li.merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        df = df.merge(nat[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey")
        df["cc"] = [cents(v) for v in df.l_extendedprice]
        rev = df.groupby(["n_name", "s_suppkey"])["cc"].sum()
        for name, grp in rev.groupby(level=0):
            x = grp.to_numpy()
            tot = int(x.sum())
            shares = [v * 1_000_000 // tot for v in map(int, x)]
            hhi = sum(sp * sp for sp in shares) // 1_000_000
            assert int(got.loc[name, "n_supps"]) == len(x)
            assert int(got.loc[name, "hhi_ppm"]) == hhi
            assert int(got.loc[name, "top_share_ppm"]) == max(shares)
            # float twin within quantization error
            hhi_f = float(((x / tot) ** 2).sum())
            assert abs(hhi / 1e6 - hhi_f) < 5e-4


class TestRankEffectSizes:
    def test_auc(self, spark, tbl):
        got = run(spark, "d_auc_rank").iloc[0]
        e = tbl("events")
        e = e[e.value > 0]
        score = np.array([cents(v) for v in e.value], dtype=np.int64)
        pos = (e.event_type == "purchase").to_numpy()
        eid = e.event_id.to_numpy()
        order = np.lexsort((eid, score))
        rnk = np.empty(len(score), dtype=np.int64)
        rnk[order] = np.arange(1, len(score) + 1)
        n1, n0 = int(pos.sum()), int((~pos).sum())
        rank_sum = int(rnk[pos].sum())
        u = rank_sum - n1 * (n1 + 1) // 2
        assert int(got["n_pos"]) == n1 and int(got["n_neg"]) == n0
        assert int(got["u_statistic"]) == u
        assert int(got["auc_ppm"]) == u * 1_000_000 // (n1 * n0)
        # independent twin: AUC as P(s_pos > s_neg) + 0.5 P(tie),
        # vs their full-key-rank convention (tie noise bounded)
        sp, sn = score[pos], score[~pos]
        gt = (sp[:, None] > sn[None, :]).sum()
        eq = (sp[:, None] == sn[None, :]).sum()
        auc = (gt + 0.5 * eq) / (n1 * n0)
        tie_frac = eq / (n1 * n0)
        assert abs(u / (n1 * n0) - auc) <= 0.5 * tie_frac + 1e-9


class TestContingency:
    def _contingency(self, tbl):
        e = tbl("events")
        cohort = np.where(e.ts.dt.day <= 15, 0, 1)
        return pd.crosstab(e.event_type, cohort)

    def test_chi2_cells(self, spark, tbl):
        got = run(spark, "d_chi2_independence").set_index(["event_type", "cohort"])
        ct = self._contingency(tbl)
        n = ct.values.sum()
        for et in ct.index:
            for coh in ct.columns:
                o = ct.loc[et, coh]
                exp = ct.loc[et].sum() * ct[coh].sum() / n
                term = (o - exp) ** 2 / exp
                row = got.loc[(et, coh)]
                assert int(row["o"]) == o
                assert abs(row["expected"] - exp) < 1e-3
                assert abs(row["chi2_term"] - term) < 1e-5

    def test_cramers_v(self, spark, tbl):
        got = run(spark, "d_cramers_v").iloc[0]
        li = tbl("lineitem")
        ct = pd.crosstab(li.l_returnflag, li.l_linestatus)
        n = ct.values.sum()
        exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
        chi2 = float(((ct.values - exp) ** 2 / exp).sum())
        k = min(ct.shape) - 1
        v = math.sqrt(chi2 / (n * k))
        assert int(got["n"]) == n
        assert (int(got["n_rows"]), int(got["n_cols"])) == ct.shape
        assert abs(got["chi2"] - chi2) < 1e-4
        assert abs(got["cramers_v"] - v) < 1e-5


class TestProportions:
    def test_two_proportion_z(self, spark, tbl):
        got = run(spark, "d_ab_proportions_ztest").iloc[0]
        e = tbl("events")
        conv = (
            e.assign(hit=((e.event_type == "purchase") & (e.value > 150)).astype(int))
            .groupby("user_id")["hit"]
            .max()
        )
        a = conv[conv.index % 2 == 0]
        b = conv[conv.index % 2 == 1]
        na, nb = len(a), len(b)
        ca, cb = int(a.sum()), int(b.sum())
        pa, pb = ca / na, cb / nb
        pool = (ca + cb) / (na + nb)
        z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
        assert (int(got["n_a"]), int(got["n_b"])) == (na, nb)
        assert (int(got["conv_a"]), int(got["conv_b"])) == (ca, cb)
        assert abs(got["p_a"] - pa) < 1e-6 and abs(got["p_b"] - pb) < 1e-6
        assert abs(got["z_score"] - z) < 1e-3


class TestMutualInformation:
    def test_mi(self, spark, tbl):
        got = run(spark, "d_mutual_information").iloc[0]
        d = tbl("documents")
        ct = pd.crosstab(d.lang, d.source)
        n = ct.values.sum()
        ri, cj = ct.sum(axis=1), ct.sum(axis=0)
        pmis = []
        mi_w = 0
        for lang in ct.index:
            for src in ct.columns:
                nij = int(ct.loc[lang, src])
                if nij == 0:
                    continue
                pmi = round(math.log(nij * n / (ri[lang] * cj[src])) * 1_000_000)
                pmis.append(pmi)
                mi_w += nij * pmi
        assert int(got["n_cells"]) == len(pmis)
        assert int(got["max_pmi_micro"]) == max(pmis)
        assert int(got["min_pmi_micro"]) == min(pmis)
        assert abs(int(got["mi_weighted_micro"]) - mi_w) <= len(pmis)
        # independent twin: MI in nats computed directly
        mi = 0.0
        for lang in ct.index:
            for src in ct.columns:
                nij = ct.loc[lang, src]
                if nij:
                    mi += (nij / n) * math.log(nij * n / (ri[lang] * cj[src]))
        assert abs(mi_w / 1e6 / n - mi) < 1e-4
