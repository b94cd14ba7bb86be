"""Independent-derivation sweep, part 10: elasticity, PageRank,
attribution conservation, diff-in-diff, p-chart, decay weighting.
"""

from __future__ import annotations

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


class TestElasticity:
    def test_arc_elasticity(self, spark, tbl):
        got = run(spark, "q_price_elasticity").set_index("brand")
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        df["y"] = pd.to_datetime(df.l_shipdate).dt.year
        df = df[df.y.isin([1997, 1998])]
        df["c"] = [cents(v) for v in df.l_extendedprice]
        yr = df.groupby(["p_brand", "y"]).agg(q=("l_quantity", "sum"), c=("c", "sum"))
        for brand in got.index:
            r0, r1 = yr.loc[(brand, 1997)], yr.loc[(brand, 1998)]
            p0 = trunc_div(int(r0.c) * 1000, int(r0.q))
            p1 = trunc_div(int(r1.c) * 1000, int(r1.q))
            dq = int(r1.q) - int(r0.q)
            row = got.loc[brand]
            assert int(row["dp_milli"]) == p1 - p0
            assert int(row["dq"]) == dq
            den = int(r0.q) * (p1 - p0)
            if den == 0:
                assert pd.isna(row["elasticity_ppm"])
            else:
                el = trunc_div(dq * p0 * 1_000_000, den)
                assert int(row["elasticity_ppm"]) == el
                # float textbook twin: (dq/q0)/(dp/p0)
                ef = (dq / r0.q) / ((p1 - p0) / p0)
                assert abs(el / 1e6 - ef) < 2e-3


class TestPageRank:
    def test_integer_iterations_and_float_twin(self, spark, tbl):
        got = run(spark, "q_trade_pagerank").set_index("nation")
        li, o, c, s, nat = (
            tbl("lineitem"),
            tbl("orders"),
            tbl("customer"),
            tbl("supplier"),
            tbl("nation"),
        )
        df = li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        df = df.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        df = df.merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        names = nat.set_index("n_nationkey")["n_name"]
        df["src"] = df.s_nationkey.map(names)
        df["dst"] = df.c_nationkey.map(names)
        df["cc"] = [cents(v) for v in df.l_extendedprice]
        rev = df.groupby(["src", "dst"])["cc"].sum()
        edges = {
            (a, b): v // 100_000 for (a, b), v in rev.items() if v // 100_000 > 0
        }
        out_w = {}
        for (a, _), w in edges.items():
            out_w[a] = out_w.get(a, 0) + w
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        r = {nd: 1_000_000 for nd in nodes}
        for _ in range(10):
            contrib = {nd: 0 for nd in nodes}
            for (a, b), w in edges.items():
                contrib[b] += trunc_div(r[a] * w, out_w[a])
            r = {nd: 150_000 + trunc_div(85 * contrib[nd], 100) for nd in nodes}
        for nd in nodes:
            assert int(got.loc[nd, "rank_micro"]) == r[nd]
        # independent float twin: damped PR without quantization agrees
        # within the integer-floor error envelope
        rf = {nd: 1.0 for nd in nodes}
        for _ in range(10):
            contrib = {nd: 0.0 for nd in nodes}
            for (a, b), w in edges.items():
                contrib[b] += rf[a] * w / out_w[a]
            rf = {nd: 0.15 + 0.85 * contrib[nd] for nd in nodes}
        for nd in nodes:
            assert abs(r[nd] / 1e6 - rf[nd]) < 0.01


class TestAttribution:
    def test_conservation_and_split(self, spark, tbl):
        got = run(spark, "q_multi_touch_attribution").set_index("event_type")
        e = tbl("events")
        touches = e[e.event_type.isin(["click", "view", "search"])]
        conv = (
            e[e.event_type == "purchase"]
            .assign(c=[cents(v) for v in e[e.event_type == "purchase"].value])
            .groupby("user_id")["c"]
            .sum()
        )
        credit: dict[str, int] = {}
        counts: dict[str, int] = {}
        total_credit = 0
        total_conv = 0
        for uid, grp in touches.groupby("user_id"):
            if uid not in conv.index:
                continue
            cc = int(conv[uid])
            total_conv += cc * 1000
            rows = sorted(zip(grp.ts.astype("int64"), grp.event_id, grp.event_type))
            n = len(rows)
            base = cc * 1000 // n
            for i, (_, _, et) in enumerate(rows):
                amt = base + (cc * 1000 - base * n if i == n - 1 else 0)
                credit[et] = credit.get(et, 0) + amt
                counts[et] = counts.get(et, 0) + 1
                total_credit += amt
        assert total_credit == total_conv  # exact conservation
        for et in credit:
            row = got.loc[et]
            assert int(row["n_touches"]) == counts[et]
            assert int(row["credit_millicents"]) == credit[et]
            assert bool(row["conserved"])


class TestDiffInDiff:
    def test_did(self, spark, tbl):
        got = run(spark, "q_diff_in_diff").iloc[0]
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_type"]], left_on="l_partkey", right_on="p_partkey")
        df["y"] = pd.to_datetime(df.l_shipdate).dt.year
        df = df[df.y.isin([1997, 1998])]
        df["grp"] = np.where(df.p_type.str.startswith("PROMO"), "promo", "base")
        df["c"] = [cents(v) for v in df.l_extendedprice]
        agg = df.groupby(["grp", "y"]).agg(c=("c", "sum"), n=("c", "size"))
        dplm = {}
        for g in ("promo", "base"):
            c97, n97 = int(agg.loc[(g, 1997), "c"]), int(agg.loc[(g, 1997), "n"])
            c98, n98 = int(agg.loc[(g, 1998), "c"]), int(agg.loc[(g, 1998), "n"])
            dplm[g] = trunc_div(c98 * 1000, n98) - trunc_div(c97 * 1000, n97)
            if g == "promo":
                assert int(got["promo_delta_cents"]) == c98 - c97
            else:
                assert int(got["base_delta_cents"]) == c98 - c97
        assert int(got["did_per_line_milli"]) == dplm["promo"] - dplm["base"]


class TestPChart:
    def test_binomial_3sigma(self, spark, tbl):
        got = run(spark, "q_returns_p_chart").iloc[0]
        li = tbl("lineitem")
        sd = pd.to_datetime(li.l_shipdate)
        df = pd.DataFrame(
            {
                "m": sd.dt.year * 12 + sd.dt.month - 1,
                "r": (li.l_returnflag == "R").astype(int),
            }
        )
        g = df.groupby("m").agg(n=("r", "size"), x=("r", "sum"))
        N, P = int(g.n.sum()), int(g.x.sum())
        n_ooc = 0
        rates = []
        for _, row in g.iterrows():
            n, x = int(row.n), int(row.x)
            rates.append(x * 1_000_000 // n)
            # float twin: |p_i - pbar| > 3*sqrt(pbar(1-pbar)/n)
            pbar = P / N
            if abs(x / n - pbar) > 3 * math.sqrt(pbar * (1 - pbar) / n) and (
                x * N - P * n
            ) != 0:
                n_ooc += 1
        assert int(got["n_months"]) == len(g)
        assert int(got["n_ooc"]) == n_ooc
        assert int(got["min_rate_ppm"]) == min(rates)
        assert int(got["max_rate_ppm"]) == max(rates)


class TestWeightedDecay:
    def test_exponential_recency(self, spark, tbl):
        got = run(spark, "q_weighted_decay").set_index("event_type")
        e = tbl("events")
        anchor = pd.Timestamp("2024-02-01 00:00:00").value // 1000  # us
        us = e.ts.astype("int64")
        w = np.exp(-(anchor - us).astype(float) / (7.0 * 86400.0 * 1e6))
        df = pd.DataFrame({"et": e.event_type, "dv": e.value * w, "v": e.value})
        for et, grp in df.groupby("et"):
            row = got.loc[et]
            assert abs(row["decayed"] - grp.dv.sum()) < 5e-3
            assert abs(row["raw"] - grp.v.sum()) < 5e-3
