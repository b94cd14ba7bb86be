"""Independent-derivation sweep, part 27: windowed funnels, Markov
transitions, brand switching, ABC×XYZ matrix, scenario sweeps.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div

HOUR_US = 3_600_000_000


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestWindowedFunnel:
    def test_per_step_timeouts(self, spark, tbl):
        got = run(spark, "q_funnel_windowed").iloc[0]
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame({"u": e.user_id, "et": e.event_type, "us": us})
        t1 = df[df.et == "view"].groupby("u")["us"].min()
        t2 = {}
        for u, grp in df[df.et == "click"].groupby("u"):
            if u in t1.index:
                cand = grp.us[(grp.us > t1[u]) & (grp.us <= t1[u] + 24 * HOUR_US)]
                if len(cand):
                    t2[u] = cand.min()
        t3 = {}
        for u, grp in df[df.et == "purchase"].groupby("u"):
            if u in t2:
                cand = grp.us[(grp.us > t2[u]) & (grp.us <= t2[u] + 24 * HOUR_US)]
                if len(cand):
                    t3[u] = cand.min()
        assert int(got["n_view"]) == len(t1)
        assert int(got["n_click_24h"]) == len(t2)
        assert int(got["n_purchase_24h"]) == len(t3)
        assert abs(got["conversion"] - len(t3) / len(t1)) < 1e-4


class TestPathTransitions:
    def test_markov_pairs(self, spark, tbl):
        got = run(spark, "e_path_transitions")
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame({"u": e.user_id, "et": e.event_type, "us": us, "eid": e.event_id})
        trans: Counter = Counter()
        for u, grp in df.groupby("u"):
            seq = [et for _, _, et in sorted(zip(grp.us, grp.eid, grp.et))]
            for a, b in zip(seq, seq[1:]):
                trans[(a, b)] += 1
        want = sorted(trans.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:15]
        assert len(got) == min(15, len(want))
        for (_, g), ((a, b), n) in zip(got.iterrows(), want):
            assert (g["src"], g["dst"]) == (a, b)
            assert int(g["n"]) == n
        # conservation: total transitions = total events - n_users
        assert sum(trans.values()) == len(df) - df.u.nunique()


class TestBrandSwitching:
    def test_favorite_transitions(self, spark, tbl):
        got = run(spark, "q_brand_switching_matrix").set_index(["brand_97", "brand_98"])
        li, o, p = tbl("lineitem"), tbl("orders"), tbl("part")
        df = li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        df = df.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        df["y"] = pd.to_datetime(df.l_shipdate).dt.year
        df = df[df.y.isin([1997, 1998])]
        df["cc"] = [cents(v) for v in df.l_extendedprice]
        spend = df.groupby(["o_custkey", "p_brand", "y"])["cc"].sum()
        fav = {}
        for (cust, y), grp in spend.groupby(level=[0, 2]):
            best = sorted(
                ((c, b) for (_, b, _), c in grp.items()), key=lambda t: (-t[0], t[1])
            )[0][1]
            fav[(cust, y)] = best
        trans: Counter = Counter()
        for (cust, y), b97 in fav.items():
            if y == 1997 and (cust, 1998) in fav:
                trans[(b97, fav[(cust, 1998)])] += 1
        expect = {k: n for k, n in trans.items() if n >= 3}
        assert len(got) == len(expect)
        for (a, b), n in expect.items():
            row = got.loc[(a, b)]
            assert int(row["n_customers"]) == n
            assert row["kind"] == ("loyal" if a == b else "switched")


class TestAbcXyz:
    def test_nine_cell_matrix(self, spark, tbl):
        got = run(spark, "q_abc_xyz_matrix").set_index(["abc", "xyz"])
        li = tbl("lineitem")
        sd = pd.to_datetime(li.l_shipdate)
        df = pd.DataFrame(
            {
                "pk": li.l_partkey,
                "m": sd.dt.year * 12 + sd.dt.month - 1,
                "q": li.l_quantity.astype(int),
                "c": [cents(v) for v in li.l_extendedprice],
            }
        )
        monthly = df.groupby(["pk", "m"]).agg(q=("q", "sum"), c=("c", "sum"))
        per_part = monthly.groupby(level=0).agg(
            n=("q", "size"), s1=("q", "sum"), s2=("q", lambda s: int((s * s).sum())), c=("c", "sum")
        )
        rows = sorted(
            zip(per_part.c, per_part.index, per_part.n, per_part.s1, per_part.s2),
            key=lambda t: (-t[0], t[1]),
        )
        tot = sum(r[0] for r in rows)
        cells: dict[tuple[str, str], list[int]] = {}
        cum = 0
        for c, pk, n, s1, s2 in rows:
            cum += c
            abc = "A" if cum * 10 <= tot * 7 else ("B" if cum * 10 <= tot * 9 else "C")
            d = n * s2 - s1 * s1
            xyz = "X" if 4 * d <= s1 * s1 else ("Y" if d <= s1 * s1 else "Z")
            e = cells.setdefault((abc, xyz), [0, 0])
            e[0] += 1
            e[1] += int(c)
        assert set(got.index) == set(cells)
        for key, (n, c) in cells.items():
            row = got.loc[key]
            assert int(row["n_parts"]) == n
            assert int(row["cents"]) == c


class TestScenarioSweep:
    def test_grid_pricing(self, spark, tbl):
        got = run(spark, "q_scenario_sweep").set_index("extra_disc_pct")
        li = tbl("lineitem")
        base = [(cents(p), cents(d) // 1) for p, d in zip(li.l_extendedprice, li.l_discount)]
        # l_discount is a fraction; disc_pct = round(d*100)
        from decimal import ROUND_HALF_UP, Decimal

        discs = [
            int(Decimal(repr(d * 100)).to_integral_value(ROUND_HALF_UP))
            for d in li.l_discount
        ]
        prices = [cents(p) for p in li.l_extendedprice]
        prev_net = None
        for extra in (0, 5, 10, 15, 20):
            net = sum(
                trunc_div(c * (100 - min(d + extra, 100)), 100)
                for c, d in zip(prices, discs)
            )
            row = got.loc[extra]
            assert int(row["n_lines"]) == len(prices)
            assert int(row["net_cents"]) == net
            if prev_net is not None:
                assert net < prev_net  # more discount, less revenue
            prev_net = net
