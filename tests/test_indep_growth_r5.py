"""Independent-derivation sweep, part 16: growth accounting, loyalty
curves, life tables, decile migration, top-N folds.
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


class TestGrowthAccounting:
    def test_new_retained_resurrected(self, spark, tbl):
        got = run(spark, "q_growth_accounting").set_index("week")
        e = tbl("events")
        wk = e.ts.dt.to_period("W-SUN").dt.start_time
        um = pd.DataFrame({"u": e.user_id, "m": wk}).drop_duplicates()
        first = um.groupby("u")["m"].min()
        weeks = {}
        for uid, grp in um.groupby("u"):
            ms = sorted(grp.m)
            for prev, m in zip([None] + ms[:-1], ms):
                if m == first[uid]:
                    k = "new"
                elif prev is not None and prev == m - pd.Timedelta(days=7):
                    k = "retained"
                else:
                    k = "resurrected"
                w = weeks.setdefault(m, {"new": 0, "retained": 0, "resurrected": 0, "mau": 0})
                w[k] += 1
                w["mau"] += 1
        assert len(got) == len(weeks)
        for m, w in weeks.items():
            row = got.loc[m.strftime("%Y-%m-%d")]
            assert int(row["mau"]) == w["mau"]
            assert int(row["new_users"]) == w["new"]
            assert int(row["retained"]) == w["retained"]
            assert int(row["resurrected"]) == w["resurrected"]
            assert bool(row["conserved"])


class TestRepeatCurve:
    def test_loyalty_levels(self, spark, tbl):
        got = run(spark, "q_repeat_purchase_curve").set_index("at_least")
        c, o = tbl("customer"), tbl("orders")
        counts = o.groupby("o_custkey").size()
        per_cust = [int(counts.get(ck, 0)) for ck in c.c_custkey]
        total = len(per_cust)
        prev = None
        for lvl in range(1, 6):
            n = sum(1 for x in per_cust if x >= lvl)
            row = got.loc[lvl]
            assert int(row["n_customers"]) == n
            assert int(row["share_ppm"]) == n * 1_000_000 // total
            if prev is not None:
                assert n <= prev  # curve is non-increasing
            prev = n


class TestLifeTable:
    def test_at_risk_and_survival(self, spark, tbl):
        got = run(spark, "q_user_life_table").set_index("age")
        e = tbl("events")
        us = e.ts.astype("int64")
        life = pd.DataFrame({"u": e.user_id, "d": us // 86_400_000_000}).groupby("u")["d"].agg(["min", "max"])
        ages = (life["max"] - life["min"]).value_counts().sort_index()
        at_risk = int(ages.sum())
        for age, churn in ages.items():
            row = got.loc[age]
            assert int(row["n_churned"]) == churn
            assert int(row["n_at_risk"]) == at_risk
            assert int(row["survive_ppm"]) == (at_risk - churn) * 1_000_000 // at_risk
            at_risk -= churn
        assert at_risk == 0


class TestDecileMigration:
    def test_transition_census(self, spark, tbl):
        got = run(spark, "q_decile_migration").iloc[0]
        o = tbl("orders")
        o = o.assign(y=pd.to_datetime(o.o_orderdate).dt.year)
        o = o[o.y.isin([1995, 1996])]
        o["cc"] = [cents(v) for v in o.o_totalprice]
        spend = o.groupby(["o_custkey", "y"])["cc"].sum()

        def ntile10(items):
            # items: list of (cents, ck) sorted ascending; SQL ntile(10)
            n = len(items)
            out = {}
            base, rem = divmod(n, 10)
            idx = 0
            for tile in range(1, 11):
                size = base + (1 if tile <= rem else 0)
                for _ in range(size):
                    out[items[idx][1]] = tile
                    idx += 1
            return out

        decs = {}
        for y in (1995, 1996):
            items = sorted((c, ck) for (ck, yy), c in spend.items() if yy == y)
            decs[y] = ntile10(items)
        moves = [
            (decs[1995][ck], decs[1996][ck])
            for ck in decs[1995]
            if ck in decs[1996]
        ]
        assert int(got["n_customers"]) == len(moves)
        assert int(got["n_up"]) == sum(1 for f, t in moves if t > f)
        assert int(got["n_down"]) == sum(1 for f, t in moves if t < f)
        assert int(got["n_stable"]) == sum(1 for f, t in moves if t == f)
        assert int(got["n_collapsed"]) == sum(1 for f, t in moves if f >= 9 and t <= 2)
        assert int(got["net_drift"]) == sum(t - f for f, t in moves)


class TestTopNOther:
    def test_fold_and_shares(self, spark, tbl):
        got = run(spark, "q_topn_other_rollup").set_index("label")
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        df["cc"] = [cents(v) for v in df.l_extendedprice]
        b = df.groupby("p_brand")["cc"].sum()
        ranked = sorted(zip(b.values, b.index), key=lambda t: (-t[0], t[1]))
        top3 = {name for _, name in ranked[:3]}
        folded = {}
        for v, name in ranked:
            label = name if name in top3 else "OTHER"
            folded[label] = folded.get(label, 0) + int(v)
        total = sum(folded.values())
        assert set(got.index) == set(folded)
        for label, v in folded.items():
            row = got.loc[label]
            assert int(row["cents"]) == v
            assert int(row["share_ppm"]) == v * 1_000_000 // total
        # shares sum to ~1e6 (floor loss < #labels)
        assert 1_000_000 - got["share_ppm"].sum() < len(folded)


class TestCrosslangDupes:
    def test_nonvacuous_at_sf01(self, spark):
        """t_crosslang_dupes returns 0 rows at sf0.001/0.01 (verified:
        the small fixtures contain no cross-language duplicate text) —
        pin the NON-empty sf0.1 case independently so the entry is
        proven non-vacuous at gate scale, unlike the pre-fix
        q_decile_migration."""
        import hashlib
        from collections import defaultdict

        from parking_violations_data_pipeline_spark.registry import REGISTRY

        sf = "/root/testdata/sf0.1"
        got = REGISTRY["t_crosslang_dupes"].fn(spark, sf).toPandas()
        d = pd.read_parquet(f"{sf}/documents.parquet")
        d = d[d.text.str.len() > 0]
        fp = set(
            zip(
                d.lang,
                d.text.str.lower().str.strip().map(
                    lambda t: hashlib.md5(t.encode()).hexdigest()
                ),
            )
        )
        by_h = defaultdict(set)
        for lang, h in fp:
            by_h[h].add(lang)
        pairs: dict[tuple[str, str], int] = {}
        for langs in by_h.values():
            ls = sorted(langs)
            for i in range(len(ls)):
                for j in range(i + 1, len(ls)):
                    pairs[(ls[i], ls[j])] = pairs.get((ls[i], ls[j]), 0) + 1
        assert len(pairs) > 0, "sf0.1 fixture should contain cross-lang dupes"
        assert len(got) == len(pairs)
        for _, row in got.iterrows():
            assert pairs[(row["lang_a"], row["lang_b"])] == int(row["n_shared"])
