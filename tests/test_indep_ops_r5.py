"""Independent-derivation sweep, part 19: operations KPIs (backlog
aging, OTIF, brand rank shift, price endings, same-store growth).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestBacklogAging:
    def test_buckets(self, spark, tbl):
        got = run(spark, "q_backlog_aging").set_index("bucket")
        o = tbl("orders")
        od = o.o_orderdate.astype("int64")  # datetime64[us] -> us
        days = od // 86_400_000_000
        today = int(days.max())
        open_ = o.o_orderstatus == "O"
        buckets: dict[str, list[int]] = {}
        for d, v in zip(days[open_], o.o_totalprice[open_]):
            age = today - int(d)
            b = (
                "0-030"
                if age <= 30
                else ("031-060" if age <= 60 else ("061-090" if age <= 90 else "090+"))
            )
            buckets.setdefault(b, []).append(cents(v))
        assert set(got.index) == set(buckets)
        for b, vals in buckets.items():
            row = got.loc[b]
            assert int(row["n_orders"]) == len(vals)
            assert int(row["cents"]) == sum(vals)


class TestOtif:
    def test_all_or_nothing(self, spark, tbl):
        got = run(spark, "q_otif_rate").set_index("o_orderpriority")
        li, o = tbl("lineitem"), tbl("orders")
        df = li.merge(
            o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        sd = df.l_shipdate.astype("int64")   # datetime64[us] -> us
        odt = df.o_orderdate.astype("int64")
        df["on_time"] = sd <= odt + 30 * 86_400_000_000
        per = df.groupby("l_orderkey").agg(
            otif=("on_time", "all"), pri=("o_orderpriority", "first")
        )
        for pri, grp in per.groupby("pri"):
            n, k = len(grp), int(grp.otif.sum())
            row = got.loc[pri]
            assert int(row["n_orders"]) == n
            assert int(row["n_otif"]) == k
            assert int(row["otif_ppm"]) == k * 1_000_000 // n
            # OTIF <= line-level on-time share (the overstatement the
            # docstring warns about), checked independently
            line_rate = df[df.o_orderpriority == pri].on_time.mean()
            assert k / n <= line_rate + 1e-9


class TestRankShift:
    def test_leaderboard_moves(self, spark, tbl):
        got = run(spark, "q_brand_rank_shift").set_index("brand")
        li, part = tbl("lineitem"), tbl("part")
        df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
        df["y"] = pd.to_datetime(df.l_shipdate).dt.year
        df = df[df.y.isin([1997, 1998])]
        df["cc"] = [cents(v) for v in df.l_extendedprice]
        yr = df.groupby(["p_brand", "y"])["cc"].sum()
        ranks = {}
        for y in (1997, 1998):
            items = sorted(
                ((c, b) for (b, yy), c in yr.items() if yy == y),
                key=lambda t: (-t[0], t[1]),
            )
            # SQL rank(): ties share the smallest position
            r = {}
            for i, (c, b) in enumerate(items):
                same = [j for j, (c2, _) in enumerate(items) if c2 == c]
                r[b] = min(same) + 1
            ranks[y] = r
        for b in got.index:
            row = got.loc[b]
            assert int(row["rank_97"]) == ranks[1997][b]
            assert int(row["rank_98"]) == ranks[1998][b]
            assert int(row["places_gained"]) == ranks[1997][b] - ranks[1998][b]


class TestPriceEndings:
    def test_top10_profile(self, spark, tbl):
        got = run(spark, "d_price_endings")
        p = tbl("part")
        from collections import Counter

        c = Counter(cents(v) % 100 for v in p.p_retailprice)
        t = sum(c.values())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert len(got) == min(10, len(want))
        for (_, row), (e, n) in zip(got.iterrows(), want):
            assert int(row["ending_cents"]) == e
            assert int(row["n"]) == n
            assert int(row["share_ppm"]) == n * 1_000_000 // t


class TestSameStore:
    def test_comparable_growth(self, spark, tbl):
        got = run(spark, "q_same_store_growth").iloc[0]
        o = tbl("orders")
        o = o.assign(y=pd.to_datetime(o.o_orderdate).dt.year)
        o = o[o.y.isin([1997, 1998])]
        o["cc"] = [cents(v) for v in o.o_totalprice]
        yr = o.groupby(["o_custkey", "y"])["cc"].sum().unstack()
        both = yr.dropna()
        all97, all98 = int(yr.get(1997).fillna(0).sum()), int(yr.get(1998).fillna(0).sum())
        ss97, ss98 = int(both[1997].sum()), int(both[1998].sum())
        assert int(got["all_97"]) == all97 and int(got["all_98"]) == all98
        assert int(got["ss_97"]) == ss97 and int(got["ss_98"]) == ss98
        assert int(got["n_comparable"]) == len(both)
        assert int(got["all_growth_ppm"]) == trunc_div((all98 - all97) * 1_000_000, all97)
        assert int(got["same_store_growth_ppm"]) == trunc_div(
            (ss98 - ss97) * 1_000_000, ss97
        )
