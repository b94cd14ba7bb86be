"""Independent-derivation sweep, part 22: TPC-H decision-support
shapes re-derived in pandas (EXISTS, correlated scalar subquery,
NOT IN, anti-join + global-average predicate). Unlike the rest of the
sweep these entries run the SAME SQL on the oracle side, so a pandas
re-derivation is the first truly third-party check of the semantics
(join cardinality, EXISTS dedup, correlated-average thresholds).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestQ4:
    def test_exists_semantics(self, spark, tbl):
        got = run(spark, "q4_order_priority").set_index("o_orderpriority")
        o, li = tbl("orders"), tbl("lineitem")
        o = o[
            (o.o_orderdate >= "1996-01-01") & (o.o_orderdate < "1996-04-01")
        ]
        merged = o.merge(li[["l_orderkey", "l_shipdate"]], left_on="o_orderkey", right_on="l_orderkey")
        # EXISTS: at least one line shipped after order date — dedup!
        hits = merged[merged.l_shipdate > merged.o_orderdate].o_orderkey.unique()
        sel = o[o.o_orderkey.isin(hits)]
        expect = sel.groupby("o_orderpriority").size()
        assert len(got) == len(expect)
        for pri, n in expect.items():
            assert int(got.loc[pri, "order_count"]) == n


class TestQ12:
    def test_late_lines(self, spark, tbl):
        got = run(spark, "q12_late_lines_priority").set_index("l_returnflag")
        o, li = tbl("orders"), tbl("lineitem")
        df = li.merge(o[["o_orderkey", "o_orderdate", "o_orderpriority"]], left_on="l_orderkey", right_on="o_orderkey")
        df = df[
            df.l_returnflag.isin(["R", "A"])
            & (df.l_shipdate >= df.o_orderdate + pd.Timedelta(days=80))
            & (df.l_shipdate >= "1996-01-01")
            & (df.l_shipdate < "1998-01-01")
        ]
        for rf, grp in df.groupby("l_returnflag"):
            hi = grp.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).sum()
            row = got.loc[rf]
            assert int(row["high_line_count"]) == hi
            assert int(row["low_line_count"]) == len(grp) - hi


class TestQ16:
    def test_not_in_supplier_count(self, spark, tbl):
        got = run(spark, "q16_supplier_cnt")
        p, li, s = tbl("part"), tbl("lineitem"), tbl("supplier")
        bad = set(s[s.s_acctbal < 0].s_suppkey)
        df = p.merge(li[["l_partkey", "l_suppkey"]], left_on="p_partkey", right_on="l_partkey")
        df = df[
            (df.p_brand != "Brand#1")
            & df.p_size.isin([1, 5, 10, 15, 20, 25, 30, 35])
            & ~df.l_suppkey.isin(bad)
        ]
        expect = (
            df.groupby(["p_brand", "p_size"])["l_suppkey"].nunique().reset_index()
        )
        expect = expect.sort_values(
            ["l_suppkey", "p_brand", "p_size"], ascending=[False, True, True]
        )
        assert len(got) == len(expect)
        for (_, g), (_, w) in zip(got.iterrows(), expect.iterrows()):
            assert (g["p_brand"], int(g["p_size"])) == (w.p_brand, int(w.p_size))
            assert int(g["supplier_cnt"]) == int(w.l_suppkey)


class TestQ17:
    def test_correlated_average(self, spark, tbl):
        got = run(spark, "q17_small_qty_orders").iloc[0]
        li, p = tbl("lineitem"), tbl("part")
        avg_qty = li.groupby("l_partkey")["l_quantity"].mean()
        keys = set(p[p.p_brand == "Brand#11"].p_partkey)
        sel = li[li.l_partkey.isin(keys)]
        sel = sel[sel.l_quantity < 0.2 * sel.l_partkey.map(avg_qty)]
        assert int(got["cnt"]) == len(sel)
        assert abs(got["avg_yearly"] - round(sel.l_extendedprice.sum() / 7.0, 2)) < 5e-3


class TestQ22:
    def test_idle_rich_customers(self, spark, tbl):
        got = run(spark, "q22_idle_customers").set_index("n_name")
        c, n, o = tbl("customer"), tbl("nation"), tbl("orders")
        pos = c[c.c_acctbal > 0]
        s_cents = sum(cents(v) for v in pos.c_acctbal)
        n_pos = len(pos)
        recent = set(o[o.o_orderdate >= "2000-01-01"].o_custkey)
        sel = c[
            c.c_acctbal.map(lambda v: cents(v) * n_pos > s_cents)
            & ~c.c_custkey.isin(recent)
        ]
        sel = sel.merge(n[["n_nationkey", "n_name"]], left_on="c_nationkey", right_on="n_nationkey")
        expect = sel.groupby("n_name").agg(
            numcust=("c_custkey", "size"), tot=("c_acctbal", "sum")
        )
        assert len(got) == len(expect)
        for name, r in expect.iterrows():
            row = got.loc[name]
            assert int(row["numcust"]) == int(r.numcust)
            assert abs(row["totacctbal"] - round(r.tot, 2)) < 1e-6
