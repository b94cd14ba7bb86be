"""Independent-derivation sweep, part 13: builtin stat aggregates,
z-score anomalies, Pareto/ABC cutoffs, rolling correlation, interval
merging. numpy/pure-python textbook twins vs the Spark entries at
sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestNumericStats:
    def test_builtin_aggs_vs_numpy(self, spark, tbl):
        got = run(spark, "d_numeric_stats").set_index("l_returnflag")
        li = tbl("lineitem")
        for rf, grp in li.groupby("l_returnflag"):
            p = grp.l_extendedprice.to_numpy()
            q = grp.l_quantity.to_numpy()
            row = got.loc[rf]
            assert abs(row["sd_price"] - p.std(ddof=1)) < 1e-3
            assert abs(row["var_qty"] - q.var(ddof=1)) < 1e-3
            assert abs(row["corr_pq"] - np.corrcoef(p, q)[0, 1]) < 1e-5


class TestAnomalyZscore:
    def test_zscores(self, spark, tbl):
        got = run(spark, "e_anomaly_zscore")
        e = tbl("events")
        hourly = (
            pd.DataFrame({"et": e.event_type, "h": e.ts.dt.floor("h")})
            .groupby(["et", "h"])
            .size()
        )
        expect = []
        for et, grp in hourly.groupby(level=0):
            cnts = grp.to_numpy(dtype=float)
            mu, sd = cnts.mean(), cnts.std(ddof=1)
            if sd <= 0:
                continue
            for (_, h), c in grp.items():
                z = round((c - mu) / sd, 4)
                if z >= 1.0:
                    expect.append((et, h, int(c), z, z >= 2.0))
        expect.sort()
        assert len(got) == len(expect)
        for (_, row), (et, h, c, z, spike) in zip(got.iterrows(), expect):
            assert row["event_type"] == et
            assert pd.Timestamp(row["h"]) == h
            assert int(row["cnt"]) == c
            assert abs(row["z"] - z) < 2e-4
            assert bool(row["is_spike"]) == spike


class TestParetoAbc:
    def test_pareto_80(self, spark, tbl):
        got = run(spark, "q_pareto_80").iloc[0]
        o = tbl("orders")
        spend = o.groupby("o_custkey")["o_totalprice"].sum().round(2)
        rows = sorted(zip(spend.values, spend.index), key=lambda t: (-t[0], t[1]))
        total = sum(s for s, _ in rows)
        cum = 0.0
        n80 = 0
        for s, _ in rows:
            if cum < total * 0.8:
                n80 += 1
            cum += s
        assert int(got["n_total_customers"]) == len(rows)
        assert int(got["n_customers_to_80pct"]) == n80

    def test_abc(self, spark, tbl):
        got = run(spark, "d_abc_classification").set_index("abc")
        li = tbl("lineitem")
        li = li.assign(c=[cents(v) for v in li.l_extendedprice])
        rev = li.groupby("l_partkey")["c"].sum()
        rows = sorted(zip(rev.values, rev.index), key=lambda t: (-t[0], t[1]))
        tot = sum(c for c, _ in rows)
        cum = 0
        classes = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
        for c, _ in rows:
            cum += c
            cls = "A" if cum * 10 <= tot * 7 else ("B" if cum * 10 <= tot * 9 else "C")
            classes[cls][0] += 1
            classes[cls][1] += c
        for cls, (n, s) in classes.items():
            if n == 0:
                assert cls not in got.index
                continue
            assert int(got.loc[cls, "n_parts"]) == n
            assert int(got.loc[cls, "cents"]) == s
        # independent: A-class revenue share is >= B >= C per part
        # (A parts are the head of the ranking by construction)
        if classes["A"][0] and classes["C"][0]:
            assert (
                classes["A"][1] / classes["A"][0] > classes["C"][1] / classes["C"][0]
            )


class TestRollingCorr:
    def test_trailing_100_frame(self, spark, tbl):
        got = run(spark, "e_rolling_corr").set_index(["event_type", "event_id"])
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame(
            {"et": e.event_type, "us": us, "eid": e.event_id, "v": e.value}
        )
        n_checked = 0
        for et, grp in df.groupby("et"):
            rows = sorted(zip(grp.us, grp.eid, grp.v))
            for i in range(99, len(rows)):
                eid = rows[i][1]
                if eid % 500 != 0:
                    continue
                wnd = rows[i - 99 : i + 1]
                x = np.array([u for u, _, _ in wnd], dtype=float)
                y = np.array([v for _, _, v in wnd], dtype=float)
                c = np.corrcoef(y, x)[0, 1]
                assert abs(got.loc[(et, eid), "corr_100"] - c) < 2e-3
                n_checked += 1
        assert n_checked == len(got)


class TestMergeIntervals:
    def test_sweep_merge(self, spark, tbl):
        got = run(spark, "q_merge_intervals").iloc[0]
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame({"u": e.user_id, "d": e.ts.dt.date, "us": us})
        iv = df.groupby(["u", "d"])["us"].agg(["min", "max"])
        iv["en"] = iv["max"] + 3_600_000_000
        n_intervals = len(iv)
        merged = []
        for u, grp in iv.groupby(level=0):
            spans = sorted(zip(grp["min"], grp.en))
            cur_s, cur_e = spans[0]
            for s, t in spans[1:]:
                if s > cur_e:
                    merged.append(cur_e - cur_s)
                    cur_s, cur_e = s, t
                else:
                    cur_e = max(cur_e, t)
            merged.append(cur_e - cur_s)
        assert int(got["n_intervals"]) == n_intervals
        assert int(got["n_merged"]) == len(merged)
        assert int(got["covered_us"]) == sum(merged)
        assert int(got["longest_merged_us"]) == max(merged)
