"""Independent-derivation sweep, part 15: sessionization and funnels
(30-min sessionize, ordered funnel, session percentiles, click→purchase
latency, day streaks, new-vs-returning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run, trunc_div

GAP_US = 30 * 60 * 1_000_000


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


def sessions(events):
    """(user_id, sid) -> list of us, by the 30-min-gap rule."""
    out = {}
    for uid, grp in events.groupby("user_id"):
        ts = sorted(grp.ts.astype("int64"))
        sid = 0
        cur = []
        for prev, t in zip([None] + ts[:-1], ts):
            if prev is None or t - prev > GAP_US:
                sid += 1
                cur = []
                out[(uid, sid)] = cur
            cur.append(t)
    return out


class TestSessionize:
    def test_gap_islands_exact(self, spark, events):
        got = run(spark, "q_sessionize").set_index(["user_id", "sid"])
        sess = sessions(events)
        assert len(got) == len(sess)
        for (uid, sid), ts in sess.items():
            row = got.loc[(uid, sid)]
            assert int(row["n"]) == len(ts)
            assert pd.Timestamp(row["st"]).value // 1000 == ts[0]
            assert pd.Timestamp(row["en"]).value // 1000 == ts[-1]

    def test_percentiles(self, spark, events):
        got = run(spark, "e_session_duration_percentiles").iloc[0]
        sess = sessions(events)
        durs = sorted(ts[-1] - ts[0] for ts in sess.values())
        n_ev = [len(ts) for ts in sess.values()]
        assert int(got["n_sessions"]) == len(durs)
        for p, col in ((0.5, "p50_us"), (0.9, "p90_us"), (0.99, "p99_us")):
            # interpolated (type-7 / quantile_cont) percentile
            want = float(np.percentile(durs, p * 100, method="linear"))
            assert abs(int(got[col]) - want) <= 1
        assert abs(got["avg_events"] - np.mean(n_ev)) < 1e-3


class TestFunnel:
    def test_ordered_stages(self, spark, events):
        got = run(spark, "q_funnel").iloc[0]
        s = {}
        for uid, grp in events[events.event_type == "signup"].groupby("user_id"):
            s[uid] = grp.ts.min()
        c = {}
        for uid, grp in events[events.event_type == "click"].groupby("user_id"):
            if uid in s:
                after = grp.ts[grp.ts > s[uid]]
                if len(after):
                    c[uid] = after.min()
        p = {}
        for uid, grp in events[events.event_type == "purchase"].groupby("user_id"):
            if uid in c:
                after = grp.ts[grp.ts > c[uid]]
                if len(after):
                    p[uid] = after.min()
        assert int(got["n_signup"]) == len(s)
        assert int(got["n_click_after"]) == len(c)
        assert int(got["n_purchase_after"]) == len(p)
        assert len(s) >= len(c) >= len(p)  # funnel monotonicity


class TestClickLatency:
    def test_latency_quantiles(self, spark, events):
        got = run(spark, "q_click_to_purchase_latency").iloc[0]
        us = events.ts.astype("int64")
        df = pd.DataFrame(
            {"u": events.user_id, "et": events.event_type, "us": us, "eid": events.event_id}
        )
        purch = df[df.et == "purchase"].groupby("u")["us"].apply(sorted)
        lats = []
        for _, r in df[df.et == "click"].iterrows():
            if r.u not in purch.index:
                continue
            cand = [p - r.us for p in purch[r.u] if r.us < p <= r.us + 86_400_000_000]
            if cand:
                lats.append((min(cand), r.u, r.eid))
        lats.sort()
        n = len(lats)
        assert int(got["n_responses"]) == n
        assert int(got["p50_s"]) == lats[(n + 1) // 2 - 1][0] // 1_000_000
        assert int(got["p90_s"]) == lats[(9 * n + 9) // 10 - 1][0] // 1_000_000
        assert int(got["min_s"]) == lats[0][0] // 1_000_000


class TestGapIslands:
    def test_streaks(self, spark, events):
        got = run(spark, "e_gap_islands").set_index("user_id")
        days = pd.DataFrame(
            {
                "u": events.user_id,
                "d": (events.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days,
            }
        ).drop_duplicates()
        for uid, grp in days.groupby("u"):
            ds = sorted(grp.d)
            streaks = []
            cur = 1
            for a, b in zip(ds, ds[1:]):
                if b == a + 1:
                    cur += 1
                else:
                    streaks.append(cur)
                    cur = 1
            streaks.append(cur)
            row = got.loc[uid]
            assert int(row["n_streaks"]) == len(streaks)
            assert int(row["max_streak"]) == max(streaks)
            assert int(row["active_days"]) == len(ds)


class TestNewVsReturning:
    def test_daily_split(self, spark, events):
        got = run(spark, "q_new_vs_returning").set_index("d")
        df = pd.DataFrame({"u": events.user_id, "d": events.ts.dt.date})
        first = df.groupby("u")["d"].min()
        daily = df.drop_duplicates()
        daily = daily.assign(is_new=[first[u] == d for u, d in zip(daily.u, daily.d)])
        expect = daily.groupby("d")["is_new"].agg(["sum", "count"])
        assert len(got) == len(expect)
        total_new = 0
        for d, r in expect.iterrows():
            row = got.loc[d]
            assert int(row["new_users"]) == int(r["sum"])
            assert int(row["returning_users"]) == int(r["count"] - r["sum"])
            total_new += int(r["sum"])
        # conservation: every user is new exactly once
        assert total_new == events.user_id.nunique()
