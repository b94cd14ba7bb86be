"""Independent-derivation sweep, part 28: resample/gap-fill, time-range
frames, basket pairs, session-gap sensitivity, value streaks.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


class TestResampleGapfill:
    def test_spine_and_locf(self, spark, events):
        got = run(spark, "e_resample_gapfill").set_index(["user_id", "h"])
        e = events[
            (events.user_id % 15 == 0) & (events.ts < pd.Timestamp("2024-01-08"))
        ]
        hourly = (
            e.assign(h=e.ts.dt.floor("h"))
            .groupby(["user_id", "h"])
            .agg(cnt=("value", "size"), sv=("value", lambda s: round(s.sum(), 2)))
        )
        total_rows = 0
        for uid in hourly.index.get_level_values(0).unique():
            sub = hourly.loc[uid]
            spine = pd.date_range(sub.index.min(), sub.index.max(), freq="h")
            locf = None
            for h in spine:
                total_rows += 1
                row = got.loc[(uid, h)]
                if h in sub.index:
                    assert int(row["cnt"]) == int(sub.loc[h, "cnt"])
                    locf = sub.loc[h, "sv"]
                else:
                    assert int(row["cnt"]) == 0
                assert abs(row["sv_locf"] - locf) < 1e-9
        assert len(got) == total_rows


class TestTimeRangeFrames:
    def test_trailing_3h(self, spark, events):
        got = run(spark, "e_time_range_frames").set_index("event_id")
        p = events[events.event_type == "purchase"]
        us = p.ts.astype("int64").to_numpy()
        eid = p.event_id.to_numpy()
        cc = np.array([cents(v) for v in p.value])
        order = np.argsort(us, kind="stable")
        us, eid, cc = us[order], eid[order], cc[order]
        W3 = 3 * 3600 * 1_000_000
        for i in range(len(us)):
            lo = us[i] - W3
            mask = (us >= lo) & (us <= us[i])
            row = got.loc[eid[i]]
            assert int(row["n_3h"]) == int(mask.sum())
            assert int(row["cents_3h"]) == int(cc[mask].sum())


class TestBasketPairs:
    def test_top20(self, spark):
        got = run(spark, "q_basket_pairs")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        pairs: Counter = Counter()
        for _, grp in li.groupby("l_orderkey"):
            parts = sorted(grp.l_partkey)  # NOT distinct: join is row-level
            for i in range(len(parts)):
                for j in range(len(parts)):
                    if parts[i] < parts[j]:
                        pairs[(parts[i], parts[j])] += 1
        want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:20]
        assert len(got) == min(20, len(want))
        for (_, g), ((a, b), n) in zip(got.iterrows(), want):
            assert (g["part_a"], g["part_b"]) == (a, b)
            assert int(g["n_baskets"]) == n


class TestGapSensitivity:
    def test_three_thresholds_one_pass(self, spark, events):
        got = run(spark, "q_session_gap_sensitivity").iloc[0]
        us = events.ts.astype("int64")
        df = pd.DataFrame({"u": events.user_id, "us": us, "eid": events.event_id})
        counts = {15: 0, 30: 0, 60: 0}
        for u, grp in df.groupby("u"):
            t = [x for x, _ in sorted(zip(grp.us, grp.eid))]
            for thr in counts:
                n = 1 + sum(
                    1 for a, b in zip(t, t[1:]) if b - a > thr * 60 * 1_000_000
                )
                counts[thr] += n
        assert int(got["sessions_15m"]) == counts[15]
        assert int(got["sessions_30m"]) == counts[30]
        assert int(got["sessions_60m"]) == counts[60]
        assert int(got["n_events"]) == len(df)
        # sensitivity curve is monotone: shorter gap => more sessions
        assert counts[15] >= counts[30] >= counts[60]


class TestValueStreaks:
    def test_runs(self, spark, events):
        got = run(spark, "e_value_streaks").set_index("event_type")
        us = events.ts.astype("int64")
        df = pd.DataFrame(
            {"u": events.user_id, "et": events.event_type, "us": us, "eid": events.event_id}
        )
        runs: dict[str, list[int]] = {}
        for u, grp in df.groupby("u"):
            seq = [et for _, _, et in sorted(zip(grp.us, grp.eid, grp.et))]
            cur_et, cur_len = None, 0
            for et in seq:
                if et == cur_et:
                    cur_len += 1
                else:
                    if cur_et is not None:
                        runs.setdefault(cur_et, []).append(cur_len)
                    cur_et, cur_len = et, 1
            runs.setdefault(cur_et, []).append(cur_len)
        for et, lens in runs.items():
            row = got.loc[et]
            assert int(row["n_runs"]) == len(lens)
            assert int(row["max_run"]) == max(lens)
            assert abs(row["avg_run"] - sum(lens) / len(lens)) < 1e-3
