"""Independent-derivation sweep, round 6: the STREAMING family
(VERDICT r5 'Next round' item 2).

SURVEY §17 excluded s_* entries from the r5 sweep because their
batch-equivalence oracles cover the math — but watermark/eviction
CHOREOGRAPHY (late-drop batch ordering, outer-join sentinel flushes,
chunked-replay state merge) is exactly where a shared-derivation bug
could hide. Every expected sink state here is re-derived in pure
python (pandas/stdlib loops) from the raw event parquet + the
documented watermark rules, sharing no code with the engine or its
DuckDB oracles. One test per s_* registry entry (19/19).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run


def r2(x: float) -> float:
    """Spark round(x, 2): HALF_UP on the shortest decimal repr."""
    return float(Decimal(repr(x)).quantize(Decimal("0.01"), ROUND_HALF_UP))


def cents(x: float) -> int:
    return int(Decimal(repr(x * 100)).to_integral_value(ROUND_HALF_UP))


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e.ts.notna()].copy()
    e["us"] = e.ts.astype("datetime64[us]").astype("int64")
    return e


class TestTumbling:
    def test_hourly_state(self, spark, ev):
        got = run(spark, "s_tumbling_window")
        exp: dict[tuple, list] = {}
        for _, r in ev.iterrows():
            h = r.ts.floor("h")
            k = (h, r.event_type)
            exp.setdefault(k, [0, 0.0])
            exp[k][0] += 1
            exp[k][1] += r.value
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, sv = exp[(pd.Timestamp(row.h), row.event_type)]
            assert int(row.cnt) == c
            assert abs(float(row.sv) - sv) < 0.005 + 1e-9


class TestSliding:
    def _windows(self, ev):
        exp: dict[tuple, int] = {}
        for _, r in ev.iterrows():
            base = (r.us // 1_000_000 // 900) * 900
            for k in range(4):
                ws = base - k * 900
                key = (ws, r.event_type)
                exp[key] = exp.get(key, 0) + 1
        return exp

    def test_every_event_in_four_windows(self, spark, ev):
        got = run(spark, "s_sliding_window")
        exp = self._windows(ev)
        assert int(got.cnt.sum()) == 4 * len(ev)
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            ws = int(pd.Timestamp(row.ws).timestamp())
            assert int(row.cnt) == exp[(ws, row.event_type)]

    def test_topk_is_true_top2(self, spark, ev):
        got = run(spark, "s_sliding_topk")
        exp = self._windows(ev)
        per_ws: dict[int, list] = {}
        for (ws, et), c in exp.items():
            per_ws.setdefault(ws, []).append((-c, et))
        for ws, lst in per_ws.items():
            lst.sort()
        rows = list(got.itertuples())
        i = 0
        for ws in sorted(per_ws):
            for negc, et in per_ws[ws][:2]:
                row = rows[i]
                assert int(pd.Timestamp(row.ws).timestamp()) == ws
                assert row.event_type == et
                assert int(row.cnt) == -negc
                i += 1
        assert i == len(rows)


class TestSessionWindow:
    def test_thirty_minute_gap_sessions(self, spark, ev):
        got = run(spark, "s_session_window")
        gap = 30 * 60 * 1_000_000
        sessions = []
        for uid, grp in ev.sort_values("us").groupby("user_id"):
            cur = None
            for us in grp.us:
                if cur is None or us - cur[1] > gap:
                    if cur:
                        sessions.append((uid, *cur))
                    cur = [us, us, 1]
                else:
                    cur[1], cur[2] = us, cur[2] + 1
            if cur:
                sessions.append((uid, *cur))
        sessions.sort()
        assert len(got) == len(sessions)
        for row, (uid, st, last, n) in zip(got.itertuples(), sessions):
            assert row.user_id == uid
            got_st = pd.Timestamp(row.st).value // 1000
            got_en = pd.Timestamp(row.en).value // 1000
            assert got_st == st
            assert got_en == last + gap
            assert int(row.n) == n


class TestDedupWatermark:
    def test_duplicates_all_die(self, spark, ev):
        got = run(spark, "s_dedup_watermark")
        # the job unions the stream with itself, then dedups by
        # event_id: survivors == one copy per original event
        exp: dict[str, list] = {}
        for _, r in ev.drop_duplicates("event_id").iterrows():
            exp.setdefault(r.event_type, [0, 0.0])
            exp[r.event_type][0] += 1
            exp[r.event_type][1] += r.value
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, sv = exp[row.event_type]
            assert int(row.cnt) == c
            assert abs(float(row.sv) - sv) < 0.005 + 1e-9


class TestStreamStaticJoin:
    def test_weighted_by_static_dim(self, spark, ev):
        got = run(spark, "s_stream_static_join")
        w = {"click": 1.0, "view": 0.5, "purchase": 5.0, "signup": 3.0, "error": 0.0}
        exp: dict[str, list] = {}
        for _, r in ev.iterrows():
            if r.event_type in w:
                exp.setdefault(r.event_type, [0, 0.0])
                exp[r.event_type][0] += 1
                exp[r.event_type][1] += r.value * w[r.event_type]
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, s = exp[row.event_type]
            assert int(row.cnt) == c
            assert abs(float(row.weighted) - s) < 5e-4 + 1e-9


class TestStreamStreamInner:
    def test_click_purchase_attribution(self, spark, ev):
        got = run(spark, "s_stream_stream_join")
        clicks = ev[ev.event_type == "click"]
        buys = ev[ev.event_type == "purchase"]
        per_user: dict[int, list] = {}
        for _, c in clicks.iterrows():
            for _, p in buys[buys.user_id == c.user_id].iterrows():
                lag = p.us - c.us
                if 0 <= lag <= 30 * 60 * 1_000_000:
                    st = per_user.setdefault(c.user_id, [0, None, 0.0])
                    st[0] += 1
                    st[1] = lag if st[1] is None else min(st[1], lag)
                    st[2] += p.value
        assert len(got) == len(per_user)
        for _, row in got.iterrows():
            n, lag, sv = per_user[row.user_id]
            assert int(row.n_pairs) == n
            assert int(row.min_lag_us) == lag
            assert abs(float(row.attributed) - sv) < 0.005 + 1e-9


class TestStreamStreamOuter:
    def test_unmatched_clicks_evicted_and_emitted(self, spark, ev):
        got = run(spark, "s_stream_stream_outer").iloc[0]
        clicks = ev[ev.event_type == "click"]
        buys = ev[ev.event_type == "purchase"]
        n_rows = n_matched = 0
        for _, c in clicks.iterrows():
            m = 0
            for _, p in buys[buys.user_id == c.user_id].iterrows():
                if 0 <= p.us - c.us <= 30 * 60 * 1_000_000:
                    m += 1
            n_rows += max(m, 1)
            n_matched += m
        assert int(got.n_rows) == n_rows
        assert int(got.n_matched) == n_matched
        assert int(got.n_unmatched) == n_rows - n_matched


class TestForeachBatch:
    def test_partial_fold_equals_batch(self, spark, ev):
        got = run(spark, "s_foreach_batch")
        exp: dict[str, list] = {}
        for _, r in ev.iterrows():
            exp.setdefault(r.event_type, [0, 0.0])
            exp[r.event_type][0] += 1
            exp[r.event_type][1] += r.value
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, sv = exp[row.event_type]
            assert int(row.cnt) == c
            assert abs(float(row.sv) - sv) < 0.005 + 1e-9


class TestExactlyOnceReplay:
    def test_second_run_is_noop(self, spark, ev):
        got = run(spark, "s_exactly_once_replay")
        exp: dict[str, list] = {}
        for _, r in ev.iterrows():
            exp.setdefault(r.event_type, [0, 0])
            exp[r.event_type][0] += 1
            exp[r.event_type][1] += cents(r.value)
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            n, cts = exp[row.event_type]
            assert int(row.n) == n  # 2x here would mean the replay re-committed
            assert int(row.cents) == cts


class TestChunkedReplay:
    def test_four_batch_state_merge(self, spark, ev):
        got = run(spark, "s_chunked_replay")
        exp: dict[tuple, list] = {}
        for _, r in ev.iterrows():
            k = (r.ts.floor("h"), r.event_type)
            exp.setdefault(k, [0, 0])
            exp[k][0] += 1
            exp[k][1] += cents(r.value)
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, cts = exp[(pd.Timestamp(row.h), row.event_type)]
            assert int(row.cnt) == c
            assert int(row.cents) == cts


def _ntile4(ev: pd.DataFrame) -> list[int]:
    """Quartile id per row of ev sorted by (ts, event_id) — SQL ntile:
    the first n%4 quartiles get one extra row."""
    n = len(ev)
    base, extra = divmod(n, 4)
    sizes = [base + (1 if i < extra else 0) for i in range(4)]
    qt = []
    for i, sz in enumerate(sizes, start=1):
        qt.extend([i] * sz)
    return qt


class TestLateDataDrop:
    def test_watermark_drops_exactly_the_modelled_rows(self, spark, ev):
        got = run(spark, "s_late_data_drop")
        s = ev.sort_values(["us", "event_id"]).reset_index(drop=True)
        s["qt"] = _ntile4(s)
        # replay order q4,q3,q2,q1; wm binds with one batch of lag:
        # q4/q3 always accepted; q2 vs max(q4)-1h; q1 vs max(q3|q4)-1h
        hour_us = 3_600 * 1_000_000
        mx4 = s[s.qt == 4].us.max() if (s.qt == 4).any() else None
        mx34 = s[s.qt >= 3].us.max() if (s.qt >= 3).any() else None
        keep = []
        for _, r in s.iterrows():
            if r.qt >= 3:
                keep.append(True)
            elif r.qt == 2:
                keep.append(mx4 is None or r.us >= mx4 - hour_us)
            else:
                keep.append(mx34 is None or r.us >= mx34 - hour_us)
        kept = s[pd.Series(keep, index=s.index)]
        exp: dict[tuple, list] = {}
        for _, r in kept.iterrows():
            k = (r.ts.floor("h"), r.event_type)
            exp.setdefault(k, [0, 0])
            exp[k][0] += 1
            exp[k][1] += cents(r.value)
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, cts = exp[(pd.Timestamp(row.h), row.event_type)]
            assert int(row.cnt) == c
            assert int(row.cents) == cts
        # and the drop is REAL on this fixture: quartiles are
        # time-separated, so q1 and q2 must have been dropped entirely
        assert len(kept) == (s.qt >= 3).sum()


class TestProgressMetrics:
    def test_progress_accounts_for_every_row(self, spark, ev):
        got = run(spark, "s_progress_metrics").iloc[0]
        assert int(got.n_input_rows) == len(ev)
        assert int(got.n_types) == ev.event_type.dropna().nunique()
        assert bool(got.metrics_account_for_all_rows) is True


class TestStatefulUserStats:
    def test_final_state_per_user(self, spark, ev):
        got = run(spark, "s_stateful_user_stats")
        exp = {}
        for uid, g in ev.groupby("user_id"):
            exp[uid] = (len(g), g.value.sum(), g.value.max())
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            n, tot, mx = exp[row.user_id]
            assert int(row.n) == n
            assert abs(float(row.total) - tot) < 0.005 + 1e-9
            assert float(row.mx) == mx


class TestStreamObserve:
    def test_observed_counters_match(self, spark, ev):
        got = run(spark, "s_stream_observe").iloc[0]
        assert int(got.observed_rows) == len(ev)
        assert int(got.observed_cents) == sum(cents(v) for v in ev.value)
        assert int(got.observed_nonpos) == int((ev.value <= 0).sum())


class TestParquetSink:
    def test_committed_files_equal_batch(self, spark, ev):
        got = run(spark, "s_stream_parquet_sink")
        pos = ev[ev.value > 0]
        exp: dict[str, list] = {}
        for _, r in pos.iterrows():
            exp.setdefault(r.event_type, [0, 0.0])
            exp[r.event_type][0] += 1
            exp[r.event_type][1] += r.value
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, sv = exp[row.event_type]
            assert int(row.cnt) == c
            assert abs(float(row.sv) - sv) < 0.005 + 1e-9


class TestTableSink:
    def test_catalog_table_equals_batch(self, spark, ev):
        got = run(spark, "s_stream_table_sink")
        pos = ev[ev.value > 0]
        exp: dict[str, list] = {}
        for _, r in pos.iterrows():
            exp.setdefault(r.event_type, [0, 0])
            exp[r.event_type][0] += 1
            exp[r.event_type][1] += cents(r.value)
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, cts = exp[row.event_type]
            assert int(row.cnt) == c
            assert int(row.cents) == cts


class TestPartitionedSink:
    def test_daily_layout_totals(self, spark, ev):
        got = run(spark, "s_stream_sink_partitioned")
        buys = ev[ev.event_type == "purchase"]
        exp: dict = {}
        for _, r in buys.iterrows():
            d = r.ts.date()
            exp.setdefault(d, [0, 0])
            exp[d][0] += 1
            exp[d][1] += cents(r.value)
        assert len(got) == len(exp)
        for _, row in got.iterrows():
            c, cts = exp[pd.Timestamp(row.d).date()]
            assert int(row.cnt) == c
            assert int(row.cents) == cts


class TestAppendMode:
    def test_emitted_windows_subset_of_batch(self, spark, ev):
        got = run(spark, "s_append_mode").iloc[0]
        n_groups = len({(r.ts.floor("h"), r.event_type) for _, r in ev.iterrows()})
        assert int(got.n_batch_groups) == n_groups
        assert int(got.n_unmatched) == 0
        assert bool(got.ok) is True
