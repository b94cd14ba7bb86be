"""Independent-derivation sweep, part 21: RFM, LOCF/interpolation,
heavy hitters, hash collision census, sequential-pattern support.
"""

from __future__ import annotations

from collections import Counter
import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestRfm:
    def test_segments(self, spark, tbl):
        got = run(spark, "q_rfm_segments").set_index("segment")
        o = tbl("orders")
        mxd = o.o_orderdate.max()
        segs: dict[str, list[int]] = {}
        for ck, grp in o.groupby("o_custkey"):
            rec = (mxd.normalize() - grp.o_orderdate.max().normalize()).days
            freq = len(grp)
            c = sum(cents(v) for v in grp.o_totalprice)
            r = 3 if rec <= 365 else (2 if rec <= 1095 else 1)
            f = 3 if freq >= 3 else (2 if freq >= 2 else 1)
            m = 3 if c >= 40_000_000 else (2 if c >= 10_000_000 else 1)
            segs.setdefault(f"{r}-{f}-{m}", []).append(c)
        assert set(got.index) == set(segs)
        for seg, vals in segs.items():
            row = got.loc[seg]
            assert int(row["n_customers"]) == len(vals)
            assert abs(row["segment_revenue"] - sum(vals) / 100.0) < 1e-6


class TestLocfInterpolate:
    def test_fills(self, spark, tbl):
        got = run(spark, "e_locf_interpolate").set_index("user_id")
        e = tbl("events")
        p = e[(e.event_type == "purchase") & (e.user_id <= 40)]
        us = p.ts.astype("int64")
        df = pd.DataFrame({"u": p.user_id, "h": us // 3_600_000_000, "v": p.value})
        obs = df.groupby(["u", "h"])["v"].mean().round(4)
        for uid in obs.index.get_level_values(0).unique():
            series = obs[uid]
            h0, h1 = int(series.index.min()), int(series.index.max())
            locf_u = 0
            interp_u = 0
            prev_h = prev_v = None
            hs = list(range(h0, h1 + 1))
            observed = dict(series)
            # next observed per position
            next_at = {}
            nxt = None
            for h in reversed(hs):
                if h in observed:
                    nxt = h
                next_at[h] = nxt
            for h in hs:
                if h in observed:
                    prev_h, prev_v = h, observed[h]
                    val = observed[h]
                else:
                    nh = next_at[h]
                    if prev_v is None:
                        val = observed[nh]
                    elif nh is None:
                        val = prev_v
                    else:
                        val = prev_v + (observed[nh] - prev_v) * (h - prev_h) / (nh - prev_h)
                locf_u += round(prev_v * 10000) if prev_v is not None else 0
                interp_u += round(val * 10000)
            row = got.loc[uid]
            assert int(row["n_hours"]) == len(hs)
            assert int(row["n_obs"]) == len(observed)
            assert abs(row["locf_sum"] - ((locf_u + 50) // 100) / 100.0) < 1e-6
            assert abs(row["interp_sum"] - ((interp_u + 50) // 100) / 100.0) < 1e-6


class TestHeavyHitters:
    def test_exact_top5(self, spark, tbl):
        got = run(spark, "d_count_min_topk")
        docs = tbl("documents")
        c: Counter = Counter()
        for txt in docs.text:
            c.update(t for t in re.split(r"\s+", txt) if t)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want_counts = sorted(
            [(w, n) for w, n in want], key=lambda kv: (-kv[1], kv[0])
        )
        assert len(got) == 5
        for (_, row), (w, n) in zip(got.iterrows(), want_counts):
            assert row["w"] == w
            assert int(row["cnt"]) == n
            assert bool(row["sketch_ok"])


class TestHashCensus:
    def test_birthday_counts(self, spark, tbl):
        got = run(spark, "d_hash_collision_census").iloc[0]
        o = tbl("orders")
        keys = sorted(set(o.o_orderkey))
        c = Counter(
            hashlib.md5(str(k).encode()).hexdigest()[:4] for k in keys
        )
        n_collide = sum(k for k in c.values() if k > 1)
        assert int(got["n_keys"]) == len(keys)
        assert int(got["n_distinct_prefixes"]) == len(c)
        assert int(got["n_colliding_keys"]) == n_collide
        assert int(got["max_bucket"]) == max(c.values())
        # birthday-bound sanity: collisions near n^2/2m for 65536 slots
        import math

        expect = len(keys) ** 2 / (2 * 65536)
        assert n_collide < 10 * max(expect, 1)


class TestSeqSupport:
    def test_eventually_follows(self, spark, tbl):
        got = run(spark, "q_seq_pattern_support").set_index(["type_a", "type_b"])
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame({"u": e.user_id, "et": e.event_type, "us": us})
        per = df.groupby(["u", "et"])["us"].agg(["min", "max"])
        n_users = df.u.nunique()
        support: Counter = Counter()
        for uid in df.u.unique():
            sub = per.loc[uid]
            for ta in sub.index:
                for tb in sub.index:
                    if ta != tb and sub.loc[ta, "min"] < sub.loc[tb, "max"]:
                        support[(ta, tb)] += 1
        assert len(got) == len(support)
        for (ta, tb), n in support.items():
            row = got.loc[(ta, tb)]
            assert int(row["support_users"]) == n
            assert int(row["support_ppm"]) == n * 1_000_000 // n_users
