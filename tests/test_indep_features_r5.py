"""Independent-derivation sweep, part 34: feature engineering and
integrity (LOO target encoding, tie-coherent quantile bins, hashed
cross collisions, trade reciprocity, tamper-evident hash chain).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestTargetEncode:
    def test_loo_min_max(self, spark, tbl):
        got = run(spark, "l_target_encode_loo").set_index("cat")
        o = tbl("orders")
        y = pd.Series([cents(v) for v in o.o_totalprice])
        cat = o.o_orderpriority
        g = y.sum() / len(y)
        for c, idx in cat.groupby(cat).groups.items():
            ys = y[idx]
            n_c, s_c = len(ys), int(ys.sum())
            te = [(s_c - yi + 10 * g) / (n_c - 1 + 10) for yi in ys]
            row = got.loc[c]
            assert int(row["n"]) == n_c
            assert abs(row["te_min"] - min(te)) < 1e-6
            assert abs(row["te_max"] - max(te)) < 1e-6
            # LOO leakage check: the row with the LARGEST target gets
            # the SMALLEST encoding (its own label is excluded)
            assert te[ys.values.argmax()] == min(te)


class TestQuantileBins:
    def test_tie_coherent_equi_depth(self, spark, tbl):
        got = run(spark, "l_quantile_binning").set_index("bin")
        o = tbl("orders")
        cc = sorted(cents(v) for v in o.o_totalprice)
        grain = Counter(cc)
        tot = len(cc)
        cum = 0
        bins: dict[int, list[int]] = {}
        for v in sorted(grain):
            cum += grain[v]
            b = (cum * 4 + tot - 1) // tot
            e = bins.setdefault(b, [0, v, v])
            e[0] += grain[v]
            e[1] = min(e[1], v)
            e[2] = max(e[2], v)
        assert set(got.index) == set(bins)
        for b, (n, mn, mx) in bins.items():
            row = got.loc[b]
            assert int(row["n_rows"]) == n
            assert int(row["min_cents"]) == mn
            assert int(row["max_cents"]) == mx
        # bins are value-disjoint and ordered (tie coherence)
        ordered = sorted(bins)
        for a, b in zip(ordered, ordered[1:]):
            assert bins[a][2] < bins[b][1]


class TestHashedCross:
    def test_bucket_loads_and_collisions(self, spark, tbl):
        got = run(spark, "l_hashed_cross").set_index("bucket")
        c, n = tbl("customer"), tbl("nation")
        names = n.set_index("n_nationkey")["n_name"]
        crosses = [
            f"{seg}#{names[nk]}" for seg, nk in zip(c.c_mktsegment, c.c_nationkey)
        ]
        per_bucket_rows: Counter = Counter()
        per_bucket_vals: dict[int, set] = {}
        for cv in crosses:
            h = hashlib.md5(cv.encode()).hexdigest()
            b = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            per_bucket_rows[b] += 1
            per_bucket_vals.setdefault(b, set()).add(cv)
        assert set(got.index) == set(per_bucket_rows)
        for b in per_bucket_rows:
            row = got.loc[b]
            assert int(row["n_rows"]) == per_bucket_rows[b]
            assert int(row["n_crosses"]) == len(per_bucket_vals[b])
        # conservation: bucket rows sum to customer count
        assert got["n_rows"].sum() == len(c)


class TestReciprocity:
    def test_mutual_edges(self, spark, tbl):
        got = run(spark, "q_network_reciprocity").iloc[0]
        li, o, c, s = tbl("lineitem"), tbl("orders"), tbl("customer"), tbl("supplier")
        df = li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        df = df.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        df = df.merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        edges = {
            (a, b)
            for a, b in zip(df.c_nationkey, df.s_nationkey)
            if a != b
        }
        recip = sum(1 for a, b in edges if (b, a) in edges)
        assert int(got["n_edges"]) == len(edges)
        assert int(got["n_reciprocated"]) == recip
        assert int(got["reciprocity_ppm"]) == recip * 1_000_000 // len(edges)


class TestHashChain:
    def test_tamper_evident_chain(self, spark, tbl):
        got = run(spark, "etl_hash_chain_ledger").set_index("day_id")
        e = tbl("events")
        us = e.ts.astype("int64")
        df = pd.DataFrame(
            {
                "d": us // 86_400_000_000,
                "us": us,
                "eid": e.event_id,
                "c": [cents(v) for v in e.value],
            }
        )
        for d, grp in df.groupby("d"):
            rows = sorted(zip(grp.us, grp.eid, grp.c))
            acc = "GENESIS"
            for u, eid, cc in rows:
                rh = hashlib.md5(f"{eid}|{u}|{cc}".encode()).hexdigest()
                acc = hashlib.md5((acc + rh).encode()).hexdigest()
            row = got.loc[d]
            assert int(row["n_rows"]) == len(rows)
            assert row["chain_hash"] == acc
            # tamper evidence: flipping ONE row's cents changes the digest
            acc2 = "GENESIS"
            for i, (u, eid, cc) in enumerate(rows):
                cc2 = cc + 1 if i == 0 else cc
                rh = hashlib.md5(f"{eid}|{u}|{cc2}".encode()).hexdigest()
                acc2 = hashlib.md5((acc2 + rh).encode()).hexdigest()
            assert acc2 != acc
