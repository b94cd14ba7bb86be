"""Independent-derivation sweep, part 12: sigma bands, Simpson
reversal, DTW invariants, JL projection, BM25. Completes the ~60-entry
algorithmic sweep (VERDICT r4 next-round #1).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div
from tests.test_indep_ml_r5 import q_micro


@pytest.fixture(scope="module")
def tbl():
    def load(name):
        return pd.read_parquet(f"{SF}/{name}.parquet")

    return load


class TestSigmaBands:
    def test_empirical_rule(self, spark, tbl):
        got = run(spark, "d_sigma_bands").set_index("event_type")
        e = tbl("events")
        for et in ("purchase", "click"):
            x = np.array([cents(v) for v in e[e.event_type == et].value], dtype=float)
            n = len(x)
            mu, sd = x.mean(), x.std()  # population sigma — float twin
            row = got.loc[et]
            assert int(row["n"]) == n
            for k, col in ((1, "within_1s_ppm"), (2, "within_2s_ppm"), (3, "within_3s_ppm")):
                inside = int((np.abs(x - mu) <= k * sd).sum())
                assert int(row[col]) == inside * 1_000_000 // n
            # bands are strictly informative post-fix (the pre-fix bug
            # reported 1e6 ppm for ALL three bands): 1s < 1e6 and the
            # bands are monotone
            assert int(row["within_1s_ppm"]) < 1_000_000
            assert (
                int(row["within_1s_ppm"])
                <= int(row["within_2s_ppm"])
                <= int(row["within_3s_ppm"])
                <= 1_000_000
            )


class TestSimpson:
    def test_reversal_accounting(self, spark, tbl):
        got = run(spark, "d_simpson_paradox").iloc[0]
        o, c = tbl("orders"), tbl("customer")
        df = o.merge(
            c[c.c_mktsegment.isin(["BUILDING", "MACHINERY"])][
                ["c_custkey", "c_mktsegment"]
            ],
            left_on="o_custkey",
            right_on="c_custkey",
        )
        df["cc"] = [cents(v) for v in df.o_totalprice]
        df["y"] = pd.to_datetime(df.o_orderdate).dt.year
        years = []
        for y, grp in df.groupby("y"):
            a = grp[grp.c_mktsegment == "BUILDING"]
            b = grp[grp.c_mktsegment == "MACHINERY"]
            years.append((len(a), int(a.cc.sum()), len(b), int(b.cc.sum())))
        sa = sum(r[1] for r in years)
        sb = sum(r[3] for r in years)
        na = sum(r[0] for r in years)
        nb = sum(r[2] for r in years)
        overall = int(np.sign(sa * nb - sb * na))
        agree = sum(
            1 for ca, cea, cb, ceb in [(r[0], r[1], r[2], r[3]) for r in years]
            if int(np.sign(cea * cb - ceb * ca)) == overall
        )
        reversed_ = sum(
            1 for ca, cea, cb, ceb in [(r[0], r[1], r[2], r[3]) for r in years]
            if int(np.sign(cea * cb - ceb * ca)) == -overall
        )
        assert int(got["overall_sign"]) == overall
        assert int(got["n_years"]) == len(years)
        assert int(got["n_years_agree"]) == agree
        assert int(got["n_years_reversed"]) == reversed_
        # the sign encodes the float avg-vs-avg comparison exactly
        assert overall == int(np.sign(sa / na - sb / nb))


class TestDtwInvariants:
    def test_python_dtw_confirms_invariants(self, spark, tbl):
        got = run(spark, "e_dtw_kernel").iloc[0]
        e = tbl("events")
        daily = (
            pd.DataFrame({"et": e.event_type, "d": e.ts.dt.date})
            .groupby(["et", "d"])
            .size()
        )
        types = sorted(daily.index.get_level_values(0).unique())

        def dtw(a, b):
            n, m = len(a), len(b)
            INF = 1 << 60
            prev = [INF] * (m + 1)
            prev[0] = 0
            for i in range(1, n + 1):
                cur = [INF] * (m + 1)
                for j in range(1, m + 1):
                    c = abs(a[i - 1] - b[j - 1])
                    cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
                prev = cur
            return prev[m]

        n_pairs = 0
        for i, ta in enumerate(types):
            for tb in types[i:]:
                n_pairs += 1
                # common-date curves, the entry's join semantics
                da = daily[ta]
                db = daily[tb]
                common = sorted(set(da.index) & set(db.index))
                a = [int(da[d]) for d in common]
                b = [int(db[d]) for d in common]
                v = dtw(a, b)
                l1 = sum(abs(x - y) for x, y in zip(a, b))
                assert v <= l1
                if ta == tb:
                    assert v == 0
                assert v == dtw(b, a)  # symmetry, independently
        assert int(got["n_pairs"]) == n_pairs
        assert bool(got["dtw_le_l1"]) and bool(got["self_zero"]) and bool(got["symmetric_ok"])


class TestRandomProjection:
    def test_jl_energy(self, spark, tbl):
        got = run(spark, "j_random_projection").set_index("label")
        emb = tbl("embeddings")
        K = 8
        sgn = {}
        for i in range(1, 65):
            for j in range(1, K + 1):
                h = hashlib.md5(f"{i}_{j}".encode()).hexdigest()
                sgn[(i, j)] = 1 if ord(h[0]) % 2 == 0 else -1
        agg: dict[str, list[int]] = {}
        for v, lab in zip(emb.embedding, emb.label):
            q = [q_micro(x) for x in v]
            # per-vector n2 rescaled to micro-units (//1e6), matching the
            # round-7 128-bit widening: raw q*q overflows int64 on
            # unnormalized embeddings, so the entry emits n2 div 1e6
            orig_n2 = trunc_div(sum(c * c for c in q), 1_000_000)
            proj_n2_raw = 0
            for j in range(1, K + 1):
                p = sum(sgn[(i, j)] * q[i - 1] for i in range(1, 65))
                proj_n2_raw += p * p
            proj_n2 = trunc_div(proj_n2_raw, 1_000_000)
            a = agg.setdefault(lab, [0, 0, 0])
            a[0] += 1
            a[1] += orig_n2
            a[2] += proj_n2
        for lab, (n, so, sp) in agg.items():
            row = got.loc[lab]
            assert int(row["n_vecs"]) == n
            assert int(row["sum_orig_n2"]) == so
            assert int(row["sum_proj_n2"]) == sp
            ppm = trunc_div(sp, max(trunc_div(K * so, 1_000_000), 1))
            assert int(row["energy_ratio_ppm"]) == ppm
            # JL contract: energy ratio near 1 (sign-matrix sketch)
            assert 0.5 < sp / (K * so) < 1.5
            # divisor magnitude keeps the ppm trick honest here
            # (micro-rescaled: 1e9 raw -> 1e3 after //1e6)
            assert K * so > 1e3


class TestBm25:
    def test_textbook_formula(self, spark, tbl):
        got = run(spark, "j_bm25")
        docs = tbl("documents")
        toks = {d: [t for t in txt.split(" ") if t] for d, txt in zip(docs.doc_id, docs.text)}
        dl = {d: len(ts) for d, ts in toks.items()}
        avgdl = sum(dl.values()) / len(dl)
        N = len(dl)
        terms = ("spark", "join", "shuffle")
        tf = {
            (d, w): ts.count(w)
            for d, ts in toks.items()
            for w in terms
            if w in ts
        }
        df = {w: sum(1 for (d2, w2) in tf if w2 == w) for w in terms}
        scores = {}
        for (d, w), f in tf.items():
            idf = math.log(1 + (N - df[w] + 0.5) / (df[w] + 0.5))
            s = idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
            scores[d] = scores.get(d, 0.0) + s
        want = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:25]
        assert len(got) == min(25, len(want))
        for (d, s), (_, row) in zip(want, got.iterrows()):
            assert row["doc_id"] == d
            assert abs(row["bm25"] - s) < 1e-5
