"""Independent-derivation sweep, part 32 (final): RAG context packing,
DPO preference pairs, span-corruption accounting, recursive month
spine, column profiling.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run, trunc_div


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


class TestRagPack:
    def test_density_knapsack(self, spark, docs):
        got = run(spark, "q_rag_context_pack").iloc[0]
        d = docs[docs.text.str.len() > 0]
        rows = []
        for did, txt in zip(d.doc_id, d.text):
            toks = len(txt.split(" "))
            if toks == 0:
                continue
            h = hashlib.md5(str(did).encode()).hexdigest()
            rel = ord(h[0]) * 256 + ord(h[1])
            rows.append((trunc_div(rel * 1000, toks), did, toks, rel))
        rows.sort(key=lambda r: (-r[0], r[1]))
        cum = n = used = total_rel = 0
        worst = None
        for dens, did, toks, rel in rows:
            cum += toks
            if cum > 1000:
                break
            n += 1
            used += toks
            total_rel += rel
            worst = dens if worst is None else min(worst, dens)
        assert int(got["n_docs_packed"]) == n
        assert int(got["tokens_used"]) == used <= 1000
        assert int(got["total_relevance"]) == total_rel
        assert int(got["worst_density_milli"]) == worst


class TestPreferencePairs:
    def test_top_bottom_pairing(self, spark, docs):
        got = run(spark, "t_preference_pairs").set_index("lang")
        scored = {}
        for did, lang, txt in zip(docs.doc_id, docs.lang, docs.text):
            wordsish = [w for w in re.split(r"[^a-z]+", txt.lower()) if w]
            score = len(wordsish) * 100 // max(len(txt), 1)
            scored.setdefault(lang, []).append((score, did))
        for lang, items in scored.items():
            top = sorted(items, key=lambda t: (-t[0], t[1]))
            bot = sorted(items, key=lambda t: (t[0], t[1]))
            n = len(items)
            k = n // 4
            margins = [top[i][0] - bot[i][0] for i in range(k)]
            row = got.loc[lang]
            assert int(row["n_pairs"]) == k
            assert int(row["sum_margin"]) == sum(margins)
            assert int(row["min_margin"]) == min(margins)
            assert bool(row["ordered_ok"]) == all(m >= 0 for m in margins)
            assert all(m >= 0 for m in margins)  # top quartile beats bottom


class TestSpanCorruption:
    def test_mask_and_sentinel_accounting(self, spark, docs):
        got = run(spark, "t_span_corruption").set_index("lang")
        d = docs[docs.text.str.len() > 0]
        agg: dict[str, list[int]] = {}
        for did, lang, txt in zip(d.doc_id, d.lang, d.text):
            n = len(txt.split(" "))
            masked = [i for i in range(1, n + 1) if (i * 7919 + did) % 5 == 0]
            sentinels = [
                i for i in masked if ((i - 1) * 7919 + did) % 5 != 0
            ]
            e = agg.setdefault(lang, [0, 0, 0, 0])
            e[0] += 1
            e[1] += n
            e[2] += len(masked)
            e[3] += len(sentinels)
        for lang, (nd, nt, nm, ns) in agg.items():
            row = got.loc[lang]
            assert int(row["n_docs"]) == nd
            assert int(row["sum_tokens"]) == nt
            assert int(row["sum_masked"]) == nm
            assert int(row["sum_sentinels"]) == ns
            assert int(row["corrupt_ppm"]) == nm * 1_000_000 // nt
            # ~20% corruption by the mod-5 rule; sentinels <= masked
            assert 0.15 < nm / nt < 0.25 and ns <= nm


class TestRecursiveSpine:
    def test_month_spine_zero_filled(self, spark):
        got = run(spark, "q_recursive_spine").set_index("ym")
        o = pd.read_parquet(f"{SF}/orders.parquet")
        od = pd.to_datetime(o.o_orderdate)
        df = pd.DataFrame(
            {"v": od.dt.year * 12 + od.dt.month - 1, "c": [cents(v) for v in o.o_totalprice]}
        )
        rev = df.groupby("v")["c"].sum()
        v0, v1 = int(df.v.min()), int(df.v.max())
        assert len(got) == v1 - v0 + 1  # dense spine, no gaps
        for v in range(v0, v1 + 1):
            ym = (v // 12) * 100 + (v % 12) + 1
            assert int(got.loc[ym, "cents"]) == int(rev.get(v, 0))


class TestProfileColumns:
    def test_per_column_stats(self, spark):
        got = run(spark, "d_profile_columns").set_index("col")
        o = pd.read_parquet(f"{SF}/orders.parquet")
        epoch_days = (o.o_orderdate.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        expect = {
            "o_custkey": (0, o.o_custkey.nunique(), int(o.o_custkey.min()), int(o.o_custkey.max())),
            "o_orderdate": (0, o.o_orderdate.nunique(), int(epoch_days.min()), int(epoch_days.max())),
            "o_orderkey": (0, o.o_orderkey.nunique(), int(o.o_orderkey.min()), int(o.o_orderkey.max())),
            "o_orderpriority": (0, o.o_orderpriority.nunique(), None, None),
            "o_totalprice": (
                0,
                o.o_totalprice.nunique(),
                cents(o.o_totalprice.min()),
                cents(o.o_totalprice.max()),
            ),
        }
        assert set(got.index) == set(expect)
        for col, (nn, nd, mn, mx) in expect.items():
            row = got.loc[col]
            assert int(row["n_nulls"]) == nn
            assert int(row["n_distinct"]) == nd
            if mn is None:
                assert pd.isna(row["min_i"]) and pd.isna(row["max_i"])
            else:
                assert int(row["min_i"]) == mn and int(row["max_i"]) == mx
