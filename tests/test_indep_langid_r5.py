"""Independent-derivation sweep, part 35: language ID, code routing,
l-diversity, SimHash recall ground truth.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def lang_profiles(docs, top_k=8):
    per_lang: dict[str, Counter] = {}
    for lang, txt in zip(docs.lang, docs.text):
        per_lang.setdefault(lang, Counter()).update(
            w for w in txt.split(" ") if w
        )
    return {
        lang: [
            (t, n, i + 1)
            for i, (t, n) in enumerate(
                sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
            )
        ]
        for lang, c in per_lang.items()
    }


class TestLangProfiles:
    def test_top8_per_lang(self, spark, docs):
        got = run(spark, "j_lang_profiles").set_index(["lang", "rk"])
        prof = lang_profiles(docs)
        assert len(got) == sum(len(v) for v in prof.values())
        for lang, rows in prof.items():
            for term, cnt, rk in rows:
                row = got.loc[(lang, rk)]
                assert row["term"] == term
                assert int(row["cnt"]) == cnt


class TestLangidClassify:
    def test_confusion_matrix(self, spark, docs):
        got = run(spark, "j_langid_classify").set_index(["true_lang", "pred_lang"])
        prof = lang_profiles(docs)
        term_langs = defaultdict(list)
        for lang, rows in prof.items():
            for term, _, _ in rows:
                term_langs[term].append(lang)
        conf: Counter = Counter()
        for did, lang, txt in zip(docs.doc_id, docs.lang, docs.text):
            votes: Counter = Counter()
            for w in txt.split(" "):
                if w:
                    for cand in term_langs.get(w, ()):
                        votes[cand] += 1
            if not votes:
                continue
            pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            conf[(lang, pred)] += 1
        assert len(got) == len(conf)
        for key, n in conf.items():
            assert int(got.loc[key, "n"]) == n


class TestCodeDetector:
    def test_symbol_density_routing(self, spark, docs):
        got = run(spark, "j_code_detector").set_index("source")
        d = docs[docs.text.str.len() > 0]
        agg: dict[str, list[int]] = {}
        for src, txt in zip(d.source, d.text):
            n_chars = len(txt)
            n_sym = sum(txt.count(ch) for ch in ";{}=")
            n_words = len(txt.split(" "))
            is_code = int(
                n_sym * 1000 > n_chars * 5
                or (n_words > 0 and n_chars * 10 > n_words * 120)
            )
            e = agg.setdefault(src, [0, 0])
            e[0] += 1
            e[1] += is_code
        for src, (n, nc) in agg.items():
            row = got.loc[src]
            assert int(row["n_docs"]) == n
            assert int(row["n_code"]) == nc
            assert int(row["code_ppm"]) == nc * 1_000_000 // n


class TestLDiversity:
    def test_sensitive_value_census(self, spark, docs):
        got = run(spark, "t_l_diversity").iloc[0]
        g = docs.groupby([docs.lang, docs.n_chars // 500]).agg(
            k=("doc_id", "size"), l=("source", "nunique")
        )
        low = g[g.l < 2]
        assert int(got["n_groups"]) == len(g)
        assert int(got["min_k"]) == int(g.k.min())
        assert int(got["min_l"]) == int(g.l.min())
        assert int(got["n_low_diversity"]) == len(low)
        assert int(got["docs_at_risk"]) == int(low.k.sum())


class TestSimhashRecall:
    def test_ground_truth_pair_count(self, spark, docs):
        got = run(spark, "j_simhash_neardup").iloc[0]
        # re-derive the exact-Jaccard >= 0.8 ground-truth pair count
        sets = {}
        for did, txt in zip(docs.doc_id, docs.text):
            w = [t for t in re.split(r"\s+", txt.strip()) if t]
            if len(w) >= 3:
                sets[did] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        inv = defaultdict(list)
        for did, sh in sets.items():
            for s in sh:
                inv[s].append(did)
        inter: Counter = Counter()
        for ids in inv.values():
            ids.sort()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    inter[(ids[i], ids[j])] += 1
        n_true = sum(
            1
            for (a, b), n in inter.items()
            if round(n / (len(sets[a]) + len(sets[b]) - n), 6) >= 0.8
        )
        assert int(got["n_true"]) == n_true
        assert bool(got["recall_ok"])  # SimHash finds >= 80% of them
