"""Independent-derivation sweep, part 29: vocabulary analytics
(Heaps growth, n-gram novelty, top-k vocab, token counts, per-group
top bigrams).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


class TestVocabGrowth:
    def test_heaps_curve(self, spark, docs):
        got = run(spark, "t_vocab_growth").set_index("decile")
        d = docs[docs.text.str.len() > 0].sort_values("doc_id")
        first_seen = {}
        for did, txt in zip(d.doc_id, d.text):
            ws = txt.lower().split(" ")
            for i in range(len(ws) - 2):
                g = " ".join(ws[i : i + 3])
                if g not in first_seen:
                    first_seen[g] = did
        n_docs = int(docs.doc_id.max()) + 1
        per_dec = Counter(fd * 10 // n_docs for fd in first_seen.values())
        assert set(got.index) == set(per_dec)
        cum = 0
        for dec in sorted(per_dec):
            cum += per_dec[dec]
            row = got.loc[dec]
            assert int(row["new_types"]) == per_dec[dec]
            assert int(row["cum_vocab"]) == cum
        assert cum == len(first_seen)  # every type attributed once


class TestNgramNovelty:
    def test_first_seen_share(self, spark, docs):
        got = run(spark, "t_ngram_novelty").set_index("doc_id")
        gram_sets = {}
        for did, txt in sorted(zip(docs.doc_id, docs.text)):
            ws = txt.split(" ")
            if len(ws) < 3:
                continue
            # index spine capped at 400 like both engines
            gs = {
                " ".join(ws[i : i + 3])
                for i in range(min(len(ws) - 2, 400))
            }
            gram_sets[did] = gs
        first = {}
        for did in sorted(gram_sets):
            for g in gram_sets[did]:
                if g not in first:
                    first[g] = did
        for did, gs in gram_sets.items():
            new = sum(1 for g in gs if first[g] == did)
            row = got.loc[did]
            assert int(row["n_grams"]) == len(gs)
            assert abs(row["novelty"] - new / len(gs)) < 1e-5


class TestVocabTopk:
    def test_top20(self, spark, docs):
        got = run(spark, "j_vocab_topk")
        c: Counter = Counter()
        for txt in docs.text:
            c.update(t for t in re.split(r"\s+", txt.strip()) if t)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        for (_, g), (tok, n) in zip(got.iterrows(), want):
            assert g["tok"] == tok
            assert int(g["n"]) == n


class TestTokenCount:
    def test_word_and_subtoken_counts(self, spark, docs):
        got = run(spark, "j_token_count").set_index("doc_id")
        for did, txt in zip(docs.doc_id, docs.text):
            words = [t for t in re.split(r"\s+", txt) if t]
            pre = re.sub(r"([^A-Za-z0-9\s])", r" \1 ", txt)
            subtoks = [t for t in re.split(r"\s+", pre) if t]
            row = got.loc[did]
            assert int(row["n_words"]) == len(words)
            assert int(row["n_subtokens"]) == len(subtoks)
            assert len(subtoks) >= len(words)  # splitting only adds


class TestTopNgramsPerGroup:
    def test_top3_bigrams(self, spark, docs):
        got = run(spark, "q_top_ngrams_per_group").set_index(["lang", "rk"])
        per_lang: dict[str, Counter] = {}
        for lang, txt in zip(docs.lang, docs.text):
            ws = [t for t in txt.split(" ") if t]
            c = per_lang.setdefault(lang, Counter())
            c.update(" ".join(ws[i : i + 2]) for i in range(len(ws) - 1))
        for lang, c in per_lang.items():
            top3 = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            for rk, (bg, n) in enumerate(top3, 1):
                row = got.loc[(lang, rk)]
                assert row["bigram"] == bg
                assert int(row["n"]) == n
