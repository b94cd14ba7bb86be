"""Independent-derivation sweep, part 24: near-dup primitives (exact
Jaccard pairs, char/word shingles, fingerprint invariants, duplicated
n-gram fraction).
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


def words(txt):
    return [t for t in re.split(r"\s+", txt.strip()) if t]


class TestJaccardPairs:
    def test_top20_exact(self, spark, docs):
        got = run(spark, "j_jaccard_neardup")
        sets = {}
        for did, txt in zip(docs.doc_id, docs.text):
            w = words(txt)
            if len(w) >= 3:
                sets[did] = {
                    " ".join(w[i : i + 3]) for i in range(len(w) - 2)
                }
        # inverted index: only pairs sharing >= 1 shingle
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
        scored = [
            (a, b, n, round(n / (len(sets[a]) + len(sets[b]) - n), 6))
            for (a, b), n in inter.items()
        ]
        scored.sort(key=lambda r: (-r[3], r[0], r[1]))
        want = scored[:20]
        assert len(got) == min(20, len(want))
        for (_, g), w in zip(got.iterrows(), want):
            assert (g["id_a"], g["id_b"]) == (w[0], w[1])
            assert int(g["inter"]) == w[2]
            assert abs(g["jaccard"] - w[3]) < 1e-6


class TestShingles:
    def test_char_5grams(self, spark, docs):
        got = run(spark, "j_char_shingles").set_index("doc_id")
        for did, txt in zip(docs.doc_id, docs.text):
            row = got.loc[did]
            if len(txt) >= 5:
                grams = [txt[i : i + 5] for i in range(len(txt) - 4)]
                assert int(row["n_grams"]) == len(grams)
                assert int(row["n_distinct"]) == len(set(grams))
            else:
                assert int(row["n_grams"]) == 0

    def test_word_3grams(self, spark, docs):
        got = run(spark, "j_ngram_shingles").set_index("doc_id")
        for did, txt in zip(docs.doc_id, docs.text):
            w = words(txt)
            row = got.loc[did]
            if len(w) >= 3:
                grams = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
                assert int(row["n_shingles"]) == len(grams)
                assert int(row["n_distinct"]) == len(set(grams))
            else:
                assert int(row["n_shingles"]) == 0


class TestFingerprint:
    def test_invariants(self, spark, docs):
        got = run(spark, "j_fingerprint").iloc[0]
        norms = {" ".join(words(t.lower())) for t in docs.text}
        assert int(got["n_docs"]) == len(docs)
        assert int(got["n_distinct_norm"]) == len(norms)
        assert bool(got["fp_injective"]) and bool(got["fp_consistent"])


class TestDupNgramFraction:
    def test_per_source_average(self, spark, docs):
        got = run(spark, "t_dup_ngram_fraction").set_index("source")
        per_doc = {}
        gram_docs: Counter = Counter()
        doc_grams = {}
        for did, src, txt in zip(docs.doc_id, docs.source, docs.text):
            w = [t for t in txt.split(" ") if t]
            if len(w) < 5:
                continue
            grams = {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}
            doc_grams[did] = (src, grams)
            for g in grams:
                gram_docs[g] += 1
        agg: dict[str, list[float]] = {}
        for did, (src, grams) in doc_grams.items():
            dup = sum(1 for g in grams if gram_docs[g] >= 5)
            agg.setdefault(src, []).append(dup / len(grams))
        for src, fracs in agg.items():
            row = got.loc[src]
            assert int(row["n_docs"]) == len(fracs)
            assert abs(row["avg_dup_frac"] - sum(fracs) / len(fracs)) < 1e-3
