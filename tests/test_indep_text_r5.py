"""Independent-derivation sweep, part 17: text analysis (token
entropy, tf-idf, quality heuristics, hapax profile, OOV rate).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


class TestTokenEntropy:
    def test_shannon(self, spark, docs):
        got = run(spark, "j_token_entropy").set_index("doc_id")
        for d, txt in zip(docs.doc_id, docs.text):
            toks = [t for t in txt.split(" ") if t]
            if not toks:
                assert d not in got.index
                continue
            c = Counter(toks)
            n = len(toks)
            # textbook Shannon entropy H = -sum p ln p
            h = -sum((v / n) * math.log(v / n) for v in c.values())
            row = got.loc[d]
            assert int(row["n_tokens"]) == n
            assert int(row["n_distinct"]) == len(c)
            assert abs(row["entropy"] - h) < 1e-3
            # 4-dp rounding can push the reported value ~5e-5 above ln(n)
            assert -1e-9 <= row["entropy"] <= math.log(n) + 5e-5


class TestTfidf:
    def test_top50(self, spark, docs):
        got = run(spark, "j_tfidf")
        tf: dict[tuple[int, str], int] = {}
        df: Counter = Counter()
        for d, txt in zip(docs.doc_id, docs.text):
            c = Counter(t for t in txt.split(" ") if t)
            for w, n in c.items():
                tf[(d, w)] = n
                df[w] += 1
        N = len(docs)
        scored = [
            (d, w, n, df[w], round(n * math.log(N / df[w]), 6))
            for (d, w), n in tf.items()
        ]
        scored.sort(key=lambda r: (-r[4], r[0], r[1]))
        want = scored[:50]
        assert len(got) == 50
        for (_, g), w in zip(got.iterrows(), want):
            assert (g["doc_id"], g["term"]) == (w[0], w[1])
            assert (int(g["tf"]), int(g["df"])) == (w[2], w[3])
            assert abs(g["tfidf"] - w[4]) < 1e-5


class TestQualityScore:
    def test_heuristics(self, spark, docs):
        got = run(spark, "j_quality_score").set_index("doc_id")
        for d, txt in zip(docs.doc_id, docs.text):
            words = [t for t in re.split(r"\s+", txt) if t]
            nw = max(len(words), 1)
            alpha = len(re.sub(r"[^A-Za-z]", "", txt))
            stop = sum(1 for w in words if w in ("the", "a", "and", "of", "to", "in"))
            row = got.loc[d]
            assert int(row["n_chars_m"]) == len(txt)
            assert int(row["n_words"]) == len(words)
            assert abs(row["mean_word_len"] - alpha / nw) < 1e-5
            assert abs(row["stopword_ratio"] - stop / nw) < 1e-5
            assert abs(row["alpha_ratio"] - alpha / max(len(txt), 1)) < 1e-5


class TestHapax:
    def test_long_tail(self, spark, docs):
        got = run(spark, "t_hapax_profile").set_index("source")
        d = docs[docs.text.str.len() > 0]
        for src, grp in d.groupby("source"):
            c: Counter = Counter()
            for txt in grp.text:
                c.update(t for t in txt.lower().split(" ") if t)
            n_types = len(c)
            hapax = sum(1 for v in c.values() if v == 1)
            dis = sum(1 for v in c.values() if v == 2)
            row = got.loc[src]
            assert int(row["n_types"]) == n_types
            assert int(row["n_tokens"]) == sum(c.values())
            assert int(row["n_hapax"]) == hapax
            assert int(row["n_dis"]) == dis
            assert int(row["hapax_ppm"]) == hapax * 1_000_000 // n_types
            # (no Zipf hapax>=dis sanity: the synthetic corpus repeats
            # tokens, so sources legitimately have 0 hapax, 1 dis)


class TestOov:
    def test_top25_vocab_coverage(self, spark, docs):
        got = run(spark, "j_oov_rate").set_index("source")
        toks_by_src: dict[str, list[str]] = {}
        allc: Counter = Counter()
        for src, txt in zip(docs.source, docs.text):
            ts = [t for t in re.split(r"\s+", txt.strip()) if t]
            toks_by_src.setdefault(src, []).extend(ts)
            allc.update(ts)
        vocab = {
            w
            for w, _ in sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
        }
        for src, ts in toks_by_src.items():
            row = got.loc[src]
            oov = sum(1 for t in ts if t not in vocab)
            assert int(row["n_tokens"]) == len(ts)
            assert int(row["n_oov"]) == oov
