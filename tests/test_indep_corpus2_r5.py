"""Independent-derivation sweep, part 25: corpus quality/safety ops
(repetition counters, PII redaction, contamination, filter funnel,
winsorize).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, cents, run


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def words(txt):
    return [t for t in re.split(r"\s+", txt.strip()) if t]


class TestRepetitionSignals:
    def test_gopher_counters(self, spark, docs):
        got = run(spark, "t_repetition_signals").set_index("doc_id")
        for did, txt in zip(docs.doc_id, docs.text):
            w = words(txt)
            if not w:
                assert did not in got.index
                continue
            uni = Counter(w)
            bi = Counter(" ".join(w[i : i + 2]) for i in range(len(w) - 1))
            row = got.loc[did]
            assert int(row["n_words"]) == len(w)
            assert int(row["n_distinct_words"]) == len(uni)
            assert int(row["top_word_n"]) == max(uni.values())
            assert int(row["n_bigrams"]) == (len(w) - 1 if len(w) >= 2 else 0)
            assert int(row["top_bigram_n"]) == (max(bi.values()) if bi else 0)


class TestPiiRedact:
    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    PHONE = r"\+1-555-[0-9]{4}"

    def test_counts_and_scrub_proof(self, spark, docs):
        got = run(spark, "t_pii_redact").set_index("doc_id")
        for did, txt in zip(docs.doc_id, docs.text):
            planted = (
                f"{txt} contact user{did}@example.com or +1-555-{did % 10000:04d}"
            )
            n_em = len(re.findall(self.EMAIL, planted))
            n_ph = len(re.findall(self.PHONE, planted))
            red = re.sub(self.PHONE, "<PHONE>", re.sub(self.EMAIL, "<EMAIL>", planted))
            sha = hashlib.sha256(red.encode()).hexdigest()
            row = got.loc[did]
            assert int(row["n_emails"]) == n_em >= 1
            assert int(row["n_phones"]) == n_ph >= 1
            assert row["redacted_sha"] == sha
            # the scrub really removed the PII
            assert not re.search(self.EMAIL, red.replace("<EMAIL>", ""))


class TestContamination:
    def test_benchmark_overlap(self, spark, docs):
        got = run(spark, "t_contamination").set_index("doc_id")
        NGRAM = 4
        gram_sets = {}
        for did, txt in zip(docs.doc_id, docs.text):
            w = words(txt)
            if len(w) >= NGRAM:
                gram_sets[did] = {
                    " ".join(w[i : i + NGRAM]) for i in range(len(w) - NGRAM + 1)
                }
        bench = set()
        for did, gs in gram_sets.items():
            if did % 50 == 0:
                bench |= gs
        expect = {
            did: len(gs & bench)
            for did, gs in gram_sets.items()
            if did % 50 != 0 and gs & bench
        }
        assert len(got) == len(expect)
        for did, n in expect.items():
            assert int(got.loc[did, "n_overlap"]) == n


class TestFilterFunnel:
    def test_successive_gates(self, spark, docs):
        got = run(spark, "t_filter_pipeline").set_index("source")
        for src, grp in docs.groupby("source"):
            n = len(grp)
            p_lang = p_len = p_rep = 0
            for lang, txt in zip(grp.lang, grp.text):
                w = words(txt)
                if lang != "en":
                    continue
                p_lang += 1
                if not (20 <= len(w) <= 400):
                    continue
                p_len += 1
                if len(set(w)) * 100 >= len(w) * 25:
                    p_rep += 1
            row = got.loc[src]
            assert int(row["n_total"]) == n
            assert int(row["pass_lang"]) == p_lang
            assert int(row["pass_length"]) == p_len
            assert int(row["pass_repetition"]) == p_rep
            assert n >= p_lang >= p_len >= p_rep  # funnel monotonicity


class TestWinsorize:
    def test_clamped_totals(self, spark):
        got = run(spark, "etl_winsorize").set_index("l_returnflag")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        for rf, grp in li.groupby("l_returnflag"):
            v = grp.l_extendedprice.to_numpy()
            p05 = np.percentile(v, 5, method="linear")
            p95 = np.percentile(v, 95, method="linear")
            capped = np.clip(v, p05, p95)
            total = sum(cents(float(x)) for x in capped) / 100.0
            row = got.loc[rf]
            assert int(row["n_capped_low"]) == int((v < p05).sum())
            assert int(row["n_capped_high"]) == int((v > p95).sum())
            assert abs(row["capped_total"] - total) < 0.05
            # winsorizing shrinks the total spread but preserves count
            assert capped.min() >= p05 - 1e-9 and capped.max() <= p95 + 1e-9
