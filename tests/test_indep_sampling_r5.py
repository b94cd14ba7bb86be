"""Independent-derivation sweep, part 31: sampling/selection ops
(length band filter, epoch shuffle checksums, greedy coreset, bloom
pre-screen re-built bit-for-bit in python).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


class TestLengthBand:
    def test_p5_p95_filter(self, spark, docs):
        got = run(spark, "j_length_percentile_filter").set_index("lang")
        lo = np.percentile(docs.n_chars, 5, method="linear")
        hi = np.percentile(docs.n_chars, 95, method="linear")
        kept = docs[(docs.n_chars >= lo) & (docs.n_chars <= hi)]
        for lang, grp in kept.groupby("lang"):
            row = got.loc[lang]
            assert int(row["n"]) == len(grp)
            assert int(row["mn"]) == int(grp.n_chars.min())
            assert int(row["mx"]) == int(grp.n_chars.max())
        # the band keeps ~90% of the corpus
        assert 0.85 <= len(kept) / len(docs) <= 0.95


class TestEpochShuffle:
    def test_permutation_checksums(self, spark, docs):
        got = run(spark, "t_epoch_shuffle").set_index("epoch")
        ids = sorted(docs.doc_id)
        checks = {}
        for epoch in range(3):
            keyed = sorted(
                (hashlib.md5(f"{did}:{epoch}".encode()).hexdigest(), did)
                for did in ids
            )
            checksum = 0
            fixed = 0
            for pos, (_, did) in enumerate(keyed, 1):
                checksum = (checksum + pos * did) % 1000000007
                if pos == did + 1:
                    fixed += 1
            checks[epoch] = (checksum, fixed)
            row = got.loc[epoch]
            assert int(row["n_docs"]) == len(ids)
            assert int(row["order_checksum"]) == checksum
            assert int(row["n_fixed_points"]) == fixed
        # epochs genuinely differ: three distinct permutations
        assert len({c for c, _ in checks.values()}) == 3


class TestCoreset:
    def test_greedy_max_coverage(self, spark, docs):
        got = run(spark, "t_coreset_greedy_coverage").set_index("pick")
        postings = {}
        for did, txt in zip(docs.doc_id, docs.text):
            ws = txt.lower().split(" ")
            if len(ws) < 3:
                continue
            postings[did] = {
                " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
            }
        pool = sorted(postings, key=lambda d: (-len(postings[d]), d))[:20]
        covered = set()
        pick = 0
        for want_pick in range(1, 6):
            best = None
            for doc in pool:
                if any(int(got.loc[p, "doc_id"]) == doc for p in got.index if p < want_pick):
                    continue
                gain = len(postings[doc] - covered)
                key = (-gain, doc)
                if best is None or key < best[0]:
                    best = (key, doc, gain)
            _, doc, gain = best
            if gain == 0:
                assert want_pick not in got.index
                break
            row = got.loc[want_pick]
            assert int(row["doc_id"]) == doc
            assert int(row["new_types"]) == gain
            covered |= postings[doc]
        # greedy gains are non-increasing (submodularity)
        gains = [int(got.loc[p, "new_types"]) for p in sorted(got.index)]
        assert gains == sorted(gains, reverse=True)


class TestBloomPrescreen:
    def test_bit_exact_bloom(self, spark, docs):
        got = run(spark, "t_bloom_prescreen").iloc[0]
        d = docs[docs.text.str.len() > 0]
        cutoff = (int(d.doc_id.max()) * 4) // 5
        def positions(h):
            out = []
            for start in (0, 5, 10):
                out.append(int(h[start : start + 5], 16) % 1048576)
            return out

        existing_bits = set()
        hashes = {}
        for did, txt in zip(d.doc_id, d.text):
            h = hashlib.md5(txt.lower().encode()).hexdigest()
            hashes[did] = h
            if did < cutoff:
                existing_bits.update(positions(h))
        existing_hashes = {h for did, h in hashes.items() if did < cutoff}
        n_inc = n_true = n_flag = n_fp = 0
        no_fn = True
        for did, h in hashes.items():
            if did < cutoff:
                continue
            n_inc += 1
            is_dup = h in existing_hashes
            flagged = all(p in existing_bits for p in positions(h))
            n_true += is_dup
            n_flag += flagged
            if flagged and not is_dup:
                n_fp += 1
            if is_dup and not flagged:
                no_fn = False
        assert int(got["n_incoming"]) == n_inc
        assert int(got["n_true_dupes"]) == n_true
        assert int(got["n_flagged"]) == n_flag
        assert int(got["n_false_pos"]) == n_fp
        assert bool(got["no_false_negatives"]) == no_fn
        assert no_fn  # the bloom contract itself
