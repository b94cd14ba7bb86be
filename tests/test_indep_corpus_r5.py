"""Independent-derivation sweep, part 23: training-corpus prep ops
(sequence packing, FIM split, k-anonymity, source mix, temperature
mix) — the LLM-pipeline family the brief grades as first-class.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run, trunc_div


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def n_tok(txt: str) -> int:
    return len([t for t in re.split(r"\s+", txt.strip()) if t])


class TestSequencePack:
    def test_packing_manifest(self, spark, docs):
        got = run(spark, "t_sequence_pack").set_index("bin_id")
        d = docs.sort_values("doc_id")
        start = 0
        bins: dict[int, list] = {}
        for did, txt in zip(d.doc_id, d.text):
            nt = n_tok(txt)
            b = start // 512
            e = bins.setdefault(b, [0, 0, did, did, 0])
            e[0] += 1
            e[1] += nt
            e[3] = did
            if start + nt > (b + 1) * 512:
                e[4] += 1
            start += nt
        assert set(got.index) == set(bins)
        total_tokens = 0
        for b, (n, tk, first, last, crossers) in bins.items():
            row = got.loc[b]
            assert int(row["n_docs"]) == n
            assert int(row["bin_tokens"]) == tk
            assert int(row["first_doc"]) == first
            assert int(row["last_doc"]) == last
            assert int(row["n_boundary_crossers"]) == crossers
            total_tokens += tk
        # conservation: every token lands in exactly one bin attribution
        assert total_tokens == sum(n_tok(t) for t in docs.text)


class TestFimSplit:
    def test_split_conservation(self, spark, docs):
        got = run(spark, "t_fim_split").set_index("source")
        d = docs[docs.text.str.len() >= 6]
        agg: dict[str, list[int]] = {}
        for src, txt in zip(d.source, d.text):
            n = len(txt)
            h1 = int(hashlib.md5((txt + "-p").encode()).hexdigest()[:8], 16)
            h2 = int(hashlib.md5((txt + "-m").encode()).hexdigest()[:8], 16)
            a = 1 + h1 % (n // 3)
            b = n - 1 - h2 % (n // 3)
            mid = len(txt[a:b])
            e = agg.setdefault(src, [0, 0, 0, 0, 0])
            e[0] += 1
            e[1] += a
            e[2] += mid
            e[3] += n - b
            e[4] += n
            # the three segments reconstruct the text, per doc
            assert txt[:a] + txt[a:b] + txt[b:] == txt
            assert a >= 1 and b <= n - 1 and a < b
        for src, (nd, pre, mid, suf, tot) in agg.items():
            row = got.loc[src]
            assert int(row["n_docs"]) == nd
            assert int(row["prefix_chars"]) == pre
            assert int(row["middle_chars"]) == mid
            assert int(row["suffix_chars"]) == suf
            assert bool(row["reconstructed"])
            assert pre + mid + suf == tot
            assert int(row["middle_ppm"]) == trunc_div(mid * 1_000_000, tot)


class TestKAnonymity:
    def test_qid_audit(self, spark):
        got = run(spark, "t_k_anonymity").iloc[0]
        c = pd.read_parquet(f"{SF}/customer.parquet")
        qid = pd.DataFrame(
            {
                "seg": c.c_mktsegment,
                "nat": c.c_nationkey,
                "band": (c.c_acctbal / 1000).apply(math.floor),
            }
        )
        ks = qid.groupby(["seg", "nat", "band"]).size()
        small = ks[ks < 5]
        assert int(got["n_groups"]) == len(ks)
        assert int(got["n_rows"]) == len(c)
        assert int(got["min_k"]) == int(ks.min())
        assert int(got["groups_lt_5"]) == len(small)
        assert int(got["rows_suppressed"]) == int(small.sum())
        assert abs(got["suppression_rate"] - small.sum() / len(c)) < 1e-4


class TestSourceMix:
    def test_uniform_target_weights(self, spark, docs):
        got = run(spark, "t_source_mix").set_index("source")
        toks = docs.assign(t=[n_tok(x) for x in docs.text]).groupby("source")["t"].sum()
        tot, nsrc = int(toks.sum()), len(toks)
        for src, tk in toks.items():
            row = got.loc[src]
            assert int(row["src_tokens"]) == tk
            assert abs(row["actual_share"] - tk / tot) < 1e-6
            assert abs(row["mix_weight"] - (1 / nsrc) / (tk / tot)) < 1e-4
        # the reweighted mixture really is uniform:
        # actual_share * mix_weight == 1/nsrc for every source
        prod = got["actual_share"] * got["mix_weight"]
        assert (abs(prod - 1 / nsrc) < 1e-4).all()


class TestTemperatureMix:
    def test_alpha_07(self, spark, docs):
        got = run(spark, "t_temperature_mix").set_index("source")
        per = docs.groupby("source").size()
        total = per.sum()
        z = sum(n**0.7 for n in per)
        for src, n in per.items():
            row = got.loc[src]
            assert int(row["n_docs"]) == n
            assert abs(row["p_raw"] - n / total) < 1e-6
            assert abs(row["p_temp"] - n**0.7 / z) < 1e-6
            assert abs(row["upsample"] - (n**0.7 / z) / (n / total)) < 1e-3
        # temperature flattening: scarcest source upsampled most
        order_by_n = per.sort_values().index
        ups = got["upsample"]
        assert ups[order_by_n[0]] >= ups[order_by_n[-1]]
        # both p_raw and p_temp are distributions
        assert abs(got["p_raw"].sum() - 1) < 1e-4
        assert abs(got["p_temp"].sum() - 1) < 1e-4
