"""Independent-derivation sweep, part 11: ML/vector primitives
(power iteration, intrinsic dimension, bigram LM, Matryoshka energy,
k-means invariants, retrieval metrics, PMI). numpy/pure-python
re-derivations vs the Spark entries at sf0.001.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run, trunc_div


def q_micro(x: float) -> int:
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(float(x) * 1_000_000)).to_integral_value(ROUND_HALF_UP))


@pytest.fixture(scope="module")
def emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


class TestPowerIteration:
    def test_integer_recurrence_and_eigvec_twin(self, spark, emb):
        got = run(spark, "j_gram_power_iteration").set_index("dim")
        DIMS = len(got)
        Q = np.array(
            [[q_micro(x) for x in v[:DIMS]] for v in emb.embedding], dtype=object
        )
        # exact integer Gram: sum over vectors of q_r*q_c, div 1e6 AFTER
        gram = [[0] * DIMS for _ in range(DIMS)]
        for row in Q:
            for r in range(DIMS):
                for c in range(DIMS):
                    gram[r][c] += int(row[r]) * int(row[c])
        gram = [[trunc_div(gram[r][c], 1_000_000) for c in range(DIMS)] for r in range(DIMS)]
        v = [10**6] * DIMS
        for _ in range(100):
            w = [sum(gram[i][j] * v[j] for j in range(DIMS)) for i in range(DIMS)]
            s = max(max(abs(x) for x in w) // 10**6, 1)
            v = [trunc_div(x, s) for x in w]
        for i in range(DIMS):
            assert int(got.loc[i + 1, "v_micro"]) == v[i]
            assert int(got.loc[i + 1, "g_diag"]) == gram[i][i]
        # independent twin: numpy principal eigenvector of the float Gram
        # (this twin caught the original 10-iteration non-convergence:
        # eigengap 0.958 left the iterate at cosine 0.65 after 10 steps)
        M = np.zeros((DIMS, DIMS))
        for row in emb.embedding:
            x = np.array(row[:DIMS], dtype=float)
            M += np.outer(x, x)
        evals, evecs = np.linalg.eigh(M)
        top = evecs[:, -1]
        vn = np.array(v, dtype=float)
        cos = abs(vn @ top) / (np.linalg.norm(vn) * np.linalg.norm(top))
        assert cos > 0.999


class TestIntrinsicDimension:
    def test_two_nn_mle(self, spark, emb):
        got = run(spark, "j_intrinsic_dimension").iloc[0]
        sub = emb[emb.vec_id < 200].sort_values("vec_id")
        Q = np.array([[q_micro(x) for x in v] for v in sub.embedding], dtype=np.int64)
        n = len(Q)
        ids = sub.vec_id.to_numpy()
        mu_sum = 0
        n_pts = 0
        for a in range(n):
            d2s = []
            for b in range(n):
                if a == b:
                    continue
                diff = Q[a] - Q[b]
                d2 = int(sum(trunc_div(int(x) * int(x), 1_000_000) for x in diff))
                d2s.append((d2, ids[b]))
            d2s.sort()
            r1, r2 = d2s[0][0], d2s[1][0]
            if r1 > 0:
                n_pts += 1
                from decimal import ROUND_HALF_UP, Decimal

                mu = int(
                    Decimal(repr(math.log(r2 / r1) * 1_000_000 / 2)).to_integral_value(
                        ROUND_HALF_UP
                    )
                )
                mu_sum += mu
        assert int(got["n_points"]) == n_pts
        assert int(got["sum_mu_micro"]) == mu_sum
        assert int(got["id_estimate"]) == n_pts * 1_000_000 // max(mu_sum, 1)
        assert int(got["id_milli"]) == n_pts * 1_000_000_000 // max(mu_sum, 1)
        # independent twin: the Facco two-NN MLE in floats
        id_float = n_pts / (mu_sum / 1e6)
        assert abs(int(got["id_milli"]) / 1000 - id_float) < 0.01


class TestBigramLM:
    def test_laplace_bigrams(self, spark, docs):
        got = run(spark, "j_bigram_logprob").set_index("doc_id")
        toks = {d: [t for t in txt.split(" ") if t] for d, txt in zip(docs.doc_id, docs.text)}
        bg_counts: dict[tuple[str, str], int] = {}
        ctx: dict[str, int] = {}
        vocab = set()
        for ts in toks.values():
            vocab.update(ts)
            for a, b in zip(ts, ts[1:]):
                bg_counts[(a, b)] = bg_counts.get((a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        V = len(vocab)
        for d, ts in toks.items():
            bgs = list(zip(ts, ts[1:]))
            if not bgs:
                assert d not in got.index
                continue
            lp = np.mean(
                [math.log((bg_counts[(a, b)] + 1.0) / (ctx[a] + V)) for a, b in bgs]
            )
            row = got.loc[d]
            assert int(row["n_bigrams"]) == len(bgs)
            assert abs(row["avg_logprob"] - lp) < 1e-3
            assert row["avg_logprob"] < 0  # probabilities < 1


class TestMatryoshka:
    def test_energy_profile(self, spark, emb):
        got = run(spark, "j_matryoshka_energy").set_index("k")
        V = np.array([np.array(v, dtype=float) for v in emb.embedding])
        full = (V**2).sum(axis=1)
        for k in (8, 16, 32, 64):
            ratios = np.round((V[:, :k] ** 2).sum(axis=1) / full, 6)
            row = got.loc[k]
            assert int(row["n_vecs"]) == len(V)
            assert abs(row["avg_energy"] - ratios.mean()) < 1e-3
        # energy is monotone in k and exactly 1 at full width
        es = [got.loc[k, "avg_energy"] for k in (8, 16, 32, 64)]
        assert es == sorted(es) and abs(es[-1] - 1.0) < 1e-9


class TestKmeansInvariants:
    def test_lloyd_descent_and_purity(self, spark, emb):
        got = run(spark, "j_kmeans_purity").iloc[0]
        V = np.array([np.array(v, dtype=float) for v in emb.embedding])
        labels = emb.label.to_numpy()
        k = 8
        seeds = V[np.argsort(emb.vec_id.to_numpy())[:k]]
        # numpy Lloyd (float, no rounding) — the independent check that
        # the invariants the entry asserts hold for textbook k-means too
        cents = seeds.copy()
        for _ in range(2):
            d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            asg = d2.argmin(axis=1)
            inertia = d2.min(axis=1).sum()
            for c in range(k):
                if (asg == c).any():
                    cents[c] = V[asg == c].mean(axis=0)
        d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        asg2 = d2.argmin(axis=1)
        inertia2 = d2.min(axis=1).sum()
        assert inertia2 <= inertia + 1e-9
        maj = sum(
            pd.Series(labels[asg2 == c]).value_counts().iloc[0]
            for c in range(k)
            if (asg2 == c).any()
        )
        n_labels = len(set(labels))
        assert maj * n_labels > len(V)  # purity above random, independently
        assert bool(got["inertia_decreased"]) and bool(got["purity_above_random"])
        assert int(got["n_vectors"]) == len(V)


class TestRetrievalMetrics:
    def test_precision_and_mrr(self, spark, emb):
        got = run(spark, "j_retrieval_metrics").iloc[0]
        q = emb[emb.vec_id == 0].iloc[0]
        qv = np.array(q.embedding, dtype=float)
        rest = emb[emb.vec_id != 0]
        sims = []
        for vid, v, lab in zip(rest.vec_id, rest.embedding, rest.label):
            x = np.array(v, dtype=float)
            sim = round(float(x @ qv / (np.linalg.norm(x) * np.linalg.norm(qv))), 4)
            sims.append((-sim, vid, lab == q.label))
        sims.sort()
        top = sims[:10]
        hits = sum(1 for _, _, rel in top if rel)
        first = next((i + 1 for i, (_, _, rel) in enumerate(top) if rel), None)
        assert int(got["hits_at_10"]) == hits
        assert int(got["precision_ppm"]) == hits * 1_000_000 // 10
        assert int(got["mrr_ppm"]) == (1_000_000 // first if first else 0)


class TestPmiCells:
    def test_per_cell_pmi(self, spark):
        got = run(spark, "d_pmi_cells").set_index(["rf", "ls"])
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        ct = pd.crosstab(li.l_returnflag, li.l_linestatus)
        n = ct.values.sum()
        for rf in ct.index:
            for ls in ct.columns:
                o = int(ct.loc[rf, ls])
                if o == 0:
                    continue
                pmi = math.log(o * n / (ct.loc[rf].sum() * ct[ls].sum()))
                row = got.loc[(rf, ls)]
                assert int(row["o"]) == o
                assert abs(row["pmi"] - pmi) < 1e-5
