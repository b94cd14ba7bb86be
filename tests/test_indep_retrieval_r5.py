"""Independent-derivation sweep, part 30: retrieval-stack ops
(filtered kNN strategies, batched kNN, RRF hybrid fusion, hard-negative
mining, MMR re-ranking — the greedy loop re-run in pure python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run, trunc_div
from tests.test_indep_ml_r5 import q_micro


@pytest.fixture(scope="module")
def emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def Q(emb):
    return [[q_micro(x) for x in v] for v in emb.embedding]


def int_dot(a, b):
    return trunc_div(sum(x * y for x, y in zip(a, b)), 1_000_000)


class TestFilteredKnn:
    def test_pre_vs_post_strategies(self, spark, emb, Q):
        got = run(spark, "j_filtered_knn").iloc[0]
        qv = Q[list(emb.vec_id).index(0)]
        t_label = emb.label[emb.vec_id == 0].iloc[0]
        rel = [
            (int_dot(Q[i], qv), vid, lab)
            for i, (vid, lab) in enumerate(zip(emb.vec_id, emb.label))
            if vid != 0
        ]
        rel.sort(key=lambda t: (-t[0], t[1]))
        pre = [vid for d, vid, lab in rel if lab == t_label][:5]
        pool = rel[:20]
        post = [vid for d, vid, lab in pool if lab == t_label][:5]
        overlap = len(set(pre) & set(post))
        assert int(got["n_pre"]) == len(pre) == 5
        assert int(got["n_post"]) == len(post)
        assert int(got["n_overlap"]) == overlap
        assert int(got["recall_ppm"]) == overlap * 1_000_000 // 5
        # post-filter can only lose results, never gain
        assert len(post) <= len(pre)


class TestBatchKnn:
    def test_ten_queries_top3(self, spark, emb):
        got = run(spark, "j_batch_knn").set_index(["qid", "vec_id"])
        V = np.array([np.array(v, dtype=float) for v in emb.embedding])
        ids = emb.vec_id.to_numpy()
        norms = np.linalg.norm(V, axis=1)
        n_rows = 0
        for qi in range(len(ids)):
            if ids[qi] >= 10:
                continue
            sims = []
            for ci in range(len(ids)):
                if ids[ci] == ids[qi]:
                    continue
                s = round(float(V[ci] @ V[qi] / (norms[ci] * norms[qi])), 4)
                sims.append((-s, ids[ci], s))
            sims.sort()
            for _, vid, s in sims[:3]:
                row = got.loc[(ids[qi], vid)]
                assert abs(row["sim"] - s) < 1e-9
                n_rows += 1
        assert n_rows == len(got) == 30


class TestHybridSearch:
    def test_rrf_fusion(self, spark, emb):
        got = run(spark, "j_hybrid_search")
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        lex = []
        for did, txt in zip(docs.doc_id, docs.text):
            s = sum(1 for t in txt.split(" ") if t in ("spark", "join"))
            if s > 0:
                lex.append((-s, did))
        lex.sort()
        rl = {did: i + 1 for i, (_, did) in enumerate(lex)}
        V = np.array([np.array(v, dtype=float) for v in emb.embedding])
        ids = emb.vec_id.to_numpy()
        qv = V[list(ids).index(0)]
        sims = [
            (-round(float(V[i] @ qv / (np.linalg.norm(V[i]) * np.linalg.norm(qv))), 6), ids[i])
            for i in range(len(ids))
        ]
        sims.sort()
        rv = {vid: i + 1 for i, (_, vid) in enumerate(sims)}
        fused = [
            (
                vid,
                rl.get(vid),
                rv[vid],
                round((1.0 / (60 + rl[vid]) if vid in rl else 0.0) + 1.0 / (60 + rv[vid]), 6),
            )
            for vid in rv
        ]
        fused.sort(key=lambda t: (-t[3], t[0]))
        want = fused[:10]
        assert len(got) == 10
        for (_, g), (vid, l, v, rrf) in zip(got.iterrows(), want):
            assert int(g["doc_id"]) == vid
            assert (pd.isna(g["rl"]) and l is None) or int(g["rl"]) == l
            assert int(g["rv"]) == v
            assert abs(g["rrf"] - rrf) < 1e-6


class TestHardNegatives:
    def test_nearest_other_label(self, spark, emb, Q):
        got = run(spark, "j_hard_negative_mining").set_index("a_id")
        ids = list(emb.vec_id)
        labels = list(emb.label)
        for ai, aid in enumerate(ids):
            if aid >= 10:
                continue
            best = None
            for ci, cid in enumerate(ids):
                if cid == aid or labels[ci] == labels[ai]:
                    continue
                d = int_dot(Q[ci], Q[ai])
                key = (-d, cid)
                if best is None or key < best[0]:
                    best = (key, cid, labels[ci], d)
            row = got.loc[aid]
            assert int(row["hard_negative"]) == best[1]
            assert int(row["neg_label"]) == best[2]
            assert int(row["dot_micro"]) == best[3]
            assert int(row["neg_label"]) != int(row["a_label"])


class TestMmr:
    def test_greedy_diversity_loop(self, spark, emb, Q):
        got = run(spark, "j_mmr_rerank").set_index("pick")
        ids = list(emb.vec_id)
        qv = Q[ids.index(0)]
        rel = sorted(
            ((int_dot(Q[i], qv), vid) for i, vid in enumerate(ids) if vid != 0),
            key=lambda t: (-t[0], t[1]),
        )[:12]
        cand = {vid: d for d, vid in rel}
        idx = {vid: ids.index(vid) for vid in cand}
        sims = {
            (a, b): int_dot(Q[idx[a]], Q[idx[b]])
            for a in cand
            for b in cand
            if a != b
        }
        picked = []
        remaining = [vid for _, vid in rel]
        for pick in range(1, 6):
            best = None
            for v in remaining:
                score = 7 * cand[v] - (
                    3 * max(sims[(v, p)] for p in picked) if picked else 0
                )
                key = (-score, v)
                if best is None or key < best[0]:
                    best = (key, v, score)
            _, v, score = best
            row = got.loc[pick]
            assert int(row["vec_id"]) == v
            assert int(row["rel"]) == cand[v]
            assert int(row["score"]) == score
            picked.append(v)
            remaining.remove(v)
