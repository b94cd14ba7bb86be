"""Independent-derivation sweep, part 26: embedding utilities
(norms, per-dim z-scores, int8 quantization, label centroids,
nearest-centroid confusion).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.test_indep_stats_r5 import SF, run
from tests.test_indep_ml_r5 import q_micro


def half_up(x: float) -> int:
    return int(Decimal(repr(float(x))).to_integral_value(ROUND_HALF_UP))


@pytest.fixture(scope="module")
def emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def V(emb):
    return np.array([np.array(v, dtype=float) for v in emb.embedding])


class TestNorms:
    def test_per_label_mean_l2(self, spark, emb, V):
        got = run(spark, "j_embedding_norms").set_index("label")
        norms = np.linalg.norm(V, axis=1)
        df = pd.DataFrame({"label": emb.label, "n": norms})
        for lab, grp in df.groupby("label"):
            row = got.loc[lab]
            assert int(row["n"]) == len(grp)
            assert abs(row["avg_norm"] - grp.n.mean()) < 1e-5


class TestZscore:
    def test_per_dim_standardization(self, spark, emb):
        got = run(spark, "j_embedding_zscore").set_index("label")
        Q = np.array([[q_micro(x) for x in v] for v in emb.embedding], dtype=np.int64)
        n = len(Q)
        agg = {}
        for d in range(Q.shape[1]):
            col = Q[:, d].astype(object)
            s1 = int(col.sum())
            s2 = int((col * col).sum())
            mu = s1 / n
            sd = (s2 / n - mu * mu) ** 0.5
            for i in range(n):
                z = half_up((int(Q[i, d]) - mu) / sd * 1000)
                lab = emb.label.iloc[i]
                e = agg.setdefault(lab, [0, 0, 0, 0])
                e[0] += 1
                e[1] += z
                e[2] += abs(z)
                e[3] = max(e[3], abs(z))
        for lab, (nv, sz, saz, mz) in agg.items():
            row = got.loc[lab]
            assert int(row["n_values"]) == nv
            assert int(row["sum_z_milli"]) == sz
            assert int(row["sum_abs_z_milli"]) == saz
            assert int(row["max_abs_z_milli"]) == mz
        # standardization identity: z sums to ~0 across ALL labels
        assert abs(sum(v[1] for v in agg.values())) <= len(emb) * 64  # rounding slack


class TestQuantize:
    def test_affine_int8_codes(self, spark, emb, V):
        got = run(spark, "j_embedding_quantize").set_index("pos")
        for d in range(V.shape[1]):
            col = V[:, d]
            mn, mx = col.min(), col.max()
            if mx == mn:
                codes = np.zeros(len(col), dtype=int)
            else:
                codes = np.array([half_up((v - mn) / (mx - mn) * 255) for v in col])
            row = got.loc[d + 1]
            assert int(row["n"]) == len(col)
            assert int(row["code_min"]) == codes.min() == 0
            assert int(row["code_max"]) == codes.max() == 255
            assert int(row["code_sum"]) == int(codes.sum())


class TestCentroids:
    def test_label_centroids(self, spark, emb, V):
        got = run(spark, "j_label_centroids").set_index("label")
        for lab in sorted(set(emb.label)):
            mask = (emb.label == lab).to_numpy()
            cent = V[mask].mean(axis=0)
            want = "|".join(str(half_up(round(x, 6) * 1_000_000)) for x in cent)
            # rounding on the mean then scaling can differ by 1 in the
            # last unit from half_up(x*1e6) when the mean sits on a
            # 5e-7 boundary; compare element-wise with tolerance 1
            gotv = [int(t) for t in got.loc[lab, "centroid_u"].split("|")]
            wantv = [half_up(x * 1_000_000) for x in cent]
            assert len(gotv) == len(wantv) == V.shape[1]
            assert all(abs(a - b) <= 1 for a, b in zip(gotv, wantv))

    def test_nearest_centroid_confusion(self, spark, emb, V):
        got = run(spark, "j_nearest_centroid").set_index(["label", "pred_label"])
        labels = sorted(set(emb.label))
        cents = {}
        for lab in labels:
            mask = (emb.label == lab).to_numpy()
            cents[lab] = np.round(V[mask].mean(axis=0), 6)
        conf = {}
        for i in range(len(V)):
            x = V[i]
            best = None
            for lab in labels:
                c = cents[lab]
                sim = round(float(x @ c / (np.linalg.norm(x) * np.linalg.norm(c))), 6)
                if best is None or sim > best[0] or (sim == best[0] and lab < best[1]):
                    best = (sim, lab)
            key = (emb.label.iloc[i], best[1])
            conf[key] = conf.get(key, 0) + 1
        assert len(got) == len(conf)
        for key, n in conf.items():
            assert int(got.loc[key, "n"]) == n
        # diagonal above the random floor (the j_kmeans_purity bound;
        # these labels are weakly separable — 37% self-assignment vs a
        # ~10% random floor, not majority)
        diag = sum(n for (a, b), n in conf.items() if a == b)
        assert diag * len(labels) > len(V)
