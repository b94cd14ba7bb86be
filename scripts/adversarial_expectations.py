"""Documented-refusal expectations for the adversarial sweep.

EXPECTED[variant][entry_name] = regex that the raised error must match
for the row to classify as `xfail` (a CORRECT loud refusal) instead of
FAIL. Every entry here is a deliberate contract: the operator's
documented preconditions exclude this degenerate input, and it refuses
loudly rather than returning garbage. Keep this list SHORT — a refusal
is only correct when the operation is genuinely undefined on the
input, not merely inconvenient.

Current contracts:
- PQ (product quantization) requires ≥ k=16 non-NULL vectors per
  subspace to seed its codebooks (operators/similarity.py pq_build).
  All six variants have ≤ 12 vectors, so the PQ-backed entries refuse
  on every variant.
- IVF / k-means require ≥ 1 non-NULL vector (training on nothing is
  undefined); they refuse on the empty and all-NULL corpora only.
"""

from __future__ import annotations

_PQ = "corpus has fewer than k=16 vectors|no non-NULL vectors"
_KM = "no non-NULL vectors"

EXPECTED: dict[str, dict[str, str]] = {
    "empty": {
        "j_ivf_knn": _KM,
        "j_ivf_recall_curve": _KM,
        "j_kmeans_purity": _KM,
        "j_ann_index_query": _KM,
        "j_ann_index_append": _KM,
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "single": {
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "allnull": {
        "j_ivf_knn": _KM,
        "j_ivf_recall_curve": _KM,
        "j_kmeans_purity": _KM,
        "j_ann_index_query": _KM,
        "j_ann_index_append": _KM,
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "zerovar": {
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "unicode": {
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "dupkeys": {
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "nullts": {
        # embeddings reuse the 12-vector zerovar shapes: below PQ's k=16
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "extremes": {
        # 12 vectors by design: below PQ's k=16 seeding contract
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
    "geoskew": {
        # 3600 events share one derived point (1.8× GEO_DENSITY_HOT_CAP).
        # Rounds 8-10: geo_density_core refused loudly here. Round 11:
        # it DEGRADES instead (cell-level count-based estimate for
        # hot-ring points, exact elsewhere, n_approx_pts/degraded in
        # the result) and must be green against its mirrored oracle —
        # no xfail entry anymore.
        # embeddings reuse the 12-vector zerovar shapes: below PQ's k=16
        "j_ivf_pq": _PQ,
        "j_pq_adc": _PQ,
        "j_pq_index_query": _PQ,
    },
}
