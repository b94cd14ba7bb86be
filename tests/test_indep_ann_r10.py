"""Independent derivation for the persisted-index family (round-10,
verdict item 5).

The round-9 entries (j_ann_index_query / j_pq_index_query /
j_ann_index_append) carry behavioral pins (probed-dirs assertion,
recall vs exact) but — unlike every other family — no from-raw-parquet
pure-python rederivation. Closed here: the index artifacts are read
back with *pyarrow only* (no Spark, no engine code on the replay
side), the probe ranking / auto-widen schedule / ADC scoring are
replayed in textbook Python, and the engine's query output must match
the replay exactly. A defect shared by the engine's write and query
paths (e.g. an assignment bug that both sides reproduce) cannot hide:
the replay consumes only the PERSISTED bytes plus the raw fixture.
"""

from __future__ import annotations

import json
import math
import os
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import ann_index as AI

SF = "/root/testdata/sf0.001"


def round4(x: float) -> float:
    # Spark F.round is HALF_UP on the decimal string, not banker's
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    )


def cos(a, b) -> float:
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return num / den if den else 0.0


def fixture_vectors() -> dict[int, list[float]]:
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    return {
        int(i): [float(x) for x in v]
        for i, v in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
        if v is not None
    }


def read_index(path: str):
    """Replay-side reader: manifest JSON + pyarrow over the parquet
    artifacts. Partition values are parsed from the directory names —
    the replay must not trust any engine reader."""
    with open(f"{path}/_MANIFEST") as f:
        man = json.load(f)
    stats = {}
    st = pq.read_table(f"{path}/{man['stats_dir']}")
    for lid, n in zip(st.column("list_id").to_pylist(), st.column("n_rows").to_pylist()):
        stats[int(lid)] = int(n)
    cents = {}
    if os.path.isdir(f"{path}/centroids"):
        ct = pq.read_table(f"{path}/centroids")
        for lid, c in zip(ct.column("list_id").to_pylist(), ct.column("centroid").to_pylist()):
            cents[int(lid)] = [float(x) for x in c]
    corpus: dict[int, list[tuple[int, list[float]]]] = {}
    cdir = f"{path}/corpus"
    for d in sorted(os.listdir(cdir)):
        if not d.startswith("list_id="):
            continue
        lid = int(d.split("=", 1)[1])
        for ed in sorted(os.listdir(f"{cdir}/{d}")):
            if not ed.startswith("epoch="):
                continue
            if int(ed.split("=", 1)[1]) > int(man["epoch"]):
                continue  # uncommitted epoch: invisible by contract
            t = pq.read_table(f"{cdir}/{d}/{ed}")
            for i, v in zip(
                t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
            ):
                corpus.setdefault(lid, []).append(
                    (int(i), [float(x) for x in v])
                )
    return man, stats, cents, corpus


def replay_ivf_query(path: str, qv: list[float], k: int = 10, n_probe=None):
    """Pure-python mirror of ann_index_query's documented contract:
    centroid ranking, auto-widen (cum rows ≥ 4k and ≥ 4 probes), exact
    cosine inside probed lists, round4 + id tie-break."""
    man, stats, cents, corpus = read_index(path)
    ranked = sorted(cents, key=lambda lid: (-cos(cents[lid], qv), lid))
    present = [lid for lid in ranked if lid in stats]
    if n_probe is None:
        probes, cum = [], 0
        for p in present:
            if cum >= 4 * k and len(probes) >= 4:
                break
            probes.append(p)
            cum += stats[p]
    else:
        probes = present[:n_probe]
    scored = [
        (vid, round4(cos(v, qv)))
        for p in probes
        for vid, v in corpus.get(p, [])
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


@pytest.fixture(scope="module")
def qvec(spark):
    e = load_table(spark, SF, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").head()
    return [float(x) for x in row["embedding"]]


class TestIvfIndexReplay:
    def test_query_matches_pure_python(self, spark, tmp_path_factory, qvec):
        path = str(tmp_path_factory.mktemp("indep") / "ivf")
        e = load_table(spark, SF, "embeddings")
        AI.ann_index_write(e, path, mode="ivf", n_lists=8)
        got = [
            (int(r["vec_id"]), float(r["sim"]))
            for r in AI.ann_index_query(spark, path, qvec, k=10).collect()
        ]
        assert got == replay_ivf_query(path, qvec, k=10)

    def test_append_then_full_probe_is_bruteforce(
        self, spark, tmp_path_factory, qvec
    ):
        path = str(tmp_path_factory.mktemp("indep") / "app")
        e = load_table(spark, SF, "embeddings")
        AI.ann_index_write(
            e.filter(F.col("vec_id") % 2 == 0), path, mode="ivf", n_lists=4
        )
        AI.ann_index_append(e.filter(F.col("vec_id") % 2 == 1), path)
        got = [
            (int(r["vec_id"]), float(r["sim"]))
            for r in AI.ann_index_query(spark, path, qvec, k=10, n_probe=4).collect()
        ]
        # replay 1: from the persisted artifacts
        assert got == replay_ivf_query(path, qvec, k=10, n_probe=4)
        # replay 2: from the RAW fixture — full probe == brute force,
        # so no row may be lost or duplicated by write+append
        vecs = fixture_vectors()
        brute = sorted(
            ((vid, round4(cos(v, qvec))) for vid, v in vecs.items()),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        assert got == brute
        # and the committed corpus is exactly the fixture row set
        _, stats, _, corpus = read_index(path)
        all_ids = sorted(vid for rows in corpus.values() for vid, _ in rows)
        assert all_ids == sorted(vecs)
        assert sum(stats.values()) == len(vecs)


class TestPqIndexReplay:
    def test_query_matches_pure_python_adc(self, spark, tmp_path_factory, qvec):
        path = str(tmp_path_factory.mktemp("indep") / "pq")
        e = load_table(spark, SF, "embeddings")
        AI.pq_index_write(e, path, m=8, n_codes=16)
        got = [
            (int(r["vec_id"]), float(r["d2"]))
            for r in AI.pq_index_query(spark, path, qvec, k=10, shortlist=50).collect()
        ]
        # replay ADC from the persisted codes + codebook (pyarrow only)
        m = int(pq.read_table(f"{path}/meta").column("m")[0].as_py())
        bk = pq.read_table(f"{path}/codebook")
        book = {
            (int(s), int(c)): [float(x) for x in v]
            for s, c, v in zip(
                bk.column("sub").to_pylist(),
                bk.column("code").to_pylist(),
                bk.column("cent").to_pylist(),
            )
        }
        sub_len = len(qvec) // m
        dtab = {
            (s, c): round(
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(qvec[s * sub_len : (s + 1) * sub_len], cent)
                ),
                6,
            )
            for (s, c), cent in book.items()
        }
        codes = pq.read_table(f"{path}/codes")
        adc: dict[int, float] = {}
        for i, s, c in zip(
            codes.column("id").to_pylist(),
            codes.column("sub").to_pylist(),
            codes.column("code").to_pylist(),
        ):
            adc[int(i)] = adc.get(int(i), 0.0) + dtab[(int(s), int(c))]
        shortlist = [
            i
            for i, _ in sorted(
                ((i, round4(d)) for i, d in adc.items()),
                key=lambda t: (t[1], t[0]),
            )[:50]
        ]
        corpus = pq.read_table(f"{path}/corpus")
        vec_of = {
            int(i): [float(x) for x in v]
            for i, v in zip(
                corpus.column("vec_id").to_pylist(),
                corpus.column("embedding").to_pylist(),
            )
        }
        rerank = sorted(
            (
                (
                    i,
                    round4(
                        sum((a - b) * (a - b) for a, b in zip(vec_of[i], qvec))
                    ),
                )
                for i in shortlist
            ),
            key=lambda t: (t[1], t[0]),
        )[:10]
        assert got == rerank
