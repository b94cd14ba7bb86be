"""Round-9: persisted ANN index (build once / query many) pins.

What is verified, beyond the registry gates:
  * the query path reads ONLY files under the probed list_id=
    directories (df.inputFiles — the listing-level pruning claim);
  * ann_index_query matches the one-shot ivf_knn result semantics
    (exact cosine ranking inside the probed lists);
  * pq_index_query reproduces the one-shot pq_adc_knn top-k exactly
    (same seeds, same Lloyd rounds, training persisted vs inline);
  * the corpus re-rank in pq_index_query carries an isin pushed
    filter (no full float scan in the query path);
  * build_once really builds at most once (mtime pin).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import ann_index as AI
from parking_violations_data_pipeline_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ivf_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "ivf")
    e = load_table(spark, SF, "embeddings")
    stats = AI.ann_index_write(e, path, mode="ivf", n_lists=16)
    return path, stats


@pytest.fixture(scope="module")
def qvec(spark):
    e = load_table(spark, SF, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").head()
    return [float(x) for x in row["embedding"]]


class TestIvfIndex:
    def test_layout(self, spark, ivf_index):
        path, stats = ivf_index
        assert stats["mode"] == "ivf" and stats["n_lists"] == 16
        assert os.path.exists(f"{path}/meta/_SUCCESS")
        # round-10 layout: stats live in a manifest-versioned dir and
        # the atomic _MANIFEST commit is the index's existence marker
        man = AI.read_manifest(path)
        assert man is not None and man["epoch"] == 0
        assert man["total_rows"] == 500
        cents = spark.read.parquet(f"{path}/centroids")
        assert cents.count() == 16
        assert sum(AI._read_stats(spark, path).values()) == 500

    def test_query_recall_vs_exact(self, spark, ivf_index, qvec):
        path, _ = ivf_index
        e = load_table(spark, SF, "embeddings")
        got = {r["vec_id"] for r in AI.ann_index_query(spark, path, qvec, k=10).collect()}
        exact = {r["vec_id"] for r in S.knn_bruteforce(e, qvec, 10).collect()}
        assert len(got & exact) >= 7  # the registry invariant bound

    def test_query_reads_only_probed_dirs(self, spark, ivf_index, qvec):
        path, _ = ivf_index
        # pin n_probe so the probed set is known
        cents = spark.read.parquet(f"{path}/centroids").collect()

        def cos(a, b):
            import math
            num = sum(x * y for x, y in zip(a, b))
            den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
            return num / den if den else 0.0

        ranked = sorted(
            cents, key=lambda r: (-cos([float(x) for x in r["centroid"]], qvec), r["list_id"])
        )
        present = set(AI._read_stats(spark, path))
        probes = [int(r["list_id"]) for r in ranked if r["list_id"] in present][:4]
        df = AI.ann_index_query(spark, path, qvec, k=10, n_probe=4)
        files = df.inputFiles()
        assert files, "query plan lists no input files"
        allowed = tuple(f"list_id={p}/" for p in probes)
        for f in files:
            assert any(a in f for a in allowed), f"scan touches unprobed file {f}"
        # and the listing is a strict subset of the index's directories
        total_dirs = {
            d for d in os.listdir(f"{path}/corpus") if d.startswith("list_id=")
        }
        assert len(allowed) < len(total_dirs)

    def test_query_matches_probed_bruteforce(self, spark, ivf_index, qvec):
        """Inside the probed lists the ranking is exact cosine — so the
        index query must equal brute force restricted to those lists."""
        path, _ = ivf_index
        df = AI.ann_index_query(spark, path, qvec, k=10, n_probe=16)
        # probing every list == exact brute force over non-null vectors
        e = load_table(spark, SF, "embeddings")
        exact = S.knn_bruteforce(e.filter(F.col("embedding").isNotNull()), qvec, 10)
        assert [tuple(r) for r in df.collect()] == [tuple(r) for r in exact.collect()]

    def test_build_once_is_once(self, spark, tmp_path):
        path = str(tmp_path / "once")
        e = load_table(spark, SF, "embeddings")
        AI.build_once(path, lambda: AI.ann_index_write(e, path, mode="ivf", n_lists=4))
        marker = f"{path}/meta/_SUCCESS"
        mtime = os.path.getmtime(marker)
        AI.build_once(path, lambda: AI.ann_index_write(e, path, mode="ivf", n_lists=4))
        assert os.path.getmtime(marker) == mtime

    def test_lsh_mode_roundtrip(self, spark, tmp_path, qvec):
        path = str(tmp_path / "lsh")
        e = load_table(spark, SF, "embeddings")
        stats = AI.ann_index_write(e, path, mode="lsh", n_lists=8)
        assert stats["n_lists"] == 8  # 2^3 planes
        got = AI.ann_index_query(spark, path, qvec, k=10).collect()
        assert 1 <= len(got) <= 10
        # auto-widen covers k even on a thin probe schedule
        assert len(got) == 10


class TestPqIndex:
    def test_matches_oneshot_pq(self, spark, tmp_path, qvec):
        path = str(tmp_path / "pq")
        e = load_table(spark, SF, "embeddings")
        AI.pq_index_write(e, path, m=8, n_codes=16)
        idx = AI.pq_index_query(spark, path, qvec, k=10, shortlist=100).collect()
        oneshot = S.pq_adc_knn(e, qvec, k=10, m=8, n_codes=16, shortlist=100).collect()
        assert [tuple(r) for r in idx] == [tuple(r) for r in oneshot]

    def test_rerank_has_pushed_isin(self, spark, tmp_path, qvec):
        path = str(tmp_path / "pq2")
        e = load_table(spark, SF, "embeddings")
        AI.pq_index_write(e, path, m=8, n_codes=16)
        df = AI.pq_index_query(spark, path, qvec, k=10, shortlist=50)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [In(vec_id" in plan, plan[:2000]
