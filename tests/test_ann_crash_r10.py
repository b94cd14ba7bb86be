"""Round-10: ANN index crash consistency + list-count rule pins.

The round-9 verdict flagged `ann_index_append`'s stats-after-corpus
ordering: a crash between the two writes stranded stale stats. The
round-10 design commits every transition through an atomic _MANIFEST
(epoch-partitioned corpus + versioned stats dirs); these tests kill
the append at the commit point and verify readers stay on the exact
pre-append snapshot, then that a retry heals with no duplicates.

Also pinned here: the IVF list-count rule (n_lists ≤ max(64, 4·√n) —
the O(n_lists) driver-side metadata reads are only safe at ~√n lists),
the zero-norm/NULL drop at write and append time (directionless
vectors used to fall to an unreachable list_id=-1), and the LSH-mode
stats-read pruning to the bounded probe candidate set.
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
def qvec(spark):
    e = load_table(spark, SF, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").head()
    return [float(x) for x in row["embedding"]]


def _top(spark, path, qvec):
    # n_probe=8 == every list -> exact brute force over the committed
    # corpus; any leaked/lost row changes this list
    return [
        tuple(r)
        for r in AI.ann_index_query(spark, path, qvec, k=10, n_probe=8).collect()
    ]


class TestCrashConsistency:
    def test_kill_at_commit_point_then_retry(
        self, spark, tmp_path, qvec, monkeypatch
    ):
        e = load_table(spark, SF, "embeddings")
        path = str(tmp_path / "idx")
        AI.ann_index_write(
            e.filter(F.col("vec_id") % 2 == 0), path, mode="ivf", n_lists=8
        )
        before_top = _top(spark, path, qvec)
        before_man = AI.read_manifest(path)
        before_stats = AI._read_stats(spark, path)

        # kill the append right before the manifest swing: the corpus
        # epoch=1 dirs and lists_v1 exist on disk but are uncommitted
        real_commit = AI._commit_manifest

        def boom(path_, man_):
            raise RuntimeError("kill -9 between stats write and commit")

        monkeypatch.setattr(AI, "_commit_manifest", boom)
        with pytest.raises(RuntimeError, match="kill -9"):
            AI.ann_index_append(e.filter(F.col("vec_id") % 2 == 1), path)

        # readers are on the exact pre-append snapshot: same manifest,
        # same stats, same query result — the uncommitted epoch=1 rows
        # are pruned by the partition filter, not merely unlikely
        assert AI.read_manifest(path) == before_man
        assert AI._read_stats(spark, path) == before_stats
        assert _top(spark, path, qvec) == before_top
        # ... even though orphan files really are on disk
        orphans = [
            d
            for d in os.listdir(f"{path}/corpus")
            if os.path.isdir(f"{path}/corpus/{d}/epoch=1")
        ]
        assert orphans, "test setup: the kill must leave orphan epoch dirs"

        # retry with the real commit: orphans are cleared first, so the
        # full corpus is exact with NO duplicates
        monkeypatch.setattr(AI, "_commit_manifest", real_commit)
        res = AI.ann_index_append(e.filter(F.col("vec_id") % 2 == 1), path)
        man = AI.read_manifest(path)
        assert man["epoch"] == 1 and man["stats_dir"] == "lists_v1"
        n_all = e.filter(F.col("embedding").isNotNull()).count()
        assert man["total_rows"] == n_all
        assert res["appended_rows"] == n_all - before_man["total_rows"]
        exact = [
            tuple(r)
            for r in S.knn_bruteforce(
                e.filter(F.col("embedding").isNotNull()), qvec, 10
            ).collect()
        ]
        assert _top(spark, path, qvec) == exact

    def test_append_requires_manifest(self, spark, tmp_path):
        e = load_table(spark, SF, "embeddings")
        path = str(tmp_path / "legacy")
        AI.ann_index_write(e, path, mode="ivf", n_lists=4)
        os.remove(f"{path}/_MANIFEST")  # simulate a round-9 layout
        with pytest.raises(ValueError, match="no _MANIFEST"):
            AI.ann_index_append(e.limit(5), path)


class TestListCountRule:
    def test_ivf_guard_trips(self, spark, tmp_path):
        e = load_table(spark, SF, "embeddings")  # 500 rows -> cap 89? max(64,4*22)=88
        with pytest.raises(ValueError, match="list-count rule"):
            AI.ann_index_write(
                e, str(tmp_path / "big"), mode="ivf", n_lists=200
            )

    def test_lsh_unbounded_allowed_and_stats_pruned(self, spark, tmp_path, qvec):
        path = str(tmp_path / "lsh")
        e = load_table(spark, SF, "embeddings")
        AI.ann_index_write(e, path, mode="lsh", n_lists=256)  # > 4*sqrt(500)
        got = AI.ann_index_query(spark, path, qvec, k=10).collect()
        assert len(got) == 10
        # the stats read never materializes non-candidate lists
        stats = AI._read_stats(spark, path, candidates=[0, 1, 2])
        assert set(stats) <= {0, 1, 2}


class TestDirectionlessDrop:
    def test_zero_norm_and_null_dropped(self, spark, tmp_path):
        path = str(tmp_path / "zn")
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.0, 0.0]),  # zero norm: no direction
            (4, None),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        AI.ann_index_write(df, path, mode="ivf", n_lists=2)
        man = AI.read_manifest(path)
        assert man["total_rows"] == 2
        # no unreachable list_id=-1 directory exists
        assert not os.path.isdir(f"{path}/corpus/list_id=-1")
        got = AI.ann_index_query(spark, path, [1.0, 0.0], k=10, n_probe=2)
        assert {r["vec_id"] for r in got.collect()} == {1, 2}
        # append drops them too
        df2 = spark.createDataFrame(
            [(5, [1.0, 1.0]), (6, [0.0, 0.0]), (7, None)],
            "vec_id long, embedding array<double>",
        )
        res = AI.ann_index_append(df2, path)
        assert res["appended_rows"] == 1
        assert AI.read_manifest(path)["total_rows"] == 3
        assert not os.path.isdir(f"{path}/corpus/list_id=-1")
