"""Round-10b: streaming micro-batch ingest + epoch compaction for the
persisted ANN index.

`ann_index_append`'s docstring has claimed "a micro-batch sink can
call it per epoch" since round 9 — here that claim is wired for real:
a file stream (maxFilesPerTrigger=1, availableNow) drives a
foreachBatch sink that appends each micro-batch into the index, one
committed epoch per batch. Afterward the full-probe query must equal
brute force over everything ingested — rows lost between batches,
stats drift, or a partially visible epoch would all break it.

Per-batch epochs are also the small-files problem at scale (10k
micro-batches = 10k epoch dirs under every hot list), which is what
`ann_index_compact` exists for: rewrite the committed rows into one
fresh epoch, raise min_epoch in the same atomic manifest flip, GC the
superseded dirs. The crash test kills compaction AT the commit point
and checks both invariants: before the flip readers see the exact
pre-compaction view; after a crashed GC (compacted copy committed,
stale epochs still on disk) the min_epoch bound keeps the stale rows
invisible instead of double-counted.
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


def _top(spark, path, qvec, n_probe=8):
    return [
        tuple(r)
        for r in AI.ann_index_query(
            spark, path, qvec, k=10, n_probe=n_probe
        ).collect()
    ]


def _epoch_dirs(path):
    out = {}
    corpus = f"{path}/corpus"
    for d in sorted(os.listdir(corpus)):
        if d.startswith("list_id="):
            out[d] = sorted(
                ed for ed in os.listdir(f"{corpus}/{d}") if ed.startswith("epoch=")
            )
    return out


@pytest.fixture()
def streamed_index(spark, tmp_path, qvec):
    """Index seeded from vec_id % 4 == 0, then the other three
    quarters ingested as three file-per-trigger micro-batches through
    a foreachBatch sink."""
    e = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "sidx")
    AI.ann_index_write(
        e.filter(F.col("vec_id") % 4 == 0), path, mode="ivf", n_lists=8
    )
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    for i in (1, 2, 3):
        e.filter(F.col("vec_id") % 4 == i).coalesce(1).write.parquet(
            f"{src}/batch_{i}"
        )
    # one directory per file-batch keeps the per-trigger grouping
    # deterministic; the RESULT is batching-invariant anyway (appends
    # commute under the full-probe query)
    schema = e.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/batch_*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _bid: AI.ann_index_append(batch_df, path)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return path


class TestStreamingIngest:
    def test_microbatch_ingest_is_exact(self, spark, streamed_index, qvec):
        path = streamed_index
        e = load_table(spark, SF, "embeddings")
        man = AI.read_manifest(path)
        n_all = e.filter(F.col("embedding").isNotNull()).count()
        assert man["epoch"] == 3  # one committed epoch per micro-batch
        assert man["total_rows"] == n_all
        exact = [
            tuple(r)
            for r in S.knn_bruteforce(
                e.filter(F.col("embedding").isNotNull()), qvec, 10
            ).collect()
        ]
        assert _top(spark, path, qvec) == exact

    def test_compaction_preserves_view_and_gcs_epochs(
        self, spark, streamed_index, qvec
    ):
        path = streamed_index
        before = _top(spark, path, qvec)
        before_stats = AI._read_stats(spark, path)
        res = AI.ann_index_compact(spark, path)
        man = AI.read_manifest(path)
        assert man["epoch"] == man["min_epoch"] == 4
        assert res["gc_epoch_dirs"] > 0
        # one epoch level left under every list
        for d, eds in _epoch_dirs(path).items():
            assert eds == ["epoch=4"], (d, eds)
        assert _top(spark, path, qvec) == before
        assert AI._read_stats(spark, path) == before_stats
        # appends keep working after compaction, and carry min_epoch
        extra = spark.createDataFrame(
            [(999_001, [0.5] * 64)], "vec_id long, embedding array<double>"
        )
        AI.ann_index_append(extra, path)
        man2 = AI.read_manifest(path)
        assert man2["epoch"] == 5 and man2["min_epoch"] == 4

    def test_compaction_crash_at_commit_is_invisible(
        self, spark, streamed_index, qvec, monkeypatch
    ):
        path = streamed_index
        before = _top(spark, path, qvec)
        before_man = AI.read_manifest(path)

        def boom(path_, man_):
            raise RuntimeError("kill -9 at compaction commit")

        monkeypatch.setattr(AI, "_commit_manifest", boom)
        with pytest.raises(RuntimeError, match="compaction commit"):
            AI.ann_index_compact(spark, path)
        # the compacted copy is on disk (epoch=4) but uncommitted:
        # readers see the exact old view, no double counting
        assert AI.read_manifest(path) == before_man
        assert _top(spark, path, qvec) == before

    def test_crashed_gc_leaves_no_double_counting(
        self, spark, streamed_index, qvec, monkeypatch
    ):
        """Kill AFTER the commit flip but before GC: both the old
        epochs and the compacted copy are on disk, and only the
        min_epoch bound keeps the result exact."""
        path = streamed_index
        before = _top(spark, path, qvec)

        real = AI._commit_manifest

        def commit_then_die(path_, man_):
            real(path_, man_)
            raise RuntimeError("kill -9 after commit, before GC")

        monkeypatch.setattr(AI, "_commit_manifest", commit_then_die)
        with pytest.raises(RuntimeError, match="before GC"):
            AI.ann_index_compact(spark, path)
        # stale epochs 0..3 still on disk alongside epoch=4
        assert any(
            len(eds) > 1 for eds in _epoch_dirs(path).values()
        ), "test setup: stale epochs should still exist"
        man = AI.read_manifest(path)
        assert man["epoch"] == man["min_epoch"] == 4
        assert _top(spark, path, qvec) == before  # not doubled
        # retrying compaction heals: GC collects the stale dirs
        monkeypatch.setattr(AI, "_commit_manifest", real)
        AI.ann_index_compact(spark, path)
        for d, eds in _epoch_dirs(path).items():
            assert eds == ["epoch=5"], (d, eds)
        assert _top(spark, path, qvec) == before
