"""Round-11 verdict item 2: streaming-sink crash consistency, held to
the same standard as the persisted ANN index's manifest commits.

Three kill scenarios over the two production sink shapes:

  * parquet file sink — restart after a partial drain, with an ORPHAN
    part file injected into the output directory (exactly what a task
    killed after writing but before the file-sink transaction-log
    commit leaves behind). The re-read must equal the batch answer:
    the `_spark_metadata` log, not the directory listing, defines the
    table, so the orphan bytes on disk are invisible.
  * foreachBatch — the handler CRASHES mid-batch on its first attempt
    at batch 1, after its write already landed (the classic window:
    sink output durable, checkpoint commit missing). On restart Spark
    replays batch 1 under the same batch_id; the round-11 idempotent
    handler (overwrite `batch_id={id}`'s own directory) makes that
    replay a no-op and the final fold exact.
  * negative control — the SAME crash with the pre-round-11 blind
    `mode("append")` handler double-counts the replayed batch. This
    pins that the kill window is real and that idempotent-per-batch_id
    writes are what close it (i.e. the test can detect the bug it
    guards against).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """events split into 3 source files so availableNow +
    maxFilesPerTrigger=1 yields 3 deterministic micro-batches."""
    root = tmp_path_factory.mktemp("streamcrash")
    src = str(root / "src")
    e = load_table(spark, SF, "events").select(
        "event_id", "event_type", "value", "ts"
    )
    for i in range(3):
        e.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            f"{src}/shard_{i}"
        )
    batch_truth = (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .orderBy("event_type")
        .collect()
    )
    return {"root": str(root), "src": src, "schema": e.schema,
            "truth": [tuple(r) for r in batch_truth]}


def _stream(spark, staged, pattern="shard_*"):
    return (
        spark.readStream.schema(staged["schema"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{staged['src']}/{pattern}")
    )


def _fold(df):
    return [
        tuple(r)
        for r in df.groupBy("event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("event_type")
        .collect()
    ]


def test_parquet_sink_restart_with_orphan_file(spark, staged, tmp_path):
    """Kill between batches + an uncommitted orphan part file in the
    sink dir: the restarted query must drain the rest exactly once and
    the transaction-log read must exclude the orphan."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    agg = lambda s: s.select(  # noqa: E731
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def run(pattern):
        q = (
            agg(_stream(spark, staged, pattern))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1 sees only shard_0 (the pre-kill world), drains it, "dies"
    run("shard_0")
    committed = glob.glob(f"{out}/part-*.parquet")
    assert committed, "first run committed nothing"
    # a task killed after write-but-before-commit leaves a full-size
    # part file the transaction log never acknowledged:
    orphan = os.path.join(out, "part-99999-orphan.snappy.parquet")
    shutil.copyfile(committed[0], orphan)

    # restart against the full source with the same checkpoint
    run("shard_*")
    assert os.path.exists(orphan)  # bytes still on disk...
    back = spark.read.parquet(out)  # ...but invisible via _spark_metadata
    got = [
        tuple(r)
        for r in back.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("cents").alias("cents"))
        .orderBy("event_type")
        .collect()
    ]
    assert got == staged["truth"]


def _run_foreach(spark, staged, out, ckpt, handler):
    q = (
        _stream(spark, staged)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch_agg(batch_df):
    return batch_df.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )


def test_foreach_batch_midbatch_kill_replay_is_exactly_once(
    spark, staged, tmp_path
):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    crashed = {"done": False}

    def crashing_idempotent(batch_df, batch_id):
        _batch_agg(batch_df).write.mode("overwrite").parquet(
            f"{out}/batch_id={batch_id}"
        )
        # simulate the kill AFTER the sink write landed, BEFORE the
        # checkpoint commit — the exact double-count window
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected mid-batch kill")

    with pytest.raises(Exception, match="injected mid-batch kill"):
        _run_foreach(spark, staged, out, ckpt, crashing_idempotent)
    assert crashed["done"]
    # batch 1's output is already on disk from the crashed attempt
    assert os.path.isdir(f"{out}/batch_id=1")

    def normal(batch_df, batch_id):
        _batch_agg(batch_df).write.mode("overwrite").parquet(
            f"{out}/batch_id={batch_id}"
        )

    _run_foreach(spark, staged, out, ckpt, normal)  # restart, same ckpt
    assert _fold(spark.read.parquet(out)) == staged["truth"]
    # exactly one directory per micro-batch, no duplicate batch dirs
    assert sorted(
        d for d in os.listdir(out) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1", "batch_id=2"]


def test_foreach_batch_blind_append_double_counts_negative_control(
    spark, staged, tmp_path
):
    """The pre-round-11 handler (blind append) under the SAME kill:
    the replayed batch_id lands twice and the fold over-counts — the
    hazard the idempotent handler exists to close."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    crashed = {"done": False}

    def crashing_blind(batch_df, batch_id):
        _batch_agg(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(out)
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected mid-batch kill")

    with pytest.raises(Exception, match="injected mid-batch kill"):
        _run_foreach(spark, staged, out, ckpt, crashing_blind)
    _run_foreach(spark, staged, out, ckpt, crashing_blind)  # restart

    got = {r["event_type"]: r["cnt"] for r in spark.read.parquet(out)
           .groupBy("event_type").agg(F.sum("cnt").alias("cnt")).collect()}
    want = {t: c for t, c, _ in staged["truth"]}
    assert sum(got.values()) > sum(want.values()), (
        "blind append unexpectedly survived the replay — if Spark "
        "stopped replaying batch_ids this negative control is stale"
    )
