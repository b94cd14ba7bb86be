"""Spark 4 Python DataSource API: a custom batch source implemented
entirely in Python (`pyspark.sql.datasource`), registered under the
format name ``synthetic_rates``.

The source generates a deterministic FX-style rate table — (day, ccy,
rate_micro) — from a pure integer formula, split into monthly
InputPartitions so Spark plans genuinely parallel reads (one Python
worker task per partition; at scale the partition count is the
parallelism knob exactly as for file sources). Rates are integer
micro-units from integer arithmetic only, so an oracle can replay the
formula exactly on any engine.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CCYS = ("CNY", "EUR", "GBP", "JPY", "USD")


def rate_micro(day: int, ccy_idx: int) -> int:
    """Deterministic synthetic rate: integer arithmetic only."""
    return 1_000_000 + ((day * 31 + ccy_idx * 9_973) * 7_919) % 250_000


class RatesPartition(InputPartition):
    def __init__(self, day_lo: int, day_hi: int):
        self.day_lo = day_lo
        self.day_hi = day_hi


class RatesReader(DataSourceReader):
    def __init__(self, options):
        self.n_days = int(options.get("n_days", "365"))

    def partitions(self):
        # ~monthly chunks: 12 independent read tasks regardless of span
        chunk = max(1, (self.n_days + 11) // 12)
        return [
            RatesPartition(lo, min(lo + chunk, self.n_days))
            for lo in range(0, self.n_days, chunk)
        ]

    def read(self, partition: RatesPartition):
        for day in range(partition.day_lo, partition.day_hi):
            for i, ccy in enumerate(CCYS):
                yield (day, ccy, rate_micro(day, i))


class RatesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_rates"

    def schema(self) -> str:
        return "day int, ccy string, rate_micro bigint"

    def reader(self, schema) -> RatesReader:
        return RatesReader(self.options)


class LedgerCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int, cents: int):
        self.path = path
        self.n_rows = n_rows
        self.cents = cents


class LedgerWriter(DataSourceWriter):
    """Custom Python SINK: each task serializes its partition as one
    JSON-lines shard and reports (rows, cent total) in its commit
    message; the driver-side commit writes a _MANIFEST with the
    folded totals — the two-phase commit shape every exactly-once
    sink implements (files become visible only via the manifest)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.path, exist_ok=True)
        shard = _os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        n, cents = 0, 0
        with open(shard, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps({"priority": row[0], "cents": row[1]}) + "\n")
                n += 1
                if row[1] is not None:  # ledger total = SQL sum: NULLs don't count
                    cents += int(row[1])
        return LedgerCommit(shard, n, cents)

    def commit(self, messages):
        import json as _json
        import os as _os

        manifest = {
            "n_shards": len(messages),
            "n_rows": sum(m.n_rows for m in messages),
            "cents": sum(m.cents for m in messages),
        }
        with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            fh.write(_json.dumps(manifest))

    def abort(self, messages):
        import os as _os

        for m in messages:
            if _os.path.exists(m.path):
                _os.remove(m.path)


class LedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "integer_ledger"

    def schema(self) -> str:
        return "priority string, cents bigint"

    def writer(self, schema, overwrite: bool) -> LedgerWriter:
        return LedgerWriter(self.options)


class RatesStreamReader(SimpleDataSourceStreamReader):
    """Python STREAMING source (Spark 4 SimpleDataSourceStreamReader):
    each micro-batch advances the day offset by a fixed stride and
    replays the same deterministic integer rate formula as the batch
    reader — offsets are the source-of-truth contract (initialOffset →
    read(start) → commit), which is exactly what makes the stream
    replayable and exactly-once under checkpointing."""

    def __init__(self, options):
        self.n_days = int(options.get("n_days", "365"))
        self.stride = int(options.get("stride", "92"))

    def initialOffset(self):
        return {"day": 0}

    def read(self, start):
        lo = start["day"]
        hi = min(lo + self.stride, self.n_days)
        rows = [
            (day, ccy, rate_micro(day, i))
            for day in range(lo, hi)
            for i, ccy in enumerate(CCYS)
        ]
        return (iter(rows), {"day": hi})

    def readBetweenOffsets(self, start, end):
        rows = [
            (day, ccy, rate_micro(day, i))
            for day in range(start["day"], end["day"])
            for i, ccy in enumerate(CCYS)
        ]
        return iter(rows)


class RatesStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_rates_stream"

    def schema(self) -> str:
        return "day int, ccy string, rate_micro bigint"

    def simpleStreamReader(self, schema) -> RatesStreamReader:
        return RatesStreamReader(self.options)


# ---------------------------------------------------------------------------
# Thread-safe registration (round-7 soak finding): dataSource.register
# is wrap + overwrite-put, so re-registering is harmless — but the old
# per-entry `try: register / except: pass` SWALLOWED real failures, and
# under a multi-threaded job server a contended registration could fail
# silently and surface later as DATA_SOURCE_NOT_FOUND at .save(). This
# helper serializes registration, caches per (session, name), and lets
# genuine failures raise at the registration site where they belong.
# ---------------------------------------------------------------------------

import threading as _threading
import weakref as _weakref

_DS_LOCK = _threading.Lock()
# Keyed on the PYTHON SparkSession object via a WeakKeyDictionary, not
# on id(jsparkSession): CPython recycles id() values after GC, so a new
# session whose py4j wrapper reuses a freed id would be silently treated
# as already-registered and later fail DATA_SOURCE_NOT_FOUND — the exact
# silent failure this helper exists to eliminate (round-8 ADVICE fix).
# The weak entry dies with the session, so no stale hit is possible.
# Two live Python wrappers of the same JVM session miss each other's
# cache — a harmless re-register (register is wrap + overwrite-put).
_DS_REGISTERED: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def register_python_datasource(spark, cls) -> None:
    name = cls.name()
    with _DS_LOCK:
        names = _DS_REGISTERED.get(spark)
        if names is not None and name in names:
            return
        spark.dataSource.register(cls)
        if names is None:
            names = set()
            _DS_REGISTERED[spark] = names
        names.add(name)


def ensure_active_session(spark) -> None:
    """Pin `spark` as the JVM thread-local active session for the
    calling thread. Spark 4.1's `DataSource.lookupDataSource` resolves
    PYTHON data sources through `SparkSession.getActiveSession` (a JVM
    thread-local), not through the DataFrame's own session reference —
    so `.save()` on a registered Python sink from a JVM thread that
    never had an active session fails DATA_SOURCE_NOT_FOUND. This is
    deterministic, not a race (reproduced 3/3 on any fresh thread);
    it only LOOKED intermittent under the threaded soak because py4j
    pools JVM threads per connection, so a worker sometimes inherits a
    thread where the main session was already active. Any multi-thread
    job server driving Python-datasource IO needs this pin per thread."""
    jvm_session = spark._jvm.org.apache.spark.sql.SparkSession
    jvm_session.setActiveSession(spark._jsparkSession)


def load_python_datasource(spark, fmt: str, **options):
    """Read through a registered Python data source, pinning the JVM
    thread-local active session first (see ensure_active_session)."""
    ensure_active_session(spark)
    r = spark.read.format(fmt)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def save_python_datasource(df, fmt: str, mode: str = "append", **options):
    """Write through a registered Python data source, pinning the JVM
    thread-local active session first (see ensure_active_session —
    the write path is the one that deterministically fails without it)."""
    ensure_active_session(df.sparkSession)
    w = df.write.format(fmt).mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.save()
