"""Timestamp helpers that are safe for BOTH timestamp types.

The driver fixtures' ``events.ts`` is parquet ``timestamp[us]`` with
``isAdjustedToUTC=false``; a vanilla Spark 4 session (the driver builds
its own, ``spark.sql.parquet.inferTimestampNTZ.enabled=true`` by
default) therefore reads it as TIMESTAMP_NTZ, while an engine-built
session may read TIMESTAMP. ``F.unix_micros`` accepts only TIMESTAMP —
round-2 driver gate broke on exactly this (CORRECTNESS_r02:
q_sessionize / e_time_range_frames, DATATYPE_MISMATCH on NTZ input).

``epoch_us`` is the one sanctioned way to get epoch microseconds from
an event-time column: cast to TIMESTAMP first (no-op when already LTZ;
session-tz interpretation when NTZ). The engine pins
``spark.sql.session.timeZone=UTC`` on every session it touches
(session.ensure_engine_confs, invoked by catalog.load_table), so the
NTZ→LTZ cast is the exact naive-UTC reading DuckDB's ``epoch_us``
uses — values agree to the microsecond on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))
