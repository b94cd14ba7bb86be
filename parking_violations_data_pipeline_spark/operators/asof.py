"""As-of (point-in-time) join — SURVEY.md §2 C8.

Spark has no native ASOF strategy; the scalable rewrite used here is
the union + last-non-null-window trick:

  1. tag right rows (version rows) and left rows (probe rows);
  2. union them on the key space, sort within each key by
     (time, right-before-left-at-ties for backward semantics);
  3. running last(ignorenulls=True) over ONE struct holding the whole
     right-side payload carries the most recent version forward
     atomically — all payload columns come from the SAME version row,
     and a NULL inside one payload column of the newest version is
     preserved (not back-filled from an older row);
  4. keep only probe rows.

One shuffle on the join key, state linear in rows — no range
explosion, no per-key collect. This matches DuckDB's native ASOF JOIN
(the oracle) for backward direction with >= inclusivity.

The alternative (range join + max_by) explodes when version history
is long; the union trick is the one that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload: list[str],
    how: str = "inner",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward as-of join: for each left row, attach `payload` from
    the latest right row with right_time <= left_time (per `on` keys).

    how='inner' drops left rows with no prior version; 'left' keeps
    them with null payload. A matched version row whose payload
    columns are partly NULL yields those NULLs verbatim (true as-of
    semantics — the payload is carried as one struct, never mixed
    across version rows).

    `tolerance` (e.g. "2 days", pandas merge_asof semantics) bounds
    staleness: a carried version older than left_time - tolerance is
    treated as a miss (dropped on 'inner', null payload on 'left').
    The matched version time rides inside the carried struct, so the
    bound costs one comparison — no extra join or window pass.

    `direction='forward'` mirrors the semantics: attach the EARLIEST
    right row with right_time >= left_time (the "next scheduled
    event" shape — next maintenance after a failure, next price
    revision after a quote). Same single-shuffle plan with the sort
    order reversed; tolerance then bounds how far AHEAD the version
    may be (right_time <= left_time + tolerance).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    from pyspark.sql import types as T

    payload_type = T.StructType(
        [right.schema[c] for c in payload]
        + [T.StructField("__vt", right.schema[right_time].dataType)]
    )
    lt = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__r"),
        F.lit(None).cast(payload_type).alias("__p"),
        F.struct(*left.columns).alias("__row"),
    )
    rt = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__r"),
        F.struct(
            *[F.col(c) for c in payload], F.col(right_time).alias("__vt")
        ).alias("__p"),
        F.lit(None).cast(lt.schema["__row"].dataType).alias("__row"),
    )
    u = lt.unionByName(rt)
    # at equal times the version row must sort BEFORE the probe row;
    # forward direction walks time in reverse so "last seen" becomes
    # "earliest at-or-after"
    order_t = F.col("__t") if direction == "backward" else F.desc("__t")
    w = (
        W.partitionBy(*on)
        .orderBy(order_t, F.desc("__r"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "__r",
        "__row",
        "__t",
        F.last("__p", ignorenulls=True).over(w).alias("__c"),
    ).filter(F.col("__r") == 0)
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col("__c.__vt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        else:
            fresh = F.col("__c.__vt") <= F.col("__t") + F.expr(f"INTERVAL {tolerance}")
        carried = carried.withColumn(
            "__c",
            F.when(F.col("__c").isNotNull() & fresh, F.col("__c")).otherwise(
                F.lit(None).cast(payload_type)
            ),
        )
    if how == "inner":
        # the carried STRUCT is null iff no version row preceded the
        # probe (or, with tolerance, none fresh enough) — the marker
        # for a miss, independent of payload nulls
        carried = carried.filter(F.col("__c").isNotNull())
    return carried.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c.{c}").alias(c) for c in payload],
    )
