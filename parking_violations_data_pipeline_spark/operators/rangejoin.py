"""Binned range join — the large-×-large interval join that stays an
equi-join.

A broadcast range join (relational.py c_range_join) dies when BOTH
sides are big: without an equality key Catalyst's only plan is a
nested-loop over every (point, interval) pair. The standard fix is to
quantize time into fixed-width bins: an interval [st, en) is exploded
into the bins it covers, a point t belongs to exactly one bin, and the
join becomes `point.bin = interval.bin` — a hash shuffle — with the
original predicate left as a cheap residual filter inside each bucket.

Cost model (the 100 TB question): the explode factor is
ceil(interval_len / bin_width); pick bin_width on the order of the
median interval so each interval lands in O(1) bins while each bin
holds |points|·bin/span points. Worst case degenerates only when one
bin is hot — the same skew story as any hash join, handled by AQE skew
split, not by this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_width: int,
    residual: Column | None = None,
) -> DataFrame:
    """Join `points` (integer position `point_col`) to `intervals`
    (half-open [start_col, end_col)) via fixed-width bins.

    Returns the joined DataFrame with all columns from both inputs.
    Each qualifying (point, interval) pair appears exactly once: the
    interval is exploded to every bin it covers, and a point has
    exactly one bin, so no post-join dedup is needed.
    """
    # Enforce the documented half-open [st, en) contract IN the plan: a
    # reversed interval (en < st) would make F.sequence default to
    # step -1 and DESCEND through every bin between the endpoints — a
    # silent explode blowup the residual filter then hides as pure
    # cost. The guard lives inside the bin-array expression (a lazy
    # CaseWhen around raise_error), so it costs zero extra jobs/scans
    # and fails loudly on the first truly-reversed row. en == st is a
    # legitimately EMPTY half-open interval [st, st): it gets an empty
    # bin array (explode drops the row — matches zero points, exactly
    # the SQL `t >= st AND t < en` semantics). NULL endpoints likewise
    # map to the empty array: in SQL a NULL-bounded BETWEEN matches
    # nothing, and an inner range join drops the row.
    seq = F.sequence(
        (F.col(start_col) / bin_width).cast("long"),
        ((F.col(end_col) - 1) / bin_width).cast("long"),
    )
    bins = (
        F.when(F.col(end_col) > F.col(start_col), seq)
        .when(
            F.col(end_col) < F.col(start_col),
            F.raise_error(
                F.concat(
                    F.lit(
                        "range_join_binned: interval violates the half-open "
                        f"[{start_col}, {end_col}) contract ({end_col} < "
                        f"{start_col}): start="
                    ),
                    F.col(start_col).cast("string"),
                    F.lit(" end="),
                    F.col(end_col).cast("string"),
                )
            ).cast("array<long>"),
        )
        .otherwise(F.array().cast("array<long>"))
    )
    binned_iv = intervals.withColumn("__bin", F.explode(bins))
    binned_pt = points.withColumn(
        "__bin", (F.col(point_col) / bin_width).cast("long")
    )
    cond = (
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    if residual is not None:
        cond = cond & residual
    return binned_pt.join(binned_iv, "__bin").filter(cond).drop("__bin")
