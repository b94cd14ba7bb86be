"""Skew-handled join (SURVEY.md §2 C10).

First line of defense at scale is AQE's skew-join splitting (enabled
in the session factory). This module is the explicit fallback for
pathological hot keys AQE can't fix (e.g. one key = 30% of a 100-TB
fact table): salt the large side with a deterministic shard id and
replicate the small side across all shards, turning one hot partition
into `salt` even ones. Deterministic salting (hash of stable columns,
not rand()) keeps retries and resumed stages consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    salt_source: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on `on`, sharding each join key into
    `salt` sub-keys. The small side is replicated `salt`× (explode of a
    literal range — cheap for dim tables); the large side picks a shard
    by hashing `salt_source` columns (default: all non-key columns, or
    the key columns themselves when nothing else exists — xxhash64
    needs ≥1 argument).

    Only how='inner'/'left' are supported: replicating the small side
    would emit each UNMATCHED small row `salt` times under right/full
    semantics (matched rows are fine — they join a unique shard).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join: how must be 'inner' or 'left' (small-side replication "
            f"duplicates unmatched rows under right/full), got {how!r}"
        )
    src = salt_source or [c for c in large.columns if c not in on] or list(on)
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt)).cast("int")
    big = large.withColumn("__shard", shard)
    rep = small.withColumn(
        "__shard", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big.join(rep, on + ["__shard"], how).drop("__shard")
