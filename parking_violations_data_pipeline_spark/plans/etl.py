"""Reference-shaped ETL composites (SURVEY.md §2 L).

The reference pipeline is: extract → rename/retype → filter invalid →
anonymize (persistent surrogate keys) → enrich (code lookup, geocode)
→ publish. Here each stage is a library function over a
violations-shaped DataFrame; the shape is built from the `events`
fixture (event≈ticket, user≈plate, value≈fine) so every stage is
testable against the driver fixtures without inventing data.

Scale notes: anonymization is the one stateful stage — the key table
is a managed parquet dataset keyed by the natural key; assignment of
new ids is anti-join + (max_id + dense sequence), one shuffle on the
natural key. Everything else is broadcast-enriched projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def violations_shape(events: DataFrame) -> DataFrame:
    """Map the events fixture onto the reference's violations schema
    (rename + retype stage, §2 B1/B2)."""
    return events.select(
        F.col("event_id").alias("ticket_number"),
        F.col("ts").alias("issue_datetime"),
        F.col("user_id").alias("plate_id"),
        F.col("event_type").alias("violation_code"),
        F.col("value").alias("fine"),
        F.col("props").alias("meta"),
    )


def clean(v: DataFrame) -> DataFrame:
    """Drop invalid tickets (null key, non-positive fine) and normalize
    text codes — the reference's validation stage (§2 B3-B5)."""
    return (
        v.filter(F.col("ticket_number").isNotNull() & (F.col("fine") > 0))
        .withColumn("violation_code", F.upper(F.trim("violation_code")))
    )


def anonymize(
    v: DataFrame,
    key_table: DataFrame | None,
    natural_key: str = "plate_id",
    anon_col: str = "anon_plate_id",
) -> tuple[DataFrame, DataFrame]:
    """Persistent surrogate-key assignment (the reference's
    anonymization: same plate ⇒ same anon id across monthly loads).

    `key_table` is the managed state: (natural_key, anon_col). New
    natural keys (anti-join) are assigned max_existing + dense ids
    ordered by the natural key (deterministic). Returns (anonymized
    frame with the natural key REPLACED by the surrogate, updated key
    table to persist for the next load).
    """
    if key_table is None:
        key_table = v.sparkSession.createDataFrame(
            [], f"{natural_key} long, {anon_col} long"
        )
    distinct_keys = v.select(natural_key).distinct()
    new_keys = distinct_keys.join(key_table, natural_key, "left_anti")
    base_row = key_table.agg(F.coalesce(F.max(anon_col), F.lit(0)).alias("m")).head()
    base = base_row["m"] if base_row else 0
    assigned = new_keys.withColumn(
        anon_col, F.row_number().over(W.orderBy(natural_key)) + F.lit(base)
    )
    updated = key_table.unionByName(assigned)
    # No broadcast hint: the surrogate-key table has one row per
    # distinct natural key — it scales with the corpus, so a hard hint
    # dies at the 8 GB broadcast cap at 100-TB scale (round-12 sweep,
    # guide §3.1). Locally AQE's runtime stats still pick a broadcast
    # join when the key table is genuinely small.
    out = (
        v.join(updated, natural_key)
        .drop(natural_key)
    )
    return out, updated


def enrich_codes(v: DataFrame, code_lookup: DataFrame) -> DataFrame:
    """Broadcast lookup join code→description; unmapped codes keep the
    raw code as description (left join + coalesce, §2 C2/C3/B5)."""
    return v.join(
        F.broadcast(code_lookup), v.violation_code == code_lookup.code, "left"
    ).withColumn("violation_desc", F.coalesce("description", "violation_code")).drop(
        "code", "description"
    )


def enrich_geo_bins(v: DataFrame, bins: DataFrame, value_col: str = "fine") -> DataFrame:
    """Geo enrichment stand-in (§2 C7): assign each ticket to a
    division by range-joining a numeric attribute into broadcast bins
    (lo ≤ v < hi) — the same plan shape as point-in-polygon bucketing."""
    return v.join(
        F.broadcast(bins),
        (F.col(value_col) >= bins.lo) & (F.col(value_col) < bins.hi),
        "left",
    ).drop("lo", "hi")


def incremental_append(
    existing: DataFrame, batch: DataFrame, key: str = "ticket_number"
) -> DataFrame:
    """Monthly incremental load (§2 G1+G3): append the new batch, drop
    re-delivered tickets keeping the EXISTING row (deterministic
    survivor: lowest batch rank, then key order)."""
    tagged = existing.withColumn("__src", F.lit(0)).unionByName(
        batch.withColumn("__src", F.lit(1))
    )
    # total order: source rank first, then every payload column — a
    # key duplicated WITHIN a source (dirty feed) must still pick a
    # deterministic survivor on both engines
    payload = [c for c in existing.columns if c != key]
    w = W.partitionBy(key).orderBy("__src", *payload)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def publish(v: DataFrame, *order_cols: str) -> DataFrame:
    """Publication projection: stable column order, sorted output
    (§2 F1 + A5); caller hands the result to writers.write_csv."""
    return v.orderBy(*(order_cols or ("issue_datetime", "ticket_number")))


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    compare_cols: list[str],
    eff_ts: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge (§2 L): `dim` is the
    current snapshot carrying (valid_from, valid_to NULL=open,
    is_current); `updates` is a key→new-attribute batch. Rows whose
    compare_cols changed are closed at eff_ts and re-opened as a new
    version; unseen keys insert as new members; untouched rows pass
    through. Equivalent to Delta/Iceberg MERGE INTO with the classic
    two-branch WHEN MATCHED, expressed as joins so it runs on plain
    parquet: one shuffle on the key for the change detection, two
    anti-joins that reuse the same partitioning, then a union — no
    per-row driver logic anywhere."""
    eff = F.lit(eff_ts).cast("timestamp")
    upd = updates.select(
        F.col(key), *[F.col(c).alias(f"__new_{c}") for c in compare_cols]
    )
    joined = dim.join(upd, key, "inner")
    changed_pred = None
    for c in compare_cols:
        p = ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
        changed_pred = p if changed_pred is None else (changed_pred | p)
    changed = joined.filter(changed_pred)
    closed = changed.select(
        *dim.columns
    ).withColumn("valid_to", eff).withColumn("is_current", F.lit(False))
    reopened = (
        changed.select(
            key,
            *[F.col(f"__new_{c}").alias(c) for c in compare_cols],
            *[c for c in dim.columns if c not in (key, *compare_cols,
                                                  "valid_from", "valid_to", "is_current")],
        )
        .withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .select(*dim.columns)
    )
    changed_keys = changed.select(key)
    unchanged = dim.join(changed_keys, key, "left_anti")
    inserts = (
        updates.join(dim.select(key), key, "left_anti")
        .withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .select(*dim.columns)
    )
    return unchanged.unionByName(closed).unionByName(reopened).unionByName(inserts)
