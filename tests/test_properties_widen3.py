"""Property-style invariants for the widen3 operators — bounds and
cross-query identities the oracle pairs can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_SMALL

all_queries()


def test_chunk_dedup_conservation(spark):
    """Survivors ≤ chunks per source; total survivors across sources
    equals the corpus-wide distinct chunk count (keep-first keeps
    exactly one row per distinct chunk)."""
    rows = REGISTRY["t_chunk_dedup"].fn(spark, SF_SMALL).collect()
    assert rows, "no sources"
    for r in rows:
        assert 0 < r["n_survived"] <= r["n_chunks"]
        assert abs(r["survive_frac"] - round(r["n_survived"] / r["n_chunks"], 4)) < 1e-9
    # distinct chunks, recomputed independently
    d = load_table(spark, SF_SMALL, "documents")
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    n_distinct = (
        d.select(ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, CAST(floor((size(ws) - 1) / 10) AS INT)),"
                    " i -> array_join(slice(ws, i * 10 + 1, 10), ' '))"
                )
            ).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert sum(r["n_survived"] for r in rows) == n_distinct


def test_feature_assembly_is_leakage_free(spark):
    """prior_cents strictly excludes the current purchase: for every
    user's first purchase (no prior purchases) prior_cents == 0, and
    prior_cents is non-decreasing along each user's purchase order."""
    feats = {
        r["event_id"]: r
        for r in REGISTRY["l_feature_assembly"].fn(spark, SF_SMALL).collect()
    }
    e = load_table(spark, SF_SMALL, "events").filter(
        F.col("event_type") == "purchase"
    )
    purchases = e.select("event_id", "user_id", "ts").collect()
    by_user: dict[int, list] = {}
    for r in purchases:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        assert feats[rows[0]["event_id"]]["prior_cents"] == 0
        seq = [feats[r["event_id"]]["prior_cents"] for r in rows]
        assert all(a <= b for a, b in zip(seq, seq[1:]))


def test_lang_balance_caps_and_passthrough(spark):
    """n_kept ≤ quota cap and n_kept ≤ n_orig; under-quota languages
    pass through untouched (n_kept == n_orig)."""
    rows = REGISTRY["t_lang_balance_resample"].fn(spark, SF_SMALL).collect()
    langs = (
        load_table(spark, SF_SMALL, "documents").groupBy("lang").count().collect()
    )
    import math

    cap = math.ceil(sum(r["count"] for r in langs) / len(langs))
    for r in rows:
        assert r["n_kept"] <= r["n_orig"]
        assert r["n_kept"] <= cap
        if r["n_orig"] <= cap:
            assert r["n_kept"] == r["n_orig"]


def test_containment_bounds_and_direction(spark):
    """0 < containment ≤ 1; directed pairs may appear in both
    directions with different scores (asymmetry is the point)."""
    rows = REGISTRY["j_shingle_containment"].fn(spark, SF_SMALL).collect()
    for r in rows:
        assert 0.0 < r["containment"] <= 1.0 + 1e-9
        assert r["inter"] >= 1
        assert r["id_a"] != r["id_b"]


def test_dedup_threshold_curve_is_monotone(spark):
    """Cumulative pairs-at-or-above must be non-increasing in the
    threshold, and the lowest bucket's cumulative equals total pairs."""
    rows = sorted(
        REGISTRY["t_dedup_rate_by_threshold"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["threshold"],
    )
    assert rows, "no pairs at sf0.001"
    cums = [r["n_pairs_ge"] for r in rows]
    assert all(a >= b for a, b in zip(cums, cums[1:]))
    assert cums[0] == sum(r["n_pairs"] for r in rows)


def test_new_vs_returning_accounting(spark):
    """Each user is new on exactly one day; daily new+returning equals
    daily distinct actives."""
    rows = REGISTRY["q_new_vs_returning"].fn(spark, SF_SMALL).collect()
    e = load_table(spark, SF_SMALL, "events")
    n_users = e.select("user_id").distinct().count()
    assert sum(r["new_users"] for r in rows) == n_users
    daily = {
        r["d"]: r["n"]
        for r in e.groupBy(F.to_date("ts").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["new_users"] + r["returning_users"] == daily[r["d"]]


def test_session_percentiles_ordered(spark):
    """p50 ≤ p90 ≤ p99 and session count matches q_sessionize's."""
    r = REGISTRY["e_session_duration_percentiles"].fn(spark, SF_SMALL).collect()[0]
    assert 0 <= r["p50_us"] <= r["p90_us"] <= r["p99_us"]
    n_sessions = REGISTRY["q_sessionize"].fn(spark, SF_SMALL).count()
    assert r["n_sessions"] == n_sessions
