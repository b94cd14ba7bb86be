"""Property-style invariants for the round-3 operators — checks the
oracle pairs can't express (cross-query consistency, mathematical
bounds, reconstruction identities).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_SMALL

all_queries()


def test_doc_chunks_reconstruct_text(spark):
    """Chunks must tile the document: stride-prefixes of all chunks but
    the last, plus the last chunk, concatenate back to the text."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").limit(200).collect()
    }
    chunks = (
        REGISTRY["j_doc_chunk"].fn(spark, SF_SMALL).collect()
    )  # doc_id, chunk_idx, chunk_start, chunk_len, chunk_md5
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in docs.items():
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert rows[0]["chunk_start"] == 0
        # every chunk but the last is full-length-or-tail; starts step by 80
        for i, r in enumerate(rows):
            assert r["chunk_start"] == i * 80
            expect = text[i * 80 : i * 80 + 100]
            assert r["chunk_len"] == len(expect)
        # reconstruction: stride prefixes + final chunk cover exactly
        covered = sum(min(80, r["chunk_len"]) for r in rows[:-1]) + rows[-1]["chunk_len"]
        assert covered == len(text)


def test_token_entropy_bounds(spark):
    """0 <= H <= ln(n_distinct); distinct <= total."""
    for r in REGISTRY["j_token_entropy"].fn(spark, SF_SMALL).collect():
        # the query rounds H at 4 decimals, so allow half an ulp of that
        assert 0.0 <= r["entropy"] <= math.log(r["n_distinct"]) + 5e-5
        assert r["n_distinct"] <= r["n_tokens"]


def test_unigram_logprob_upper_bound(spark):
    """Mean log-prob is strictly negative (no token has corpus
    probability 1 in a multi-doc corpus) and finite."""
    rows = REGISTRY["j_unigram_logprob"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["avg_logprob"] < 0.0
        assert math.isfinite(r["avg_logprob"])


def test_embedding_quantize_code_range(spark):
    rows = REGISTRY["j_embedding_quantize"].fn(spark, SF_SMALL).collect()
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert len(rows) == 64
    for r in rows:
        assert r["n"] == n_vecs
        assert 0 <= r["code_min"] <= r["code_max"] <= 255
        # the affine map is onto [0,255]: both endpoints realized
        assert r["code_min"] == 0 and r["code_max"] == 255


def test_gap_islands_consistency(spark):
    """Σ active_days == |distinct (user, day)|; streak lengths
    partition the active days."""
    rows = REGISTRY["e_gap_islands"].fn(spark, SF_SMALL).collect()
    e = load_table(spark, SF_SMALL, "events")
    truth = (
        e.select("user_id", F.to_date("ts").alias("d")).distinct().count()
    )
    assert sum(r["active_days"] for r in rows) == truth
    for r in rows:
        assert 1 <= r["max_streak"] <= r["active_days"]
        assert r["n_streaks"] <= r["active_days"]


def test_rfm_partitions_customers(spark):
    rows = REGISTRY["q_rfm_segments"].fn(spark, SF_SMALL).collect()
    truth = (
        load_table(spark, SF_SMALL, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == truth


def test_mad_nonnegative_and_bounded(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    lo, hi = li.agg(F.min("l_quantity"), F.max("l_quantity")).first()
    for r in REGISTRY["d_mad_robust"].fn(spark, SF_SMALL).collect():
        assert r["mad"] >= 0.0
        assert lo <= r["med_qty"] <= hi
        assert r["mad"] <= (hi - lo) / 2 + 1e-9


def test_asof_tolerance_is_subset(spark):
    """Bounded-staleness matches are a subset of unbounded matches."""
    base = {
        r["event_type"]: r["cnt"]
        for r in REGISTRY["c_asof_join"].fn(spark, SF_SMALL).collect()
    }
    tol = {
        r["event_type"]: r["cnt"]
        for r in REGISTRY["c_asof_tolerance"].fn(spark, SF_SMALL).collect()
    }
    assert set(tol) <= set(base)
    for k, v in tol.items():
        assert v <= base[k]


def test_survivorship_covers_clusters(spark):
    """Every cluster keeps exactly one survivor; dropped = members-1;
    cluster ids agree with t_dup_clusters."""
    surv = REGISTRY["t_dedup_survivorship"].fn(spark, SF_SMALL).collect()
    clusters = REGISTRY["t_dup_clusters"].fn(spark, SF_SMALL).collect()
    by_id = {r["cluster_id"]: r for r in clusters}
    assert {r["cluster_id"] for r in surv} == set(by_id)
    for r in surv:
        assert r["n_dropped"] == r["n_members"] - 1
        assert r["n_members"] == by_id[r["cluster_id"]]["n_members"]
        members = [int(x) for x in by_id[r["cluster_id"]]["members"].split("|")]
        assert r["survivor_id"] in members
