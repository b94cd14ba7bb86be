"""Plan pins + semantics checks for the round-4 additions (widen73-76):
triangle counting, compressed-vector retrieval (Hamming / PQ-ADC),
binary sources, the BPE merge loop, and the integer-sign stat family.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED, SF_SMALL

all_queries()


def _final_plan(spark, name: str, sf=SF_MED) -> str:
    df = REGISTRY[name].fn(spark, sf)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _run(spark, name: str, sf=SF_SMALL):
    return REGISTRY[name].fn(spark, sf).collect()


# --- widen73 -----------------------------------------------------------


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented count must equal the naive all-triples count on
    the small graph (each triangle counted exactly once)."""
    row = _run(spark, "q_triangle_count")[0]
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    edges = {(r["u"], r["v"]) for r in pairs.collect()}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    naive = 0
    for u, v in edges:
        naive += len(adj[u] & adj[v] - {u, v})
    # every triangle has 3 edges → the edge-sweep counts it 3 times
    assert naive % 3 == 0
    assert row["n_triangles"] == naive // 3
    assert row["n_edges"] == len(edges)


def test_triangle_plan_no_cartesian(spark):
    p = _final_plan(spark, "q_triangle_count")
    assert "CartesianProduct" not in p


def test_record_breaks_monotone(spark):
    """Records are strictly increasing → n_records ≤ distinct values,
    and the top record equals the per-type max value."""
    rows = _run(spark, "e_record_breaks")
    e = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.max(F.round(F.col("value") * 100, 0).cast("long")).alias("mx"))
    )
    mx = {r["event_type"]: r["mx"] for r in e.collect()}
    for r in rows:
        assert r["top_record_cents"] == mx[r["event_type"]]
        assert 1 <= r["n_records"]


def test_trimmed_mean_within_range(spark):
    """The trimmed mean must lie strictly inside [min, max] and below
    the untrimmed mean's sensitivity to the top outliers."""
    rows = _run(spark, "d_trimmed_mean")
    for r in rows:
        assert r["n_kept"] == r["n_total"] - 2 * (r["n_total"] // 10)
        mean_milli = r["trimmed_mean_millicents"]
        assert mean_milli * r["n_kept"] <= r["sum_kept_cents"] * 1000
        assert (mean_milli + 1) * r["n_kept"] > r["sum_kept_cents"] * 1000


# --- widen74 -----------------------------------------------------------


def test_binary_files_roundtrip(spark):
    rows = _run(spark, "a_binary_files")
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(len(r["content_md5"]) == 32 for r in rows)


def test_glob_recursive_excludes_decoys(spark):
    rows = _run(spark, "a_path_glob_recursive")
    d = (
        load_table(spark, SF_SMALL, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {r["lang"]: r["n"] for r in d}
    got = {r["lang"]: r["n_docs"] for r in rows}
    assert got == want


def test_aes_roundtrip_holds(spark):
    row = _run(spark, "h_aes_roundtrip")[0]
    assert row["roundtrip_ok"] is True
    assert row["fixed_ct_b64"] == "Wx6puX+cj/3bVmaYV/jB4Q=="


# --- widen75 -----------------------------------------------------------


def test_hamming_knn_integer_cut(spark):
    rows = _run(spark, "j_hamming_knn")
    assert len(rows) == 10
    hs = [r["hamming"] for r in rows]
    assert hs == sorted(hs)
    assert all(0 <= h <= 64 for h in hs)
    assert all(r["vec_id"] != 0 for r in rows)


def test_hamming_plan_broadcasts_query(spark):
    p = _final_plan(spark, "j_hamming_knn")
    assert "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p  # top-10 without global sort


def test_pq_adc_recall(spark):
    row = _run(spark, "j_pq_adc")[0]
    assert row["recall_ok"] is True
    assert row["compression_x"] == 32


# --- widen76 -----------------------------------------------------------


def test_bpe_merges_shrink_corpus(spark):
    """Each merge strictly reduces token count; merges are 2+ chars."""
    row = _run(spark, "t_bpe_merge_rounds")[0]
    merges = [row["merge1"], row["merge2"], row["merge3"]]
    assert all(len(m) >= 2 for m in merges)
    assert len(set(merges)) == 3  # three distinct learned merges
    # rebuild round-0 token count and check the final count shrank
    d = load_table(spark, SF_SMALL, "documents")
    base = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter((F.length("w") >= 2) & (F.length("w") <= 12))
        .agg(F.sum(F.length("w")).alias("n"))
        .collect()[0]["n"]
    )
    assert row["n_tokens_final"] < base


def test_simpson_sign_partition(spark):
    row = _run(spark, "d_simpson_paradox")[0]
    assert row["overall_sign"] in (-1, 0, 1)
    assert row["n_years_agree"] + row["n_years_reversed"] <= row["n_years"]


def test_dataset_card_ppm_bounds(spark):
    for r in _run(spark, "t_dataset_card"):
        assert 0 < r["unique_ppm"] <= 1_000_000
        assert r["mean_chars_milli"] * r["n_docs"] <= r["total_chars"] * 1000
