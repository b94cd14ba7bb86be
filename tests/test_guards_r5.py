"""Round-5 guard tests: scale guards fail LOUDLY instead of silently
burning a cluster (VERDICT r4 "What's wrong #1" + ADVICE items).

Covers: similarity_self_join exact_cap (the all-pairs O(n²) refusal),
range_join_binned reversed-interval contract, pq_build sparse-id
seeding + short-corpus assertion, stream_stream_outer sentinel scrub.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from parking_violations_data_pipeline_spark.operators.rangejoin import range_join_binned
from parking_violations_data_pipeline_spark.operators import similarity as S


def _vecs(spark, ids, dim=4):
    rows = [(int(i), [float((i * 7 + j) % 5) + 1.0 for j in range(dim)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestExactCap:
    def test_under_cap_runs(self, spark):
        e = _vecs(spark, range(10))
        out = S.similarity_self_join(e, -1.0)  # threshold -1: all 45 pairs
        assert out.count() == 45

    def test_over_cap_refuses_and_points_at_lsh(self, spark):
        # the guard is LAZY (r6): building the plan is free; the refusal
        # fires in-plan at action time, before the crossJoin streams
        e = _vecs(spark, range(30))
        out = S.similarity_self_join(e, 0.3, exact_cap=20)
        with pytest.raises(Exception, match="use_lsh=True"):
            out.count()

    def test_cap_is_deliberately_overridable(self, spark):
        e = _vecs(spark, range(30))
        out = S.similarity_self_join(e, -1.0, exact_cap=30)
        assert out.count() == 30 * 29 // 2

    def test_lsh_path_not_capped(self, spark):
        # the scale path must NOT hit the guard regardless of exact_cap
        e = _vecs(spark, range(30))
        S.similarity_self_join(e, 0.3, use_lsh=True, exact_cap=1).count()


class TestRangeJoinContract:
    def _points(self, spark):
        return spark.createDataFrame([(i, i * 10) for i in range(5)], "pid long, t long")

    def test_valid_intervals_unchanged(self, spark):
        iv = spark.createDataFrame([(1, 0, 25), (2, 25, 50)], "iid long, st long, en long")
        out = range_join_binned(self._points(spark), "t", iv, "st", "en", 10)
        # t=0,10,20 -> iv1; t=30,40 -> iv2 (half-open: 25<=t<50)
        assert out.count() == 5

    def test_reversed_interval_raises_in_plan(self, spark):
        iv = spark.createDataFrame(
            [(1, 0, 25), (2, 1_000_000, 3)], "iid long, st long, en long"
        )
        out = range_join_binned(self._points(spark), "t", iv, "st", "en", 10)
        with pytest.raises(Exception, match="half-open"):
            out.count()

    def test_empty_interval_matches_nothing(self, spark):
        # en == st is a legitimately EMPTY half-open interval [st, st)
        # (r6, ADVICE item): it matches zero points and must NOT abort
        # the job — only truly reversed en < st is a contract violation
        iv = spark.createDataFrame(
            [(1, 10, 10), (2, 0, 25)], "iid long, st long, en long"
        )
        out = range_join_binned(self._points(spark), "t", iv, "st", "en", 10)
        rows = out.collect()
        assert all(r["iid"] == 2 for r in rows)
        assert len(rows) == 3  # t=0,10,20 in [0,25)

    def test_null_endpoint_matches_nothing(self, spark):
        # NULL-bounded intervals match nothing (SQL BETWEEN semantics)
        # instead of aborting — required by the adversarial all-null
        # fixture sweep
        iv = spark.createDataFrame(
            [(1, None, 25), (2, 25, None), (3, 25, 50)],
            "iid long, st long, en long",
        )
        out = range_join_binned(self._points(spark), "t", iv, "st", "en", 10)
        rows = out.collect()
        assert all(r["iid"] == 3 for r in rows)
        assert len(rows) == 2  # t=30,40 in [25,50)


class TestPqBuildSeeding:
    def test_sparse_offset_ids_seed_full_codebook(self, spark):
        # ids 1000..1019 — the old `id < k` filter found ZERO seeds here
        e = _vecs(spark, range(1000, 1020), dim=8)
        codes, book = S.pq_build(e, m=2, k=4, iters=1, vec_col="embedding")
        assert len(book) == 2 * 4
        assert codes.select("id").distinct().count() == 20
        assert codes.agg(F.max("code")).head()[0] <= 3

    def test_dense_ids_equal_old_seeding(self, spark):
        # dense 0-based ids: rank-1 == id, so codes must be identical to
        # the pre-fix behavior (keeps the oracle rows green)
        e = _vecs(spark, range(20), dim=8)
        codes, book = S.pq_build(e, m=2, k=4, iters=0, vec_col="embedding")
        seeded = {(s, c) for (s, c) in book}
        assert seeded == {(s, c) for s in range(2) for c in range(4)}
        # seed vectors code to themselves at iter 0
        self_codes = codes.filter(F.col("id") < 4)
        assert all(r["code"] == r["id"] for r in self_codes.collect())

    def test_short_corpus_fails_loudly(self, spark):
        e = _vecs(spark, range(3), dim=8)
        with pytest.raises(ValueError, match="fewer than k"):
            S.pq_build(e, m=2, k=16, iters=0, vec_col="embedding")


class TestOuterJoinSentinelScrub:
    def test_no_sentinel_rows_escape(self, spark):
        from parking_violations_data_pipeline_spark.streaming import jobs

        out = jobs.stream_stream_outer_unmatched(spark, "/root/testdata/sf0.001")
        pdf = out.toPandas()
        assert (pdf["c_user"] >= 0).all()
        assert not (pdf["c_type"] == "__flush__").any()
        # unmatched rows still present: eviction proof intact
        assert pdf["p_ts"].isna().any()


class TestSplitMoneySum:
    def test_split_sum_exact_on_boundary_values(self, spark):
        """u = k*1e6 - 1 is the double-division trap: u/1e6 rounds UP to
        k in float64, so trunc-of-quotient would give q=k, r=999999 and
        q*M + r = u + 1e6 - 1 != u. The (u - u%M)/M form is exact; pin
        it against a python-int ground truth over adversarial values."""
        import random

        from parking_violations_data_pipeline_spark.functions.money import (
            _SPLIT_M,
            _split_sum,
        )

        rng = random.Random(5)
        M = _SPLIT_M
        vals = (
            [k * M - 1 for k in (1, 7, 113_000)]          # round-up traps
            + [k * M for k in (1, 2, 113_000)]            # exact multiples
            + [k * M + 1 for k in (1, 113_000)]
            + [0, 1, M - 1, 112_999_999_999]              # edges of the grid
            + [rng.randrange(0, 1_130_000_000_00) for _ in range(200)]
        )
        df = spark.createDataFrame([(v,) for v in vals], "u long")
        got = df.agg(_split_sum(F.col("u")).alias("s")).head()["s"]
        assert int(got) == sum(vals)

    def test_split_sum_matches_decimal_sum_at_sf01(self, spark):
        """Whole-corpus equivalence: split sums == the round-2
        decimal(38,0) sum on real lineitem money grids at sf0.1."""
        from parking_violations_data_pipeline_spark.catalog import load_table
        from parking_violations_data_pipeline_spark.functions.money import (
            _pct100,
            _split_sum,
        )

        li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
        u = _pct100("l_extendedprice") * (F.lit(100) - _pct100("l_discount")) * (
            F.lit(100) + _pct100("l_tax")
        )
        row = li.agg(
            _split_sum(u).alias("split"),
            F.sum(u.cast("decimal(38,0)")).alias("dec"),
        ).head()
        assert int(row["split"]) == int(row["dec"])


def test_every_survey_s2_row_id_is_tagged():
    """VERDICT r4 'What's wrong #4': a mechanical §2 → entry check must
    show zero gaps — every SURVEY.md §2 row id (incl. I9, J12-J18, L)
    appears verbatim in some registry entry's tags, so the catalog
    (docs/OPERATORS.md, generated from these tags) resolves every row
    without name-based detective work."""
    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

    all_queries()
    tags: set[str] = set()
    for e in REGISTRY.values():
        tags.update(getattr(e, "tags", ()) or ())
    rows = (
        [f"A{i}" for i in range(1, 7)]
        + [f"B{i}" for i in range(1, 7)]
        + [f"C{i}" for i in range(1, 11)]
        + [f"D{i}" for i in range(1, 9)]
        + [f"E{i}" for i in range(1, 5)]
        + [f"F{i}" for i in range(1, 4)]
        + [f"G{i}" for i in range(1, 4)]
        + [f"H{i}" for i in range(1, 8)]
        + [f"I{i}" for i in range(1, 10)]
        + [f"J{i}" for i in range(1, 19)]
        + [f"K{i}" for i in range(1, 5)]
        + ["L"]
        + [f"M{i}" for i in range(1, 10)]
    )
    missing = [r for r in rows if r not in tags]
    assert not missing, f"§2 rows with no tagged entry: {missing}"


class TestConnectedComponentsMemory:
    def test_checkpoint_blocks_released(self, spark):
        """connected_components must not leak localCheckpoint blocks:
        superseded label checkpoints and the edge cache are freed
        during/after the run, leaving at most the returned labels
        frame pinned (the 100x OOM lesson — two dup-cluster pipelines
        in one session blew an 8g driver on pinned blocks)."""
        from parking_violations_data_pipeline_spark.operators.graph import (
            connected_components,
        )

        sc = spark.sparkContext
        before = sc._jsc.sc().getPersistentRDDs().size()
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 200, 2)] + [(1, 2), (5, 6)],
            "src long, dst long",
        )
        labels = connected_components(edges)
        labels.count()
        after = sc._jsc.sc().getPersistentRDDs().size()
        # only the returned labels checkpoint may remain pinned
        assert after - before <= 1, (before, after)
