"""Property-based tests (hypothesis) for the hand-built operators —
the code Spark doesn't provide natively and the oracle can't always
reach: as-of join, salted join, incremental append. Each is checked
against a brute-force Python reference on small generated inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parking_violations_data_pipeline_spark.operators.asof import asof_join
from parking_violations_data_pipeline_spark.operators.skew import salted_join
from parking_violations_data_pipeline_spark.plans.etl import incremental_append

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=20)


@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=12),
    right=st.lists(st.tuples(keys, times, st.integers(0, 100)), min_size=1, max_size=12),
)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, t int, rowid int"
    )
    rdf = spark.createDataFrame(right, "k int, rt int, payload int")
    got = {
        r.rowid: r.payload
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="rt",
            payload=["payload"], how="left",
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        # brute force: latest right row with rt <= t for the key; ties on rt
        # resolved identically by both (last wins within equal rt group is
        # order-dependent) — restrict the check to unambiguous cases
        cands = [(rt, p) for (rk, rt, p) in right if rk == k and rt <= t]
        if not cands:
            assert got[i] is None
            continue
        best_rt = max(rt for rt, _ in cands)
        vals = {p for rt, p in cands if rt == best_rt}
        if len(vals) == 1:
            assert got[i] in vals


@given(
    rows=st.lists(st.tuples(keys, st.integers(0, 1000)), min_size=1, max_size=30),
    salt=st.sampled_from([2, 4, 8]),
)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, rows, salt):
    large = spark.createDataFrame(rows, "k int, v int")
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, tag string")
    plain = sorted(map(tuple, large.join(small, "k").collect()))
    salted = sorted(map(tuple, salted_join(large, small, on=["k"], salt=salt).collect()))
    assert plain == salted


@given(
    existing=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 100)), max_size=15),
    batch=st.lists(st.tuples(st.integers(0, 9), st.integers(200, 300)), max_size=15),
)
@settings(**SETTINGS)
def test_incremental_append_keeps_existing(spark, existing, batch):
    e = spark.createDataFrame(existing, "id int, v int") if existing else (
        spark.createDataFrame([], "id int, v int")
    )
    b = spark.createDataFrame(batch, "id int, v int") if batch else (
        spark.createDataFrame([], "id int, v int")
    )
    merged = incremental_append(e, b, key="id")
    out = {r.id: r.v for r in merged.collect()}
    existing_ids = {k for k, _ in existing}
    for rid, v in out.items():
        if rid in existing_ids:
            assert v <= 100  # survivor came from `existing`, never the batch
        else:
            assert v >= 200
    assert set(out) == existing_ids | {k for k, _ in batch}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=15
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """CC label propagation == python union-find on random small graphs
    (self-loops and parallel/reversed edges included by generation)."""
    from parking_violations_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}
    # canonical min-label per component
    comp_min = {}
    for n, r in expected.items():
        comp_min.setdefault(r, set()).add(n)
    want = {n: min(comp_min[find(n)]) for n in parent}

    edf = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.label for r in connected_components(edf).collect()}
    assert got == want


@given(
    balances=st.lists(st.integers(0, 500), min_size=1, max_size=10),
    bump_mask=st.lists(st.booleans(), min_size=1, max_size=10),
)
@settings(**SETTINGS)
def test_scd2_merge_invariants(spark, balances, bump_mask):
    """SCD2 invariants on random dimensions: exactly one current row
    per surviving key, closed rows carry the effective timestamp,
    total rows = dim + changed (each change adds one version row) +
    inserts, and unchanged rows pass through byte-identical."""
    from pyspark.sql import functions as F

    from parking_violations_data_pipeline_spark.plans.etl import scd2_merge

    n = len(balances)
    mask = (bump_mask * n)[:n]
    dim = spark.createDataFrame(
        [(i, float(b)) for i, b in enumerate(balances)], "k long, bal double"
    )
    dim = (
        dim.withColumn("valid_from", F.lit("2024-01-01").cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    updates = spark.createDataFrame(
        [(i, float(b + (10 if m else 0))) for i, (b, m) in enumerate(zip(balances, mask))]
        + [(n + 100, 7.0)],  # one insert
        "k long, bal double",
    )
    out = scd2_merge(dim, updates, "k", ["bal"], "2024-06-01").collect()
    n_changed = sum(mask)
    assert len(out) == n + n_changed + 1
    cur = [r for r in out if r.is_current]
    assert len(cur) == n + 1  # every key + the insert has one current row
    assert len({r.k for r in cur}) == n + 1
    closed = [r for r in out if not r.is_current]
    assert len(closed) == n_changed
    assert all(str(r.valid_to) == "2024-06-01 00:00:00" for r in closed)
    for r in cur:
        if r.k < n and mask[r.k]:
            assert r.bal == balances[r.k] + 10 and str(r.valid_from) == "2024-06-01 00:00:00"
        elif r.k < n:
            assert r.bal == balances[r.k] and str(r.valid_from) == "2024-01-01 00:00:00"
