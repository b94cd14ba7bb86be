"""Round-9 independent re-derivations (verdict item 7): the two
families still lacking a from-raw-parquet pure-python check —
geo_multires_rollup (the GROUPING SETS composite) and the K1–K4 UDF
surface (scalar UDF, pandas UDF, grouped-agg UDAF, grouped-map,
UDTF). Protocol: read the fixture parquet with pyarrow, recompute the
entry's full contract (values, grouping, ordering, tie-breaks) in
plain python, compare row-for-row with the engine output.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def _cols(table: str, cols: list[str]) -> list[tuple]:
    t = pq.read_table(f"{SF}/{table}.parquet", columns=cols)
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def run(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


class TestKFamily:
    def test_k_scalar_udf(self, spark):
        cnt: Counter = Counter()
        for (p,) in _cols("orders", ["o_totalprice"]):
            if p is None:
                b = None
            else:
                b = "S" if p < 100000 else ("M" if p < 250000 else "L")
            cnt[b] += 1
        expect = sorted(
            ((b, n) for b, n in cnt.items() if b is not None)
        )
        got = [(r["bucket"], r["cnt"]) for r in run(spark, "k_scalar_udf")]
        # engine orderBy("bucket") puts NULL bucket first if present
        got_nonnull = [g for g in got if g[0] is not None]
        assert got_nonnull == expect
        if None in cnt:
            assert (None, cnt[None]) in got

    def test_k_pandas_udf(self, spark):
        sums: defaultdict = defaultdict(float)
        for f, e, d in _cols(
            "lineitem", ["l_returnflag", "l_extendedprice", "l_discount"]
        ):
            sums[f] += round(e * (1 - d), 6)
        expect = [(f, round(s, 4)) for f, s in sorted(sums.items())]
        got = [
            (r["l_returnflag"], r["disc_total"])
            for r in run(spark, "k_pandas_udf")
        ]
        assert got == expect

    def test_k_grouped_agg_udaf(self, spark):
        num: defaultdict = defaultdict(float)
        den: defaultdict = defaultdict(float)
        for f, e, q in _cols(
            "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
        ):
            num[f] += e * q
            den[f] += q
        expect = [(f, round(num[f] / den[f], 4)) for f in sorted(num)]
        got = [
            (r["l_returnflag"], r["wavg_price"])
            for r in run(spark, "k_grouped_agg_udaf")
        ]
        assert got == expect

    def test_k_grouped_map(self, spark):
        rows = [
            (p, k, round(t * 100))
            for p, k, t in _cols(
                "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"]
            )
        ]
        by_p: defaultdict = defaultdict(list)
        for p, k, c in rows:
            by_p[p].append((c, k))
        expect = []
        for p in sorted(by_p):
            top2 = sorted(by_p[p], key=lambda t: (-t[0], t[1]))[:2]
            expect += [(p, k, c) for c, k in top2]
        got = [
            (r["o_orderpriority"], r["o_orderkey"], r["cents"])
            for r in run(spark, "k_grouped_map")
        ]
        assert got == expect

    def test_k_udtf(self, spark):
        cnt: Counter = Counter()
        for (text,) in _cols("documents", ["text"]):
            if text is None:
                continue
            for w in text.split(" "):
                if w:
                    cnt[len(w)] += 1
        expect = sorted(cnt.items())
        got = [(r["word_len"], r["cnt"]) for r in run(spark, "k_udtf")]
        assert got == expect


class TestGeoMultiresRollup:
    def test_matches_pure_python(self, spark):
        pts = [
            (e, v)
            for e, v in _cols("events", ["event_id", "value"])
            if e is not None
        ]

        def cell(e):
            lat = 39.87 + ((((e % 1000003) * 48271) % 1000003 + 1000003) % 1000003) / 1000003.0 * 0.27
            lon = -75.28 + ((((e % 999983) * 69621) % 999983 + 999983) % 999983) / 999983.0 * 0.32
            return (
                math.floor((lon - (-75.28)) / 0.01),
                math.floor((lat - 39.87) / 0.01),
            )

        cells: defaultdict = defaultdict(lambda: [0, 0.0])
        blocks: defaultdict = defaultdict(lambda: [0, 0.0])
        for e, v in pts:
            cx, cy = cell(e)
            bx, by = math.floor(cx / 4.0), math.floor(cy / 4.0)
            for d in (cells[(bx, by, cx, cy)], blocks[(bx, by)]):
                d[0] += 1
                d[1] += v or 0.0
        rows = [
            ("cell", bx, by, cx, cy, n, round(sv, 2))
            for (bx, by, cx, cy), (n, sv) in cells.items()
        ] + [
            ("block", bx, by, None, None, n, round(sv, 2))
            for (bx, by), (n, sv) in blocks.items()
        ]

        def key(r):
            # ORDER BY n_events DESC, lvl, block_x, block_y,
            #          cx NULLS FIRST, cy NULLS FIRST
            return (
                -r[5],
                r[0],
                r[1],
                r[2],
                (r[3] is not None, r[3]),
                (r[4] is not None, r[4]),
            )

        expect = sorted(rows, key=key)[:25]
        got = [
            (
                r["lvl"],
                r["block_x"],
                r["block_y"],
                r["cx"],
                r["cy"],
                r["n_events"],
                r["sum_value"],
            )
            for r in run(spark, "geo_multires_rollup")
        ]
        assert got == expect
