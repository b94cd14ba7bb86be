"""Round-8 geo family: independent derivations + plan pins.

Part 1 re-derives every geo_* entry's expected output from raw parquet
with pure Python (math module, dicts, textbook ray casting) — no
engine code, no oracle SQL — and compares against the engine at
sf0.001. This is the third leg of the triangle (engine / DuckDB
oracle / independent rederivation): a defect both authored sides
share cannot hide from it.

Part 2 pins the physical plans the family advertises: the argmin fold
and the polygon fold must stay map-only single-scan (no join), the
kNN must be a broadcast EQUI-join (never a cartesian), and the
density self-join must never degrade to CartesianProduct.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

SF = "/root/testdata/sf0.001"

from parking_violations_data_pipeline_spark.queries.geo import (  # noqa: E402
    _BOXES,
    _POLYGONS,
    _QPOINTS,
    _ZONES,
)


def run(spark, name: str):
    all_queries()
    return REGISTRY[name].fn(spark, SF).toPandas()


def _plan_nodes(tree: str):
    """Parse a SparkPlan treeString into (node, subtree, children)
    triples, where children is [(child_node, child_subtree)] for the
    DIRECT children only. Depth is the tree-glyph prefix width (glyphs
    are drawn from ' :+-'; node names always start with a letter)."""
    lines = [ln for ln in tree.splitlines() if ln.strip()]
    depths = [len(ln) - len(ln.lstrip(" :+-")) for ln in lines]
    out = []
    for i, (ln, d) in enumerate(zip(lines, depths)):
        j = i + 1
        while j < len(lines) and depths[j] > d:
            j += 1
        sub = "\n".join(lines[i:j])
        children = []
        k = i + 1
        while k < j:
            if depths[k] == d + 3:
                m = k + 1
                while m < j and depths[m] > depths[k]:
                    m += 1
                children.append((lines[k], "\n".join(lines[k:m])))
                k = m
            else:
                k += 1
        out.append((ln, sub, children))
    return out


def plan(spark, name: str) -> str:
    """Operator TREE of the formatted plan (the detail sections
    re-print every node header, which would double-count scans)."""
    all_queries()
    df = REGISTRY[name].fn(spark, SF)
    full = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return full.split("\n\n")[0]


def points() -> list[dict]:
    """Pure-python mirror of the coordinate derivation."""
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value", "ts"]
    )
    out = []
    for eid, uid, val, ts in zip(
        t.column("event_id").to_pylist(),
        t.column("user_id").to_pylist(),
        t.column("value").to_pylist(),
        t.column("ts").to_pylist(),
    ):
        if eid is None:
            continue
        u = ((eid % 1000003) * 48271) % 1000003 % 1000003
        u = (u + 1000003) % 1000003
        v = ((eid % 999983) * 69621) % 999983
        v = (v + 999983) % 999983
        lat = 39.87 + u / 1000003.0 * 0.27
        lon = -75.28 + v / 999983.0 * 0.32
        out.append(
            {"eid": eid, "uid": uid, "val": val, "ts": ts, "lat": lat, "lon": lon}
        )
    return out


def d2(lat, lon, clat, clon):
    return (lat - clat) * (lat - clat) + ((lon - clon) * 0.766) * (
        (lon - clon) * 0.766
    )


class TestIndependentDerivation:
    def test_grid_hotspots(self, spark):
        got = run(spark, "geo_grid_hotspots")
        cells: dict[tuple[int, int], list] = {}
        for p in points():
            cx = int(math.floor((p["lon"] - (-75.28)) / 0.01))
            cy = int(math.floor((p["lat"] - 39.87) / 0.01))
            cells.setdefault((cx, cy), []).append(p)
        ranked = sorted(
            cells.items(), key=lambda kv: (-len(kv[1]), kv[0][1] * 32 + kv[0][0])
        )[:20]
        assert len(got) == len(ranked)
        for row, ((cx, cy), ps) in zip(got.itertuples(), ranked):
            assert (row.cell_id, row.cx, row.cy) == (cy * 32 + cx, cx, cy)
            assert row.n_events == len(ps)
            assert row.n_users == len({p["uid"] for p in ps if p["uid"] is not None})
            assert row.sum_value == pytest.approx(
                round(sum(p["val"] for p in ps if p["val"] is not None), 2), abs=1e-9
            )

    def test_zone_assign(self, spark):
        got = run(spark, "geo_zone_assign").set_index("zone_id")
        agg: dict[int, list] = {}
        for p in points():
            best = min(
                (d2(p["lat"], p["lon"], clat, clon), zid)
                for zid, _, clat, clon in _ZONES
            )
            agg.setdefault(best[1], []).append((best[0], p))
        assert set(got.index) == set(agg)
        for zid, rows in agg.items():
            r = got.loc[zid]
            assert r["n_events"] == len(rows)
            km = [math.sqrt(dd) * 111.32 for dd, _ in rows]
            assert r["avg_km"] == pytest.approx(
                round(sum(km) / len(km), 4), abs=1e-8
            )

    def test_bbox_join(self, spark):
        got = run(spark, "geo_bbox_join").set_index("box_id")
        pts = points()
        for bid, _, lat_lo, lat_hi, lon_lo, lon_hi in _BOXES:
            hits = [
                p
                for p in pts
                if lat_lo <= p["lat"] <= lat_hi and lon_lo <= p["lon"] <= lon_hi
            ]
            if not hits:
                assert bid not in got.index
                continue
            r = got.loc[bid]
            assert r["n_events"] == len(hits)
            assert r["coverage_ppm"] == math.floor(len(hits) * 1000000 / len(pts))

    def test_trip_segments(self, spark):
        got = run(spark, "geo_trip_segments")
        by_user: dict[int, list] = {}
        for p in points():
            if p["ts"] is None or p["uid"] is None:
                continue
            by_user.setdefault(p["uid"], []).append(p)
        totals = {}
        for uid, ps in by_user.items():
            ps.sort(key=lambda p: (p["ts"], p["eid"]))
            segs = []
            for a, b in zip(ps, ps[1:]):
                s1 = math.sin((b["lat"] - a["lat"]) * math.pi / 360.0)
                s2 = math.sin((b["lon"] - a["lon"]) * math.pi / 360.0)
                h = s1 * s1 + math.cos(a["lat"] * math.pi / 180.0) * math.cos(
                    b["lat"] * math.pi / 180.0
                ) * s2 * s2
                km = 2.0 * math.asin(math.sqrt(h)) * 6371.0
                segs.append(int(round(km * 1000.0, 0)))
            if segs:
                totals[uid] = (len(segs), sum(segs), max(segs))
        top = sorted(totals.items(), key=lambda kv: (-kv[1][1], kv[0]))[:15]
        assert len(got) == len(top)
        for row, (uid, (n, tot, mx)) in zip(got.itertuples(), top):
            assert row.user_id == uid
            assert (row.n_segments, row.total_m, row.max_seg_m) == (n, tot, mx)

    def test_point_in_polygon(self, spark):
        got = run(spark, "geo_point_in_polygon").set_index("poly_id")
        pts = points()
        for pid, (name, verts) in _POLYGONS.items():
            inside = []
            for p in pts:
                crossings = 0
                for i, (x1, y1) in enumerate(verts):
                    x2, y2 = verts[(i + 1) % len(verts)]
                    if (y1 > p["lat"]) != (y2 > p["lat"]) and p["lon"] < x1 + (
                        x2 - x1
                    ) * (p["lat"] - y1) / (y2 - y1):
                        crossings += 1
                if crossings % 2 == 1:
                    inside.append(p)
            if not inside:
                assert pid not in got.index
                continue
            r = got.loc[pid]
            assert r["pname"] == name
            assert r["n_inside"] == len(inside)
            assert r["n_users"] == len(
                {p["uid"] for p in inside if p["uid"] is not None}
            )

    def test_knn_grid(self, spark):
        got = run(spark, "geo_knn_grid")
        pts = points()
        for p in pts:
            p["cx"] = int(math.floor((p["lon"] - (-75.28)) / 0.01))
            p["cy"] = int(math.floor((p["lat"] - 39.87) / 0.01))
        expect = []
        for qid, qlat, qlon in _QPOINTS:
            qcx = int(math.floor((qlon - (-75.28)) / 0.01))
            qcy = int(math.floor((qlat - 39.87) / 0.01))
            cand = [
                p
                for p in pts
                if abs(p["cx"] - qcx) <= 1 and abs(p["cy"] - qcy) <= 1
            ]
            cand.sort(key=lambda p: (d2(p["lat"], p["lon"], qlat, qlon), p["eid"]))
            for rk, p in enumerate(cand[:5], 1):
                expect.append(
                    (
                        qid,
                        rk,
                        p["eid"],
                        round(
                            math.sqrt(d2(p["lat"], p["lon"], qlat, qlon)) * 111.32,
                            4,
                        ),
                    )
                )
        assert len(got) == len(expect)
        for row, (qid, rk, eid, km) in zip(got.itertuples(), expect):
            assert (row.qid, row.rk, row.event_id) == (qid, rk, eid)
            assert row.d_km == pytest.approx(km, abs=1e-9)

    def test_density_core(self, spark):
        got = run(spark, "geo_density_core").iloc[0]
        pts = points()
        for p in pts:
            p["fx"] = int(math.floor((p["lon"] - (-75.28)) / 0.002))
            p["fy"] = int(math.floor((p["lat"] - 39.87) / 0.002))
        by_cell: dict[tuple[int, int], list] = {}
        for p in pts:
            by_cell.setdefault((p["fx"], p["fy"]), []).append(p)
        n_core = sum_n = max_n = 0
        for p in pts:
            n = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for b in by_cell.get((p["fx"] + dx, p["fy"] + dy), ()):
                        if b["eid"] != p["eid"] and d2(
                            b["lat"], b["lon"], p["lat"], p["lon"]
                        ) <= 0.000004:
                            n += 1
            if n >= 3:
                n_core += 1
                sum_n += n
                max_n = max(max_n, n)
        assert int(got["n_points"]) == len(pts)
        assert int(got["n_core"]) == n_core
        assert int(got["sum_neighbors"]) == sum_n
        assert int(got["max_neighbors"]) == max_n


class TestPlanPins:
    def test_zone_assign_is_map_only_fold(self, spark):
        p = plan(spark, "geo_zone_assign")
        assert "Join" not in p, "argmin fold must not plan a join"
        assert p.count("Scan parquet") == 1

    def test_point_in_polygon_single_scan_no_join(self, spark):
        p = plan(spark, "geo_point_in_polygon")
        assert "Join" not in p
        assert p.count("Scan parquet") == 1, "explode shape regressed to per-polygon unions"

    def test_knn_is_broadcast_equi_join(self, spark):
        p = plan(spark, "geo_knn_grid")
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p and "NestedLoop" not in p

    def test_bbox_is_broadcast_nested_loop(self, spark):
        p = plan(spark, "geo_bbox_join")
        assert "BroadcastNestedLoopJoin" in p, "range join must broadcast the 5-row dim"
        assert "CartesianProduct" not in p

    def test_density_self_join_is_equi(self, spark):
        p = plan(spark, "geo_density_core")
        assert "CartesianProduct" not in p
        # the neighbor search itself must be an equi-join; nested-loop
        # joins are allowed ONLY as 1-row scalar attaches (the total
        # count and the round-9 hot-cell guard each broadcast a scalar
        # aggregate). Rather than pin a count that goes stale when a
        # guard is added, assert the STRUCTURE: every BNLJ's broadcast
        # build side must be a grand (keys=[]) aggregate — guaranteed
        # single-row — so a real quadratic regression (broadcasting a
        # table side) still fails loudly.
        assert "BroadcastHashJoin" in p or "SortMergeJoin" in p or "ShuffledHashJoin" in p
        all_queries()
        df = REGISTRY["geo_density_core"].fn(spark, SF)
        tree = df._jdf.queryExecution().executedPlan().treeString()
        for node, subtree, children in _plan_nodes(tree):
            if "BroadcastNestedLoopJoin" not in node:
                continue
            builds = [
                (c, s) for c, s in children if "BroadcastExchange" in c
            ]
            assert len(builds) == 1, f"BNLJ without a broadcast build side:\n{node}"
            assert "HashAggregate(keys=[]" in builds[0][1], (
                "BNLJ build side is not a scalar aggregate (not 1-row):\n"
                + builds[0][1]
            )

    def test_trip_segments_one_window_shuffle(self, spark):
        p = plan(spark, "geo_trip_segments")
        assert "CartesianProduct" not in p
        assert "Window" in p


class TestIndependentDerivationSession2:
    def test_od_matrix(self, spark):
        got = run(spark, "geo_od_matrix")
        pts = [p for p in points() if p["ts"] is not None and p["uid"] is not None]
        for p in pts:
            p["zone"] = min(
                (d2(p["lat"], p["lon"], clat, clon), zid)
                for zid, _, clat, clon in _ZONES
            )[1]
        by_user: dict[int, list] = {}
        for p in pts:
            by_user.setdefault(p["uid"], []).append(p)
        flows: dict[tuple[int, int], int] = {}
        for ps in by_user.values():
            ps.sort(key=lambda p: (p["ts"], p["eid"]))
            for a, b in zip(ps, ps[1:]):
                flows[(a["zone"], b["zone"])] = flows.get((a["zone"], b["zone"]), 0) + 1
        expect = sorted(flows.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
        assert len(got) == len(expect)
        for row, ((src, dst), n) in zip(got.itertuples(), expect):
            assert (row.src, row.dst, row.n_trips) == (src, dst, n)

    def test_geofence_alerts(self, spark):
        import datetime

        got = run(spark, "s_geofence_alerts")
        pts = [p for p in points() if p["ts"] is not None]
        agg: dict[tuple[int, datetime.datetime], list] = {}
        from parking_violations_data_pipeline_spark.queries.geo import _BOXES

        for bid, _, lat_lo, lat_hi, lon_lo, lon_hi in _BOXES:
            for p in pts:
                if lat_lo <= p["lat"] <= lat_hi and lon_lo <= p["lon"] <= lon_hi:
                    day = p["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
                    agg.setdefault((bid, day), []).append(p)
        expect = sorted(agg.items(), key=lambda kv: kv[0])
        assert len(got) == len(expect)
        for row, ((bid, day), ps) in zip(got.itertuples(), expect):
            assert (row.box_id, row.day) == (bid, day)
            assert row.n_events == len(ps)
            vals = [p["val"] for p in ps if p["val"] is not None]
            if vals:
                assert row.sum_value == pytest.approx(round(sum(vals), 2), abs=1e-9)
