"""Scaling exponents for the round-8 families: geo_* and t_winnow_*.

Three scaling regimes, because the families' true output masses scale
differently and an honest exponent must measure the PLAN, not the
output (the r7/r8 lesson behind scale_exponents.py's exclusion list
and dedup_exponents.py's salted corpus):

  * geo linear class (hotspots, zone assign, trips, grid kNN):
    key-shifted event replicas at 100x/1000x. The Lehmer coordinate
    mix spreads shifted event_ids uniformly over the same city box,
    so rows grow 10x between points and output stays bounded (top-20
    cells / 8 zones / top-15 users / 20 kNN rows) — the exponent is
    pure plan.
  * geo_density_core: replication DENSIFIES the fixed city box, so
    true eps-neighbor mass grows ~quadratically in the copy factor —
    by construction, not by plan defect (a real 100 TB geo corpus
    grows area/days at bounded density instead). Measured at 3x/10x
    and fitted against the NEIGHBOR MASS its own output reports
    (sum_neighbors), which is the work actually demanded.
  * winnow fingerprints: dedup_exponents' per-copy word-salted corpus
    (within-copy fingerprint structure preserved exactly, zero
    cross-copy fingerprint collisions, doc_id%50 bench membership
    preserved because the 1e6 id stride is divisible by 50) — true
    match mass grows linearly, exponent measures the plan.

Usage:
    python scripts/geo_winnow_exponents.py [--out=FILE]
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GEO_LINEAR = [
    "geo_grid_hotspots",
    "geo_zone_assign",
    "geo_trip_segments",
    "geo_knn_grid",
]


def _time(spark, registry, name: str, src: str) -> tuple[float, int, object]:
    t0 = time.perf_counter()
    rows = registry[name].fn(spark, src).collect()
    sec = round(time.perf_counter() - t0, 2)
    return sec, len(rows), rows


def build_events(spark, src: str, copies: int, out: str) -> None:
    """events-only replica (geo_* reads nothing else): the full
    scale_smoke build would also replicate lineitem — 26 GB at 1000x
    — for tables these ops never scan."""
    import os

    from pyspark.sql import functions as F

    from parking_violations_data_pipeline_spark.catalog import load_table

    os.makedirs(out, exist_ok=True)
    rep = F.broadcast(spark.range(copies).withColumnRenamed("id", "_rep"))
    e = load_table(spark, src, "events").repartition(32).crossJoin(rep)
    e = (
        e.withColumn("event_id", F.col("event_id") + F.col("_rep") * F.lit(10_000_000))
        .withColumn("user_id", F.col("user_id") + F.col("_rep") * F.lit(1_000_000))
        .drop("_rep")
    )
    e.write.mode("overwrite").parquet(f"{out}/events.parquet")


def main() -> None:
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    import scripts.dedup_exponents as DX
    import scripts.scale_smoke as SS
    from parking_violations_data_pipeline_spark.registry import (
        REGISTRY,
        all_queries,
    )
    from parking_violations_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="geo-winnow-exponents")
    all_queries()
    results: dict[str, dict] = {}

    # --- geo linear class: 100x / 1000x key-shifted events ---------
    base_out = SS.OUT
    for copies in (100, 1000):
        out = f"{base_out}_geo{copies}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        build_events(spark, SS.SRC, copies, out)
        print(f"# built geo {copies}x in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        REGISTRY["geo_grid_hotspots"].fn(spark, out).count()  # warm
        for rep in range(3):
            for name in GEO_LINEAR:
                sec, n, _ = _time(spark, REGISTRY, name, out)
                results.setdefault(name, {}).setdefault(f"t{copies}", []).append(sec)
                results[name][f"rows{copies}"] = n
                print(f"# {copies}x {name} rep{rep}: {sec}s ({n} rows)", file=sys.stderr)
        shutil.rmtree(out, ignore_errors=True)
    for name in GEO_LINEAR:
        r = results[name]
        r["exponent_min"] = round(
            math.log(min(r["t1000"]) / min(r["t100"])) / math.log(10), 3
        )
        r["regime"] = "rows x10, output bounded; min of 3 interleaved repeats"

    # --- density core: 3x / 10x, fitted against neighbor mass ------
    dens: dict[str, object] = {}
    for copies in (3, 10):
        out = f"{base_out}_dens{copies}"
        shutil.rmtree(out, ignore_errors=True)
        build_events(spark, SS.SRC, copies, out)
        for rep in range(3):
            sec, _, rows = _time(spark, REGISTRY, "geo_density_core", out)
            row = rows[0].asDict()
            dens.setdefault(f"t{copies}", []).append(sec)
            dens[f"mass{copies}"] = int(row["sum_neighbors"])
            dens[f"n_points{copies}"] = int(row["n_points"])
            print(f"# dens {copies}x rep{rep}: {sec}s mass={row['sum_neighbors']}", file=sys.stderr)
        shutil.rmtree(out, ignore_errors=True)
    dens["exponent_vs_mass"] = round(
        math.log(min(dens["t10"]) / min(dens["t3"]))
        / math.log(dens["mass10"] / dens["mass3"]),
        3,
    )
    dens["regime"] = (
        "densified box: true eps-neighbor mass grows ~quadratically in "
        "copies by construction; exponent fitted against that mass"
    )
    results["geo_density_core"] = dens

    # --- winnow: salted corpus, 100x / 1000x ------------------------
    for copies in (100, 1000):
        out = f"{DX.OUT_BASE}_w{copies}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        DX.build(spark, copies, out)
        print(f"# built winnow {copies}x in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        for rep in range(2):
            for name in ("t_winnow_decontam", "t_winnow_neardup_pairs"):
                t0 = time.perf_counter()
                n = REGISTRY[name].fn(spark, out).count()
                sec = round(time.perf_counter() - t0, 2)
                results.setdefault(name, {}).setdefault(f"t{copies}", []).append(sec)
                results[name][f"rows{copies}"] = n
                print(f"# {copies}x {name} rep{rep}: {sec}s ({n} rows)", file=sys.stderr)
        shutil.rmtree(out, ignore_errors=True)
    for name in ("t_winnow_decontam", "t_winnow_neardup_pairs"):
        r = results[name]
        r["exponent_min"] = round(
            math.log(min(r["t1000"]) / min(r["t100"])) / math.log(10), 3
        )
        r["regime"] = "salted corpus: linear true match mass; min of 2 repeats"

    payload = {
        "src": SS.SRC,
        "protocol": (
            "one warm session, NO concurrent load (the first r8 run was "
            "contaminated by foreground gate sweeps: same query/scale "
            "measured 92.3s contended vs 2.2s idle); interleaved repeats "
            "per (op, scale), exponent fitted on per-op MIN"
        ),
        "ops": results,
    }
    print(json.dumps(payload))
    if out_path:
        Path(out_path).write_text(json.dumps(payload, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
