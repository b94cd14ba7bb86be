"""Round-9 scaling exponents for the new/changed geo entries.

  * geo_hotspots_approx vs geo_grid_hotspots at 100x/1000x — the
    verdict item-4 claim: replacing the exact-distinct (cell, user)
    pair shuffle with HyperLogLog++ takes the census exponent from
    ~1.33 (r8 attribution) to ~linear-or-better, since the sketch
    partials collapse map-side to <=864 cells at any volume.
  * geo_polygon_join at 100x/1000x — candidate equi-join against a
    broadcast ~200-row (cell, poly, edges) dim; map-only fold on
    candidates; output bounded at 24 rows. Expected ~1.0 (scan-bound).
  * geo_density_core at 3x/10x vs its own neighbor mass — re-measured
    because round 9 changed the fine binning to the metric axis
    (ring now covers the full eps-ball -> more true pairs) and added
    the hot-cell guard (one extra O(n) count agg on the path).

Protocol follows geo_winnow_exponents.py: key-shifted event replicas
(Lehmer mix spreads shifted ids over the same box), one warm session
per phase, idle box, interleaved repeats, min-fit.

PHASED + RESUMABLE (a first single-process run exceeded its 590 s
budget): corpora are cached across invocations, every repeat is
checkpointed to SCALE_EXPONENTS_GEO_r9.partial.json, and each phase
runs in its own process:

    python scripts/geo_exponents_r9.py linear100
    python scripts/geo_exponents_r9.py linear1000
    python scripts/geo_exponents_r9.py density
    python scripts/geo_exponents_r9.py finalize   # writes the artifact
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LINEAR = ["geo_hotspots_approx", "geo_grid_hotspots", "geo_polygon_join"]
PARTIAL = REPO / "SCALE_EXPONENTS_GEO_r9.partial.json"


def _load_partial() -> dict:
    if PARTIAL.exists():
        return json.loads(PARTIAL.read_text())
    return {}


def _save_partial(results: dict) -> None:
    PARTIAL.write_text(json.dumps(results, indent=2) + "\n")


def main() -> None:
    import scripts.scale_smoke as SS
    from scripts.geo_winnow_exponents import _time, build_events
    from parking_violations_data_pipeline_spark.registry import (
        REGISTRY,
        all_queries,
    )
    from parking_violations_data_pipeline_spark.session import get_spark

    phase = sys.argv[1] if len(sys.argv) > 1 else "finalize"
    results = _load_partial()

    if phase in ("linear100", "linear1000"):
        copies = 100 if phase == "linear100" else 1000
        spark = get_spark(app_name=f"geo-exp-r9-{phase}")
        all_queries()
        out = f"{SS.OUT}_geo9_{copies}"
        if not os.path.exists(f"{out}/events.parquet/_SUCCESS"):
            t0 = time.perf_counter()
            build_events(spark, SS.SRC, copies, out)
            print(
                f"# built {copies}x in {time.perf_counter()-t0:.0f}s",
                file=sys.stderr,
            )
        REGISTRY["geo_grid_hotspots"].fn(spark, out).count()  # warm
        for rep in range(3):
            for name in LINEAR:
                if len(results.get(name, {}).get(f"t{copies}", [])) > rep:
                    continue  # resumed: this repeat already recorded
                sec, n, _ = _time(spark, REGISTRY, name, out)
                results.setdefault(name, {}).setdefault(
                    f"t{copies}", []
                ).append(sec)
                results[name][f"rows{copies}"] = n
                _save_partial(results)
                print(
                    f"# {copies}x {name} rep{rep}: {sec}s ({n} rows)",
                    file=sys.stderr,
                )
        spark.stop()
        return

    if phase == "density":
        spark = get_spark(app_name="geo-exp-r9-density")
        all_queries()
        dens: dict = results.get("geo_density_core", {})
        for copies in (3, 10):
            out = f"{SS.OUT}_dens9_{copies}"
            if len(dens.get(f"t{copies}", [])) >= 3:
                continue
            if not os.path.exists(f"{out}/events.parquet/_SUCCESS"):
                build_events(spark, SS.SRC, copies, out)
            for rep in range(3):
                if len(dens.get(f"t{copies}", [])) > rep:
                    continue
                sec, _, rows = _time(spark, REGISTRY, "geo_density_core", out)
                row = rows[0].asDict()
                dens.setdefault(f"t{copies}", []).append(sec)
                dens[f"mass{copies}"] = int(row["sum_neighbors"])
                dens[f"n_points{copies}"] = int(row["n_points"])
                results["geo_density_core"] = dens
                _save_partial(results)
                print(
                    f"# dens {copies}x rep{rep}: {sec}s mass={row['sum_neighbors']}",
                    file=sys.stderr,
                )
            shutil.rmtree(out, ignore_errors=True)
        spark.stop()
        return

    # ---- finalize: compute exponents, write the artifact, clean up
    for name in LINEAR:
        r = results[name]
        r["exponent_min"] = round(
            math.log(min(r["t1000"]) / min(r["t100"])) / math.log(10), 3
        )
        r["regime"] = "rows x10, output bounded; min of 3 interleaved repeats"
    dens = results["geo_density_core"]
    dens["exponent_vs_mass"] = round(
        math.log(min(dens["t10"]) / min(dens["t3"]))
        / math.log(dens["mass10"] / dens["mass3"]),
        3,
    )
    dens["regime"] = (
        "densified box (quadratic true mass by construction), metric-axis "
        "binning + hot-cell guard on the path; exponent fitted vs mass"
    )
    payload = {
        "src": SS.SRC,
        "protocol": (
            "idle box, one warm session per phase, per-repeat checkpointing, "
            "interleaved repeats, min-fit"
        ),
        "results": results,
    }
    out_file = REPO / "SCALE_EXPONENTS_GEO_r9.json"
    out_file.write_text(json.dumps(payload, indent=2) + "\n")
    print(
        json.dumps(
            {
                k: v.get("exponent_min", v.get("exponent_vs_mass"))
                for k, v in results.items()
            }
        )
    )
    print("wrote", out_file)
    for copies in (100, 1000):
        shutil.rmtree(f"{SS.OUT}_geo9_{copies}", ignore_errors=True)
    PARTIAL.unlink(missing_ok=True)


if __name__ == "__main__":
    main()
