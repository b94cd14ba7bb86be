"""Geo layout demo (round 8): prove geo_knn_grid's 100-TB claim — "with
a cell-partitioned layout the ring join would prune to 9 files" — from
EXECUTED-plan scan metrics, the layout_demo.py protocol.

Layout written once from the 100x events replica:
  .tmp/geo_layout/events/cx=NN/cy=NN/*.parquet   (0.01-deg grid cells)

Probes (all measured, not explain-text):
  ring   one kNN query point's 3x3 neighbor-cell ring as a (cx, cy)
         pair-IN filter — the scan must touch 9/864 partition dirs
  bbox   one enforcement box as cx/cy BETWEEN ranges — the scan must
         touch only the box's cell rectangle
  full   unfiltered control scan (the denominator)

Usage: python scripts/geo_layout_demo.py [--out=FILE]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from parking_violations_data_pipeline_spark.queries.geo import (  # noqa: E402
    CX_SQL,
    CY_SQL,
    LAT_SQL,
    LON_SQL,
)
from parking_violations_data_pipeline_spark.session import get_spark  # noqa: E402
from scripts.geo_winnow_exponents import build_events  # noqa: E402
from scripts.layout_demo import count_files, scan_metrics  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE = os.path.join(REPO, ".tmp", "geo_stage100")
OUT = os.path.join(REPO, ".tmp", "geo_layout")


def main() -> None:
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    spark = get_spark(app_name="geo-layout-demo")
    report: dict[str, object] = {"src": SRC, "copies": 100}

    shutil.rmtree(STAGE, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)
    build_events(spark, SRC, 100, STAGE)

    t0 = time.perf_counter()
    pts = (
        spark.read.parquet(f"{STAGE}/events.parquet")
        .filter(F.col("event_id").isNotNull())
        .withColumn("lat", F.expr(LAT_SQL))
        .withColumn("lon", F.expr(LON_SQL))
        .withColumn("cx", F.expr(CX_SQL))
        .withColumn("cy", F.expr(CY_SQL))
        .drop("lat", "lon")
    )
    # one file per cell: the writer shuffle keys on the partition
    # columns so each dir gets one compact file instead of 32 shards
    pts.repartition("cx", "cy").write.partitionBy("cx", "cy").mode(
        "overwrite"
    ).parquet(f"{OUT}/events")
    nf, nd = count_files(f"{OUT}/events")
    report["layout"] = {
        "files": nf,
        "partition_dirs": nd,
        "write_s": round(time.perf_counter() - t0, 1),
    }
    print(f"# layout: {nf} files in {nd} cell dirs", file=sys.stderr)

    ev = spark.read.parquet(f"{OUT}/events")

    # control: full scan
    full = ev.agg(F.count("*").alias("n"))
    n_total = full.collect()[0]["n"]
    report["full"] = {"rows": n_total, "scan": scan_metrics(full)}

    # ring probe: query point 1's 3x3 neighbor cells
    qlat, qlon = 39.9502, -75.1651
    qcx = int(math.floor((qlon - (-75.28)) / 0.01))
    qcy = int(math.floor((qlat - 39.87) / 0.01))
    ring_cells = [(qcx + dx, qcy + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    cond = None
    for cx, cy in ring_cells:
        c = (F.col("cx") == cx) & (F.col("cy") == cy)
        cond = c if cond is None else (cond | c)
    ring = ev.filter(cond).agg(F.count("*").alias("n"))
    ring_rows = ring.collect()[0]["n"]
    report["ring"] = {
        "cells": ring_cells,
        "rows": ring_rows,
        "scan": scan_metrics(ring),
    }
    print(f"# ring: {report['ring']['scan']}", file=sys.stderr)

    # bbox probe: enforcement box 5 (core_overlap) as cell ranges
    cx_lo = int(math.floor((-75.18 - (-75.28)) / 0.01))
    cx_hi = int(math.floor((-75.08 - (-75.28)) / 0.01))
    cy_lo = int(math.floor((39.92 - 39.87) / 0.01))
    cy_hi = int(math.floor((40.02 - 39.87) / 0.01))
    bbox = (
        ev.filter(
            F.col("cx").between(cx_lo, cx_hi) & F.col("cy").between(cy_lo, cy_hi)
        )
        .agg(F.count("*").alias("n"))
    )
    bbox_rows = bbox.collect()[0]["n"]
    report["bbox"] = {
        "cx": [cx_lo, cx_hi],
        "cy": [cy_lo, cy_hi],
        "rows": bbox_rows,
        "scan": scan_metrics(bbox),
    }
    print(f"# bbox: {report['bbox']['scan']}", file=sys.stderr)

    print(json.dumps(report))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()
    shutil.rmtree(STAGE, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
