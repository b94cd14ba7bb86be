"""Round-12 vector-fold micro-bench (VERDICT r11 'Next round' item 7).

Quantifies the gap between the engine's EXACT interpreted higher-order
vector scoring (zip_with + aggregate — the oracle-path semantics: a
strict left-to-right IEEE-double fold, bit-reproducible in DuckDB) and
the mapInArrow + numpy scale path (vectorized dot products — changes
the summation order, so results can differ in the last ulp), plus the
JVM posexplode/agg alternative. Output feeds the tolerance-contract
proposal in SURVEY.md §22: no semantics change this round.

Usage: python scripts/vector_fold_microbench_r12.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from parking_violations_data_pipeline_spark.catalog import load_table
    from parking_violations_data_pipeline_spark.functions.vector import dot, norm
    from parking_violations_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="vector-fold-ab")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    row = e.filter(F.col("vec_id") == 0).head()
    qv = [float(x) for x in row["v"]]
    import math

    qn = math.sqrt(sum(x * x for x in qv))
    qlit = F.array(*[F.lit(x) for x in qv])

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def interp():
        sim = F.try_divide(dot(F.col("v"), qlit), norm(F.col("v")) * F.lit(qn))
        return e.select("vec_id", sim.alias("sim"))

    def arrow():
        import pyarrow as pa

        def score(batches):
            import numpy as np

            q = np.array(qv)
            qn_ = np.sqrt((q * q).sum())
            for b in batches:
                ids = b.column("vec_id")
                m = np.vstack(b.column("v").to_numpy(zero_copy_only=False))
                dots = m @ q
                norms = np.sqrt((m * m).sum(axis=1)) * qn_
                with __import__("numpy").errstate(divide="ignore", invalid="ignore"):
                    sims = dots / norms
                yield pa.record_batch(
                    {"vec_id": ids, "sim": pa.array(sims, type=pa.float64())}
                )

        return e.mapInArrow(score, "vec_id long, sim double")

    def exploded():
        ex = e.select("vec_id", F.posexplode("v").alias("i", "x"))
        qdf = spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(qv)], "i int, q double"
        )
        j = ex.join(F.broadcast(qdf), "i")
        agg = j.groupBy("vec_id").agg(
            F.sum(F.col("x") * F.col("q")).alias("d"),
            F.sum(F.col("x") * F.col("x")).alias("n2"),
        )
        return agg.select(
            "vec_id", F.try_divide(F.col("d"), F.sqrt("n2") * F.lit(qn)).alias("sim")
        )

    variants = {"interpreted_fold": interp, "mapinarrow_numpy": arrow, "posexplode_agg": exploded}
    times = {}
    for name, fn in variants.items():
        noop(fn())  # warm
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            noop(fn())
            ts.append(time.perf_counter() - t0)
        times[name] = round(min(ts) * 1000)

    # numeric gap: exact fold vs numpy on the same rows
    a = {r["vec_id"]: r["sim"] for r in interp().collect()}
    b = {r["vec_id"]: r["sim"] for r in arrow().collect()}
    import struct

    def ulps(x: float, y: float) -> int:
        if x == y:
            return 0
        ix = struct.unpack("<q", struct.pack("<d", x))[0]
        iy = struct.unpack("<q", struct.pack("<d", y))[0]
        return abs(ix - iy)

    diffs = [
        ulps(a[k], b[k])
        for k in a
        if a[k] is not None and b[k] is not None and not (a[k] != a[k])
    ]
    n_vec = e.count()
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "times_ms": times,
        "numeric_gap_ulps": {
            "max": max(diffs) if diffs else 0,
            "mean": round(sum(diffs) / len(diffs), 3) if diffs else 0,
            "pct_exact": round(
                100 * sum(1 for d in diffs if d == 0) / len(diffs), 2
            ) if diffs else 100.0,
        },
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
