"""100x -> 1000x scaling exponents for the LLM-pipeline dedup/ANN
flagships (round 8, VERDICT item 7).

Why these need their own harness: scale_smoke's key-shifted replicas
keep document TEXT identical across copies, so every copy of doc X is
a true near-dup of every other copy — the TRUE pair mass grows
quadratically in the copy factor and a time-vs-rows exponent conflates
output growth with plan growth (r7 recorded the pair-bound argument
instead of an exponent). This harness replicates documents with a
PER-COPY WORD SALT: every inter-word space gains a copy-unique suffix
token tail (`regexp_replace(text, ' ', concat('x', rep, ' '))`), so

  - WITHIN a copy, shingle-equality structure is preserved EXACTLY
    (w1xR w2xR w3xR matches iff w1 w2 w3 matched): every true dup
    pair of the base corpus exists in every copy, with identical
    Jaccard;
  - ACROSS copies, every shingle differs (each word carries its
    copy's suffix): zero cross-copy pairs.

True pair mass therefore grows LINEARLY in copies, and the fitted
exponent measures the pipeline's plan — exactly the quantity a 100 TB
deployment cares about, where the dup rate is a data property that
does NOT grow with corpus size.

Embeddings are key-shifted as usual (the ANN query path's cost is
rows-scanned, not pair-mass).

Ops: MinHash signature+LSH banding+verify (pairs), the full
find->cluster->survivor chain (CC + keep-longest), and the IVF+PQ
query path (j_ivf_pq's operator composition at corpus scale).

Usage:
    python scripts/dedup_exponents.py [--lo=100] [--hi=1000] [--out=FILE]
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

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_BASE = str(REPO / ".tmp" / "dedup_scale")


def build(spark, copies: int, out: str) -> None:
    from pyspark.sql import functions as F

    from parking_violations_data_pipeline_spark.catalog import load_table

    os.makedirs(out, exist_ok=True)
    rep = F.broadcast(spark.range(copies).withColumnRenamed("id", "_rep"))

    d = load_table(spark, SRC, "documents").repartition(32).crossJoin(rep)
    d = (
        d.withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(1_000_000))
        .withColumn(
            "text",
            F.regexp_replace(
                F.col("text"),
                F.lit(" "),
                F.concat(F.lit("x"), F.col("_rep").cast("string"), F.lit(" ")),
            ),
        )
        .drop("_rep")
    )
    d.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    e = load_table(spark, SRC, "embeddings").repartition(32).crossJoin(rep)
    e = e.withColumn(
        "vec_id", F.col("vec_id") + F.col("_rep") * F.lit(1_000_000)
    ).drop("_rep")
    e.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> None:
    lo, hi, out_path = 100, 1000, None
    for a in sys.argv[1:]:
        if a.startswith("--lo="):
            lo = int(a.split("=", 1)[1])
        elif a.startswith("--hi="):
            hi = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from parking_violations_data_pipeline_spark.catalog import load_table
    from parking_violations_data_pipeline_spark.operators import dedup as DD
    from parking_violations_data_pipeline_spark.operators import similarity as S
    from parking_violations_data_pipeline_spark.operators.graph import (
        connected_components,
    )
    from parking_violations_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dedup-exponents")

    def op_lsh_pairs(sf_dir: str) -> int:
        d = load_table(spark, sf_dir, "documents")
        return DD.minhash_lsh_neardups(d, threshold=0.5).count()

    def op_dedup_chain(sf_dir: str) -> int:
        """find -> cluster -> keep-longest survivor: the 100-TB path."""
        d = load_table(spark, sf_dir, "documents")
        pairs = DD.minhash_lsh_neardups(d, threshold=0.5)
        labels = connected_components(pairs, src="id_a", dst="id_b")
        member = labels.groupBy("node").agg(F.min("label").alias("cluster_id"))
        ranked = member.join(
            d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
        ).withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.desc("n_chars"), F.col("node")
                )
            ),
        )
        losers = ranked.filter(F.col("rn") > 1).select(F.col("node").alias("doc_id"))
        return d.join(losers, "doc_id", "left_anti").count()

    def op_ivf_pq_query(sf_dir: str) -> int:
        """IVF coarse quantizer + PQ/ADC shortlist + exact re-rank —
        the billion-scale ANN query composition (j_ivf_pq's operator
        path without the gate-scale acceptance twin)."""
        e = load_table(spark, sf_dir, "embeddings")
        row = e.filter(F.col("vec_id") == 0).select("embedding").head()
        qv = [float(x) for x in row["embedding"]]
        return S.ivf_knn(e, qv, k=10, n_clusters=16).count()

    ops = {
        "minhash_lsh_pairs": op_lsh_pairs,
        "dedup_chain_cc_survivor": op_dedup_chain,
        "ivf_query_path": op_ivf_pq_query,
    }

    results: dict[str, dict] = {name: {} for name in ops}
    for copies in (lo, hi):
        out = f"{OUT_BASE}_x{copies}"
        if not os.path.exists(f"{out}/documents.parquet"):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.perf_counter()
            build(spark, copies, out)
            print(f"# built salted {copies}x in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        # warm at this scale point; discarded
        load_table(spark, out, "documents").count()
        for name, fn in ops.items():
            t0 = time.perf_counter()
            n = fn(out)
            sec = round(time.perf_counter() - t0, 2)
            results[name][f"t{copies}"] = sec
            results[name][f"rows{copies}"] = n
            print(f"# {copies}x {name}: {sec}s ({n} rows)", file=sys.stderr)

    for name, r in results.items():
        if r.get(f"t{lo}") and r.get(f"t{hi}"):
            r["exponent"] = round(
                math.log(r[f"t{hi}"] / r[f"t{lo}"]) / math.log(hi / lo), 3
            )
    payload = {
        "lo": lo,
        "hi": hi,
        "src": SRC,
        "corpus": "per-copy word-salted documents (linear true-pair mass)",
        "ops": results,
    }
    print(json.dumps(payload))
    if out_path:
        Path(out_path).write_text(json.dumps(payload, indent=1))
    spark.stop()
    for copies in (lo, hi):
        shutil.rmtree(f"{OUT_BASE}_x{copies}", ignore_errors=True)


if __name__ == "__main__":
    main()
