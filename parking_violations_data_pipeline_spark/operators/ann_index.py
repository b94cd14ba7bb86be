"""Persisted ANN index: build once → query many (SURVEY.md §2 J8).

The round-8 verdict's watch item #1: `similarity.ivf_knn` retrains its
k-means quantizer on every invocation, so its measured "query path"
exponent (1.033) was really build+query — linear in corpus size. The
production shape separates the surfaces:

  * `ann_index_write(embeddings, path, ...)` — ONE pass that assigns
    every vector an inverted-list id (IVF k-means, or hyperplane-LSH
    for unbounded list counts where assignment is map-only) and writes
    the corpus parquet **partitioned by list_id**, plus tiny metadata
    tables (centroids / list stats). This is the amortized cost.
  * `ann_index_query(spark, path, qv, ...)` — reads the metadata
    (O(n_lists) rows), ranks the probe lists DRIVER-side, and scans
    ONLY the probed partition directories via the `basePath` option —
    the file listing itself touches n_probe directories, not all
    2^H of them, so query cost tracks the probed-list row mass, not
    the corpus (measured: SCALE_EXPONENTS_ANN_r9.json).

PQ gets the same split: `pq_index_write` persists the codes relation
(8 bytes/vector at m=8) + codebook; `pq_index_query` scores ADC over
the codes scan, then re-ranks an exact shortlist fetched with an
`isin` pushed filter (row-group pruning on the corpus parquet).

All index artifacts are plain parquet — readable by any engine, no
driver-side state survives the session (cluster-restart-safe).
"""

from __future__ import annotations

import math
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.functions.vector import cosine_sim
from parking_violations_data_pipeline_spark.operators import similarity as S

# one lock per index path: the concurrency soak runs the same registry
# entry from 6 threads; without this, two threads could race the
# build-if-absent check and interleave partitioned writes
_BUILD_LOCKS: dict[str, threading.Lock] = {}
_BUILD_LOCKS_GUARD = threading.Lock()


def _path_lock(path: str) -> threading.Lock:
    with _BUILD_LOCKS_GUARD:
        return _BUILD_LOCKS.setdefault(path, threading.Lock())


def _assign_rows(
    base: DataFrame, cents: list[list[float]], id_col: str, vec_col: str
) -> DataFrame:
    """Row-wise nearest-centroid assignment: one cosine column per
    centroid + an argmax when-chain, identical tie semantics to
    ivf_build's training assignment (lowest cluster index wins a tie).
    Map-only — each PHYSICAL row gets its own list, so duplicate ids
    cannot multiply (the join-back alternative does)."""
    e = base.select(
        id_col,
        F.col(vec_col).alias("__v"),
        F.col(vec_col).cast("array<double>").alias("__vd"),
    )
    sims = [
        cosine_sim(F.col("__vd"), F.array(*[F.lit(c) for c in cent])).alias(
            f"__s{ci}"
        )
        for ci, cent in enumerate(cents)
    ]
    scored = e.select(id_col, "__v", *sims)
    if len(cents) == 1:
        return scored.select(
            id_col, F.col("__v").alias(vec_col), F.lit(0).alias("list_id")
        )
    best = F.greatest(*[F.col(f"__s{ci}") for ci in range(len(cents))])
    cluster = F.lit(-1)
    for ci in range(len(cents) - 1, -1, -1):
        cluster = F.when(F.col(f"__s{ci}") == best, ci).otherwise(cluster)
    return scored.select(
        id_col, F.col("__v").alias(vec_col), cluster.alias("list_id")
    )


def ann_index_write(
    embeddings: DataFrame,
    path: str,
    mode: str = "ivf",
    n_lists: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build and persist the inverted-list index. mode='ivf' trains the
    DataFrame-native k-means coarse quantizer (bounded n_lists — the
    assignment plan carries one similarity column per centroid);
    mode='lsh' derives list_id from 2^ceil(log2(n_lists)) hyperplane
    sign bits — assignment is a map-only column, so the list count can
    scale with the corpus (the exponent-measurement path).

    Layout under `path`:
      corpus/   (id, vec) parquet, partitionBy(list_id)
      lists/    (list_id, n_rows) — which directories exist + stats
      centroids/ (list_id, centroid) — ivf mode only
      meta/     single row: mode, n_lists, num_planes, dim

    Returns a small stats dict (driver-side, corpus-size-independent).
    """
    spark = embeddings.sparkSession
    base = embeddings.filter(F.col(vec_col).isNotNull())
    dim_row = base.select(F.size(vec_col).alias("d")).head()
    if dim_row is None or dim_row["d"] is None:
        raise ValueError("ann_index_write: corpus has no non-NULL vectors")
    dim = int(dim_row["d"])

    if mode == "ivf":
        _, cents = S.ivf_build(
            base, k=n_lists, iters=iters, id_col=id_col, vec_col=vec_col
        )
        # assign ROW-WISE with the trained centroids, NOT by joining
        # ivf_build's (id, cluster) frame back on the id: duplicate ids
        # multiply under that join (2 copies -> 4 corpus rows; caught
        # by the dupkeys sweep), and the row-wise argmax fold is
        # map-only — no shuffle at all on the assignment.
        listed = _assign_rows(base, cents, id_col, vec_col)
        num_planes = 0
        spark.createDataFrame(
            [(ci, c) for ci, c in enumerate(cents)],
            "list_id int, centroid array<double>",
        ).write.mode("overwrite").parquet(f"{path}/centroids")
        actual_lists = len(cents)
    elif mode == "lsh":
        num_planes = max(1, math.ceil(math.log2(max(n_lists, 2))))
        listed = S.lsh_bucket(base, num_planes, vec_col, "list_id").select(
            id_col, vec_col, "list_id"
        )
        actual_lists = 1 << num_planes
    else:
        raise ValueError(f"ann_index_write: unknown mode {mode!r}")

    # repartition by list BEFORE the partitioned write: without it,
    # every write task emits a file into every directory it sees rows
    # for (tasks × lists tiny files — at 8192 lists that is a
    # small-files explosion); hashed on the partition key each
    # directory gets ~one file. This is the write-time investment the
    # query-side pruning pays back.
    listed.repartition(F.col("list_id")).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/corpus")
    stats = listed.groupBy("list_id").agg(F.count("*").alias("n_rows"))
    stats.write.mode("overwrite").parquet(f"{path}/lists")
    spark.createDataFrame(
        [(mode, actual_lists, num_planes, dim)],
        "mode string, n_lists int, num_planes int, dim int",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    present = spark.read.parquet(f"{path}/lists").count()
    return {"mode": mode, "n_lists": actual_lists, "dim": dim,
            "nonempty_lists": int(present)}


def _lsh_probe_order(qv: list[float], num_planes: int) -> list[int]:
    """Deterministic probe order for LSH mode: the query's own bucket,
    then Hamming-1 neighbors (by plane index), then Hamming-2 — the
    multi-probe schedule `similarity.ann_lsh` uses, made explicit."""
    qb = 0
    for h in range(num_planes):
        plane = S._hyperplane(h, len(qv))
        if sum(p * q for p, q in zip(plane, qv)) > 0:
            qb |= 1 << h
    probes = [qb]
    probes += [qb ^ (1 << h) for h in range(num_planes)]
    probes += [
        qb ^ (1 << a) ^ (1 << b)
        for a in range(num_planes)
        for b in range(a + 1, num_planes)
    ]
    return probes


def ann_index_query(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted index: pick the n_probe most promising
    inverted lists driver-side (centroid ranking for ivf, multi-probe
    Hamming schedule for lsh), then scan ONLY those partition
    directories (basePath read — the file listing never touches the
    other lists) and rank candidates by exact cosine. No training, no
    full-corpus job: query cost is the probed-lists row mass plus one
    tiny metadata read."""
    meta = spark.read.parquet(f"{path}/meta").head()
    mode, num_planes = meta["mode"], int(meta["num_planes"])
    if mode == "ivf":
        cents = spark.read.parquet(f"{path}/centroids").collect()

        def cos(a: list[float], b: list[float]) -> float:
            num = sum(x * y for x, y in zip(a, b))
            den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
                sum(y * y for y in b)
            )
            return num / den if den else 0.0

        ranked = sorted(
            cents,
            key=lambda r: (-cos([float(x) for x in r["centroid"]], query_vec),
                           r["list_id"]),
        )
        probe_order = [int(r["list_id"]) for r in ranked]
    else:
        probe_order = _lsh_probe_order(query_vec, num_planes)

    # intersect with lists that actually exist (empty buckets have no
    # directory; a read of a missing path would fail, and including
    # them in the listing would defeat the pruning anyway). The lists
    # stats are already on the driver, so n_probe=None auto-widens FOR
    # FREE: take probe lists in ranked order until their cumulative row
    # count covers ~4k candidates (a tiny corpus spread over many lists
    # can't even return k rows from a fixed 4 probes — the same
    # widening ivf_knn does with a limit-peek job, here with zero jobs).
    # An explicit n_probe pins the scan fraction; the caller owns the
    # recall trade.
    stats = {
        int(r["list_id"]): int(r["n_rows"])
        for r in spark.read.parquet(f"{path}/lists").collect()
    }
    ranked_present = [p for p in probe_order if p in stats]
    if n_probe is None:
        probes, cum = [], 0
        for p in ranked_present:
            if cum >= 4 * k and len(probes) >= 4:
                break
            probes.append(p)
            cum += stats[p]
    else:
        probes = ranked_present[:n_probe]
    if not probes:
        return spark.createDataFrame([], f"{id_col} long, sim double")
    corpus = f"{path}/corpus"
    cand = (
        spark.read.option("basePath", corpus)
        .parquet(*[f"{corpus}/list_id={p}" for p in probes])
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            id_col, F.round(cosine_sim(F.col(vec_col), qv), 4).alias("sim")
        )
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def ann_index_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental index maintenance: assign a NEW batch of vectors to
    the EXISTING inverted lists (ivf: argmax-cosine against the
    persisted centroids — the same fold ivf_build's assignment uses,
    so an appended row lands exactly where a full rebuild with these
    centroids would put it; lsh: the map-only sign-bit column) and
    append-write into the partitioned corpus. List stats are merged
    driver-side (n_lists rows — corpus-size-independent) and
    overwritten LAST, after the corpus append, so a reader that saw
    the new stats also sees the new rows. No retraining, no rewrite of
    existing partitions: this is the streaming-ingest shape — a
    micro-batch sink can call it per epoch.

    Duplicate ids are allowed (the index stores rows, not keys);
    deduplicate upstream if ids must be unique."""
    spark = new_vectors.sparkSession
    meta = spark.read.parquet(f"{path}/meta").head()
    mode, num_planes = meta["mode"], int(meta["num_planes"])
    base = new_vectors.filter(F.col(vec_col).isNotNull())
    if mode == "ivf":
        cents = [
            [float(x) for x in r["centroid"]]
            for r in spark.read.parquet(f"{path}/centroids")
            .orderBy("list_id")
            .collect()
        ]
        listed = _assign_rows(base, cents, id_col, vec_col)
    elif mode == "lsh":
        listed = S.lsh_bucket(base, num_planes, vec_col, "list_id").select(
            id_col, vec_col, "list_id"
        )
    else:
        raise ValueError(f"ann_index_append: unknown mode {mode!r}")

    listed.repartition(F.col("list_id")).write.mode("append").partitionBy(
        "list_id"
    ).parquet(f"{path}/corpus")
    batch = {
        int(r["list_id"]): int(r["n"])
        for r in listed.groupBy("list_id").agg(F.count("*").alias("n")).collect()
    }
    old = {
        int(r["list_id"]): int(r["n_rows"])
        for r in spark.read.parquet(f"{path}/lists").collect()
    }
    for lid, n in batch.items():
        old[lid] = old.get(lid, 0) + n
    spark.createDataFrame(
        sorted(old.items()), "list_id int, n_rows bigint"
    ).write.mode("overwrite").parquet(f"{path}/lists")
    return {"appended_rows": sum(batch.values()), "touched_lists": len(batch)}


def pq_index_write(
    embeddings: DataFrame,
    path: str,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist the PQ index: codes relation (id, sub, code — 8 bytes a
    vector at m=8), the m×n_codes codebook, and the float corpus for
    exact re-rank. Training (pq_build's Lloyd rounds) happens here,
    once; pq_index_query never trains."""
    codes, book = S.pq_build(
        embeddings, m=m, k=n_codes, iters=iters, id_col=id_col, vec_col=vec_col
    )
    spark = embeddings.sparkSession
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    spark.createDataFrame(
        [(s, c, v) for (s, c), v in sorted(book.items())],
        "sub int, code int, cent array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebook")
    embeddings.filter(F.col(vec_col).isNotNull()).select(
        id_col, vec_col
    ).write.mode("overwrite").parquet(f"{path}/corpus")
    spark.createDataFrame(
        [(m, n_codes)], "m int, n_codes int"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    return {"m": m, "n_codes": n_codes}


def pq_index_query(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k against a persisted PQ index + exact re-rank. The
    query→codebook distance table is computed driver-side (m×n_codes
    floats, corpus-independent) and broadcast; the codes scan reads 8
    bytes a vector; the exact re-rank fetches ONLY the shortlist rows
    from the corpus via an `isin` filter that parquet row-group stats
    can prune on — no full float scan in the query path."""
    mrow = spark.read.parquet(f"{path}/meta").head()
    m = int(mrow["m"])
    book_rows = spark.read.parquet(f"{path}/codebook").collect()
    sub_len = len(query_vec) // m
    rows = []
    for r in book_rows:
        s, c = int(r["sub"]), int(r["code"])
        qs = query_vec[s * sub_len : (s + 1) * sub_len]
        d2 = sum((a - b) * (a - b) for a, b in zip(qs, r["cent"]))
        rows.append((s, c, round(d2, 6)))
    dtab = spark.createDataFrame(rows, "sub int, code int, d2 double")
    adc = (
        spark.read.parquet(f"{path}/codes")
        .join(F.broadcast(dtab), ["sub", "code"])
        .groupBy("id")
        .agg(F.round(F.sum("d2"), 4).alias("adc"))
    )
    # bounded collect: `shortlist` ids (≤ a few hundred by contract) —
    # the literal isin list is what lets the corpus read prune
    cand_ids = [
        r["id"] for r in adc.orderBy("adc", "id").limit(shortlist).collect()
    ]
    if not cand_ids:
        return spark.createDataFrame([], f"{id_col} long, d2 double")
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    exact_d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            qarr,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    rerank = (
        spark.read.parquet(f"{path}/corpus")
        .filter(F.col(id_col).isin(cand_ids))
        .select(id_col, F.round(exact_d2, 4).alias("d2"))
    )
    return rerank.orderBy("d2", id_col).limit(k)


def build_once(path: str, build_fn) -> None:
    """Thread-safe build-if-absent: the first caller builds under the
    path's lock; later callers (and concurrent soak threads) see the
    _SUCCESS marker and skip. Parquet writes are directory-atomic per
    write.mode('overwrite'), and meta/ is written LAST by both builders
    in this module, so meta/_SUCCESS is the completion marker."""
    marker = os.path.join(path, "meta", "_SUCCESS")
    if os.path.exists(marker):
        return
    with _path_lock(path):
        if os.path.exists(marker):
            return
        build_fn()
