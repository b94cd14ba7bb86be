"""Round-3 widening batch 35: MMR (maximal marginal relevance)
re-ranking — the diversity-aware retrieval post-processor — in exact
integer arithmetic with a generated 5-level unrolled selection
oracle (the q_trade_pagerank / j_gram_power_iteration technique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register

_N_CAND = 12
_N_PICK = 5


def _mmr_oracle() -> str:
    head = f"""
WITH src AS MATERIALIZED (
  SELECT vec_id, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
  WHERE embedding IS NOT NULL
),
rel AS MATERIALIZED (
  -- 128-bit product sum: q·q reaches 1e20 on unnormalized embeddings
  SELECT b.vec_id, CAST(sum(CAST(a.q AS HUGEINT) * b.q) // 1000000 AS BIGINT) AS rel
  FROM src a JOIN src b ON a.i = b.i
  WHERE a.vec_id = 0 AND b.vec_id <> 0
  GROUP BY b.vec_id
),
cand AS MATERIALIZED (
  SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT {_N_CAND}
),
sims AS MATERIALIZED (
  SELECT x.vec_id AS a, y.vec_id AS b,
    CAST(sum(CAST(sa.q AS HUGEINT) * sb.q) // 1000000 AS BIGINT) AS dot
  FROM cand x JOIN cand y ON x.vec_id <> y.vec_id
  JOIN src sa ON sa.vec_id = x.vec_id
  JOIN src sb ON sb.vec_id = y.vec_id AND sb.i = sa.i
  GROUP BY x.vec_id, y.vec_id
),
s1 AS MATERIALIZED (
  SELECT vec_id, rel, CAST(7 * rel AS BIGINT) AS score
  FROM cand ORDER BY 7 * rel DESC, vec_id LIMIT 1
)"""
    parts = [head]
    prev_sel = "(SELECT vec_id FROM s1)"
    for k in range(2, _N_PICK + 1):
        parts.append(
            f""",
s{k} AS MATERIALIZED (
  SELECT c.vec_id, c.rel,
    CAST(7 * c.rel - 3 * (SELECT max(s.dot) FROM sims s
                          WHERE s.a = c.vec_id AND s.b IN {prev_sel}) AS BIGINT) AS score
  FROM cand c WHERE c.vec_id NOT IN {prev_sel}
  ORDER BY score DESC, c.vec_id LIMIT 1
)"""
        )
        prev_sel = (
            "(" + " UNION ALL ".join(f"SELECT vec_id FROM s{j}" for j in range(1, k + 1)) + ")"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS pick, vec_id, rel, score FROM s{k}" for k in range(1, _N_PICK + 1)
    )
    parts.append(
        f"""
SELECT CAST(pick AS BIGINT) AS pick, CAST(vec_id AS BIGINT) AS vec_id, rel, score
FROM ({union}) ORDER BY pick"""
    )
    return "".join(parts)


@register("j_mmr_rerank", oracle=_mmr_oracle(), tags=("J8", "J10", "F3"))
def j_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal marginal relevance re-ranking: from the query's top-12
    nearest candidates, greedily pick 5 maximizing
    7·relevance − 3·max-similarity-to-already-picked (λ = 0.7) — the
    diversity-aware post-processor RAG retrieval stacks run after
    ANN. All similarities are integer micro-unit dot products
    (// 10⁶ rescale), so relevance, redundancy penalties, and the
    argmax are bit-exact; ties break on vec_id.

    Scale shape: the distributed stages are the query-vs-corpus dot
    scan (one pass; q broadcast) and the candidate top-k
    (TakeOrderedAndProject); only the 12-candidate pairwise matrix
    (≤144 cells, bounded by k², never by corpus) reaches the driver
    for the 5-step greedy loop — the IVF-centroid precedent. The
    oracle unrolls the same greedy recurrence as 5 chained
    MATERIALIZED CTEs with correlated max-sim subqueries.
    """
    e = load_table(spark, sf_dir, "embeddings")
    src = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("i0", "x")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("q"),
    )
    qv = src.filter(F.col("vec_id") == 0).select(
        F.col("i").alias("qi"), F.col("q").alias("qq")
    )
    rel = (
        src.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv), F.col("i") == F.col("qi"))
        .groupBy("vec_id")
        # 128-bit product sum: q·qq reaches 1e20 on unnormalized
        # embeddings (extremes fixture); rel after div 1e6 fits long
        .agg(
            F.expr(
                "CAST(sum(CAST(q AS DECIMAL(38,0)) * qq)"
                " div 1000000 AS LONG)"
            ).alias("rel")
        )
    )
    cand = rel.orderBy(F.desc("rel"), "vec_id").limit(_N_CAND)
    cand_rows = cand.collect()
    cand_ids = [r["vec_id"] for r in cand_rows]
    cand_rel = {r["vec_id"]: r["rel"] for r in cand_rows}
    pair_src = src.filter(F.col("vec_id").isin(cand_ids))
    a = pair_src.alias("a")
    b = pair_src.alias("b")
    sims_df = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i")) & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .groupBy(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .agg(
            F.expr(
                "CAST(sum(CAST(a.q AS DECIMAL(38,0)) * b.q)"
                " div 1000000 AS LONG)"
            ).alias("dot")
        )
    )
    sims = {(r["va"], r["vb"]): r["dot"] for r in sims_df.collect()}

    picked: list[tuple[int, int, int, int]] = []
    remaining = list(cand_ids)
    for pick in range(1, _N_PICK + 1):
        if not remaining:  # empty corpus → empty rerank, not a crash
            break
        best = None
        for v in remaining:
            if pick == 1:
                score = 7 * cand_rel[v]
            else:
                score = 7 * cand_rel[v] - 3 * max(
                    sims[(v, p[1])] for p in picked
                )
            key = (-score, v)
            if best is None or key < best[0]:
                best = (key, v, score)
        _, v, score = best
        picked.append((pick, v, cand_rel[v], score))
        remaining.remove(v)

    return local_df(
        spark, picked, "pick long, vec_id long, rel long, score long"
    ).orderBy("pick")
