"""Round-4 widening batch 105: perceptual-hash near-duplicate
detection over binary payloads — the image-dedup pipeline shape
(decode → downscale → aHash → bucket) with the decode step
deterministic, per the multimodal stub convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import multimodal as MM
from parking_violations_data_pipeline_spark.registry import register


@register(
    "m_phash_neardup",
    oracle="""
WITH cells AS (
  -- UTF-8 BYTE grid decoded from the hex dump ONCE into a list:
  -- per-index substring re-scans the string (O(n²)/doc — 88 s on a
  -- 200k-char doc, measured); list indexing is O(1)
  SELECT doc_id,
    unnest(vals) AS val,
    unnest(range(1, len(vals) + 1)) AS i,
    ((i - 1) * 16) // len(vals) AS pos
  FROM (SELECT doc_id,
          [16*(instr('0123456789ABCDEF', hc[2*j-1])-1)
             + (instr('0123456789ABCDEF', hc[2*j])-1)
           FOR j IN range(1, len(hc)//2 + 1)] AS vals
        FROM (SELECT doc_id, string_split(hex(encode(text)), '') AS hc
              FROM documents WHERE octet_length(encode(text)) > 0))
),
pooled AS (
  SELECT doc_id, pos, sum(val) // count(*) AS cell
  FROM cells GROUP BY doc_id, pos
),
means AS (
  SELECT doc_id, sum(cell) // 16 AS mu FROM pooled GROUP BY doc_id
),
hashes AS (
  SELECT p.doc_id,
    CAST(sum(CASE WHEN p.cell >= m.mu THEN power(2, p.pos)::BIGINT
             ELSE 0 END) AS BIGINT) AS ahash
  FROM pooled p JOIN means m ON p.doc_id = m.doc_id
  GROUP BY p.doc_id
),
buckets AS (
  SELECT ahash, count(*) AS k FROM hashes GROUP BY ahash
)
SELECT
  CAST(sum(k) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_distinct_hashes,
  CAST(coalesce(sum(CASE WHEN k > 1 THEN k END), 0) AS BIGINT)
    AS n_candidate_dups,
  CAST(max(k) AS BIGINT) AS largest_bucket
FROM buckets
""",
    tags=("MM", "J6", "K2"),
)
def m_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection — the image-dedup
    pipeline end-to-end: binary payload → downscale to a 16-cell
    thumbnail (m_resize_pool's Arrow kernel) → average-hash (bit i set
    iff cell i ≥ the thumbnail's own mean — aHash, the classic pHash
    family member) → equal-hash bucketing, where same-bucket payloads
    are visual-dup candidates. The decode is the deterministic stub
    (bytes stand in for pixels — a real JPEG decode drops into
    attach_binary unchanged); everything downstream is exactly the
    production plumbing: integer pooling, integer mean, bit packing,
    one hash-key shuffle for the bucket census. The oracle re-derives
    every cell characterwise."""
    d = load_table(spark, sf_dir, "documents")
    pooled = MM.resize_pool(MM.attach_binary(d), buckets=16)
    means = pooled.groupBy("doc_id").agg(
        F.expr("sum(pooled) div 16").alias("mu")
    )
    hashes = (
        pooled.join(means, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("pooled") >= F.col("mu"),
                    F.expr("cast(pow(2, pos) as bigint)"),
                ).otherwise(0)
            ).alias("ahash")
        )
    )
    buckets = hashes.groupBy("ahash").agg(F.count("*").alias("k"))
    return buckets.agg(
        F.sum("k").alias("n_docs"),
        F.count("*").alias("n_distinct_hashes"),
        F.coalesce(
            F.sum(F.when(F.col("k") > 1, F.col("k"))), F.lit(0)
        ).alias("n_candidate_dups"),
        F.max("k").alias("largest_bucket"),
    )


@register(
    "m_bmp_decode",
    oracle="""
WITH ids AS (SELECT DISTINCT doc_id FROM documents
             WHERE doc_id < 8 AND doc_id IS NOT NULL),
px AS (
  -- the deterministic test card: v(x,y) = (doc_id*7 + y*10 + x) % 254,
  -- channels (v, v+1, v+2) — re-derived arithmetically, never through
  -- the BMP bytes (the decode path is the engine's alone)
  SELECT i.doc_id, y.range AS y, x.range AS x,
    (i.doc_id * 7 + y.range * 10 + x.range) % 254 AS v
  FROM ids i CROSS JOIN range(0, 6) y CROSS JOIN range(0, 10) x
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(10 AS INT) AS width, CAST(6 AS INT) AS height,
  CAST(sum(3 * v + 3) AS BIGINT) AS checksum,
  CAST(sum((1 + x + y * 10) * v) AS BIGINT) AS weighted
FROM px GROUP BY doc_id ORDER BY doc_id
""",
    tags=("MM", "K2"),
)
def m_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode through the codec seam (round-6 item 5): a
    24-bit BMP is ENCODED executor-side per document (stdlib struct —
    bottom-up rows, BGR channels, 4-byte stride padding), carried as an
    opaque binary payload, and DECODED back through the injected
    `image/bmp` codec inside mapInPandas — the first mime whose decode
    runs on actual bytes in this container rather than the
    deterministic-fake path.

    The features prove the parse is bit-faithful: `checksum` (sum of
    all channel bytes) catches content corruption; `weighted`
    (position-weighted red channel, y=0 = top row) catches the three
    classic BMP decode bugs — upside-down rows, BGR/RGB swap, and
    stride miscounts — each of which shifts the weighted sum. The
    oracle re-derives both from the test-card arithmetic, never
    touching the bytes, so engine encode+decode must agree with pure
    math end-to-end. Pixel source is doc_id-only (a 10x6 test card per
    document), so duplicate ids collapse via DISTINCT and NULL ids are
    excluded on both sides."""
    import pandas as pd

    from collections.abc import Iterator

    MM.register_codec("image/bmp", MM.bmp_codec)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 8) & F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )

    width, height = 10, 6

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                pixels = [
                    [
                        (
                            (int(did) * 7 + y * width + x) % 254,
                            (int(did) * 7 + y * width + x) % 254 + 1,
                            (int(did) * 7 + y * width + x) % 254 + 2,
                        )
                        for x in range(width)
                    ]
                    for y in range(height)
                ]
                payloads.append(MM.bmp_encode(pixels))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": ["image/bmp"] * len(pdf),
                    "payload": payloads,
                }
            )

    binary = d.mapInPandas(encode, "doc_id long, mime string, payload binary")

    codecs = MM.registered_codecs()  # definition-time snapshot (seam contract)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cks, wts = [], [], [], [], []
            for did, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                img = codecs[mime](bytes(b))
                ck = wt = 0
                for y, row in enumerate(img.pixels):
                    for x, (r, g, bl) in enumerate(row):
                        ck += r + g + bl
                        wt += (1 + x + y * img.width) * r
                ids.append(did)
                ws.append(img.width)
                hs.append(img.height)
                cks.append(ck)
                wts.append(wt)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "checksum": cks,
                    "weighted": wts,
                }
            )

    return binary.mapInPandas(
        decode,
        "doc_id long, width int, height int, checksum long, weighted long",
    ).orderBy("doc_id")
