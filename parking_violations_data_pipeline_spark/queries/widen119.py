"""Round-7 widening batch 119: third real codec (binary PGM) through
the seam, and the corrupted-payload QUARANTINE decode — the tolerant
twin of decode_features' strict loud-failure path (at 100 TB one bad
file must not kill the job; it must be counted and routed aside).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import multimodal as MM
from parking_violations_data_pipeline_spark.registry import register


@register(
    "m_pgm_decode",
    oracle="""
WITH ids AS (SELECT DISTINCT doc_id FROM documents
             WHERE doc_id < 8 AND doc_id IS NOT NULL),
px AS (
  -- the deterministic test card: v(x,y) = (doc_id*13 + y*9 + x*2)
  -- modulo the per-doc maxval (255 for odd ids, 4001 for even ids —
  -- even docs exercise the 2-byte big-endian raster); re-derived
  -- arithmetically, never through the PGM bytes
  SELECT i.doc_id, y.range AS y, x.range AS x,
    (i.doc_id * 13 + y.range * 9 + x.range * 2)
      % (CASE WHEN i.doc_id % 2 = 0 THEN 4001 ELSE 255 END) AS v
  FROM ids i CROSS JOIN range(0, 5) y CROSS JOIN range(0, 9) x
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(9 AS INT) AS width, CAST(5 AS INT) AS height,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 4000 ELSE 254 END AS INT) AS maxval,
  CAST(sum(v) AS BIGINT) AS checksum,
  CAST(sum((1 + x + y * 9) * v) AS BIGINT) AS weighted
FROM px GROUP BY doc_id ORDER BY doc_id
""",
    tags=("MM", "K2"),
)
def m_pgm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL grayscale-image decode through the codec seam — the third
    mime (after image/bmp, audio/wav) whose decode runs on actual
    bytes in this container. Each document's 9x5 test card is ENCODED
    executor-side as a binary PGM (P5) with a planted `#` comment in
    the header (real netpbm tools emit them; decoders that assume a
    fixed header layout break), EVEN doc_ids use maxval 4000 so their
    raster is 2-byte big-endian (the netpbm wide-sample rule), and the
    payloads are DECODED back through the injected codec inside
    mapInPandas.

    `checksum` (sample sum) catches content corruption; `weighted`
    (position-weighted) catches row-order and stride errors;
    `maxval` proves the 1-byte/2-byte raster switch round-trips. The
    oracle re-derives everything from the test-card arithmetic, never
    touching the bytes."""
    import pandas as pd

    from collections.abc import Iterator

    MM.register_codec("image/x-portable-graymap", MM.pgm_codec)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 8) & F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )

    width, height = 9, 5

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                maxval = 4000 if did % 2 == 0 else 254
                pixels = [
                    [
                        (did * 13 + y * 9 + x * 2) % (maxval + 1)
                        for x in range(width)
                    ]
                    for y in range(height)
                ]
                payloads.append(MM.pgm_encode(pixels, maxval=maxval))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": ["image/x-portable-graymap"] * len(pdf),
                    "payload": payloads,
                }
            )

    binary = d.mapInPandas(encode, "doc_id long, mime string, payload binary")

    codecs = MM.registered_codecs()  # definition-time snapshot (seam contract)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mvs, cks, wts = [], [], [], [], [], []
            for did, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                img = codecs[mime](bytes(b))
                ck = wt = 0
                for y, row in enumerate(img.pixels):
                    for x, v in enumerate(row):
                        ck += v
                        wt += (1 + x + y * img.width) * v
                ids.append(did)
                ws.append(img.width)
                hs.append(img.height)
                mvs.append(img.maxval)
                cks.append(ck)
                wts.append(wt)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "maxval": mvs,
                    "checksum": cks,
                    "weighted": wts,
                }
            )

    out = binary.mapInPandas(
        decode,
        "doc_id long, width int, height int, maxval int, "
        "checksum long, weighted long",
    )
    return out.orderBy("doc_id")


@register(
    "m_corrupt_quarantine",
    oracle="""
WITH ids AS (SELECT DISTINCT doc_id FROM documents
             WHERE doc_id < 48 AND doc_id IS NOT NULL),
verdict AS (
  -- corruption schedule is doc_id arithmetic: %4==0 valid, 1 truncated
  -- tail, 2 flipped magic, 3 oversized declared size; mime cycles by
  -- %3. Valid features: bmp 10x4=40 px, wav 12 frames, pgm 6x5=30 px.
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
                    ELSE 'image/x-portable-graymap' END AS mime,
    doc_id % 4 = 0 AS ok,
    CASE doc_id % 3 WHEN 0 THEN 40 WHEN 1 THEN 12 ELSE 30 END AS feat
  FROM ids
)
SELECT mime,
  CAST(count(*) AS BIGINT) AS n_payloads,
  CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS n_ok,
  CAST(count(*) FILTER (WHERE NOT ok) AS BIGINT) AS n_quarantined,
  CAST(sum(CASE WHEN ok THEN feat ELSE 0 END) AS BIGINT) AS feat_sum
FROM verdict GROUP BY mime ORDER BY mime
""",
    tags=("MM", "K2", "B5"),
)
def m_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupted-payload QUARANTINE decode — the production-tolerant
    twin of the strict seam (which refuses loudly and kills the task;
    see tests/test_pgm_codec_r7.py for that contract): at 100 TB a
    handful of truncated uploads must be COUNTED and routed aside, not
    abort a 1000-executor job. Three mimes cycle across documents;
    three quarter-populations are deliberately corrupted executor-side
    in three distinct ways — truncated tail, flipped magic bytes, and
    an oversized declared size (data chunk / raster larger than the
    remaining payload, the silent-shrink bait both wav_codec and
    pgm_codec now refuse) — then decoded through the SAME injected
    codecs with a per-payload try/except that tallies refusals per
    mime. Every corruption class must be caught as the codecs' typed
    ValueError — nothing decodes 'partially'. The oracle re-derives
    the verdict census from doc_id arithmetic alone."""
    import struct

    import pandas as pd

    from collections.abc import Iterator

    MM.register_codec("image/bmp", MM.bmp_codec)
    MM.register_codec("audio/wav", MM.wav_codec)
    MM.register_codec("image/x-portable-graymap", MM.pgm_codec)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 48) & F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )

    def make_payload(did: int) -> tuple[str, bytes]:
        kind = did % 3
        if kind == 0:
            mime = "image/bmp"
            raw = MM.bmp_encode(
                [[(did % 200, x % 200, y % 200) for x in range(10)] for y in range(4)]
            )
        elif kind == 1:
            mime = "audio/wav"
            raw = MM.wav_encode([[((did * 7 + i) % 400) - 200 for i in range(12)]])
        else:
            mime = "image/x-portable-graymap"
            raw = MM.pgm_encode(
                [[(did * 3 + y * 6 + x) % 250 for x in range(6)] for y in range(5)]
            )
        c = did % 4
        if c == 1:  # truncated tail
            raw = raw[: max(8, len(raw) - 11)]
        elif c == 2:  # flipped magic
            raw = b"XX" + raw[2:]
        elif c == 3:  # oversized declared size
            b = bytearray(raw)
            if kind == 0:
                struct.pack_into("<i", b, 22, 1 << 20)  # height field
            elif kind == 1:
                at = raw.index(b"data") + 4
                struct.pack_into("<I", b, at, 1 << 20)
            else:
                # blow up the declared height token (ASCII header)
                b = bytearray(raw.replace(b" 5\n", b" 50000\n", 1))
            raw = bytes(b)
        return mime, raw

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, payloads = [], []
            for did in pdf["doc_id"]:
                mime, raw = make_payload(int(did))
                mimes.append(mime)
                payloads.append(raw)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "mime": mimes, "payload": payloads}
            )

    binary = d.mapInPandas(encode, "doc_id long, mime string, payload binary")

    codecs = MM.registered_codecs()  # definition-time snapshot

    def decode_tolerant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, oks, feats = [], [], []
            for mime, b in zip(pdf["mime"], pdf["payload"]):
                try:
                    obj = codecs[mime](bytes(b))
                    mimes.append(mime)
                    oks.append(True)
                    feats.append(len(obj))
                except ValueError:
                    # the codecs' typed refusal — quarantined, counted
                    mimes.append(mime)
                    oks.append(False)
                    feats.append(0)
            yield pd.DataFrame({"mime": mimes, "ok": oks, "feature": feats})

    decoded = binary.mapInPandas(
        decode_tolerant, "mime string, ok boolean, feature long"
    )
    return (
        decoded.groupBy("mime")
        .agg(
            F.count("*").alias("n_payloads"),
            F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
            F.count(F.when(~F.col("ok"), 1)).alias("n_quarantined"),
            F.sum(F.when(F.col("ok"), F.col("feature")).otherwise(0)).alias(
                "feat_sum"
            ),
        )
        .orderBy("mime")
    )
