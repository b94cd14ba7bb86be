"""Round-8 widening batch 121: FOURTH real codec (binary PPM / P6 —
the first COLOR one) through the injectable seam, and the boundary-
corruption quarantine: two new corruption classes beyond round 7's
tail-truncation / flipped-magic / oversized-size — (a) truncation at a
FIELD BOUNDARY inside a structurally valid prefix (the struct.error
escape class the round-8 ADVICE fix closed for wav fmt chunks, now
pinned for every codec), and (b) declared-size overflow near integer
boundaries (a forged 65535x65535 header must refuse on arithmetic,
never attempt the multi-GB allocation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import multimodal as MM
from parking_violations_data_pipeline_spark.registry import register


@register(
    "m_ppm_decode",
    oracle="""
WITH ids AS (SELECT DISTINCT doc_id FROM documents
             WHERE doc_id < 8 AND doc_id IS NOT NULL),
px AS (
  -- the deterministic RGB test card: r = (doc_id*7 + y*11 + x*3),
  -- g = r + 1, b = r + 2, each modulo (maxval + 1); maxval 255 for
  -- odd ids, 1000 for even ids (2-byte big-endian raster). Re-derived
  -- arithmetically, never through the PPM bytes.
  SELECT i.doc_id, y.range AS y, x.range AS x,
    (i.doc_id * 7 + y.range * 11 + x.range * 3)
      % (CASE WHEN i.doc_id % 2 = 0 THEN 1001 ELSE 256 END) AS r,
    (i.doc_id * 7 + y.range * 11 + x.range * 3 + 1)
      % (CASE WHEN i.doc_id % 2 = 0 THEN 1001 ELSE 256 END) AS g,
    (i.doc_id * 7 + y.range * 11 + x.range * 3 + 2)
      % (CASE WHEN i.doc_id % 2 = 0 THEN 1001 ELSE 256 END) AS b
  FROM ids i CROSS JOIN range(0, 4) y CROSS JOIN range(0, 7) x
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(7 AS INT) AS width, CAST(4 AS INT) AS height,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 255 END AS INT) AS maxval,
  -- channel-weighted checksum (r + 2g + 3b): a BGR/ RGB swap or a
  -- channel-stride bug changes it; a plain sum would not notice
  CAST(sum(r + 2 * g + 3 * b) AS BIGINT) AS chan_weighted,
  -- position-weighted: catches row-order and pixel-stride errors
  CAST(sum((1 + x + y * 7) * (r + g + b)) AS BIGINT) AS pos_weighted
FROM px GROUP BY doc_id ORDER BY doc_id
""",
    tags=("MM", "K2"),
)
def m_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color-image decode through the codec seam — the FOURTH
    mime whose decode runs on actual bytes in this container, and the
    first with interleaved multi-sample pixels: 3 samples per pixel
    means a stride bug PGM's single channel cannot expose (reading
    W*H samples instead of 3*W*H, or de-interleaving BGR) corrupts
    `chan_weighted` here. Each document's 7x4 RGB test card is
    ENCODED executor-side as binary PPM (P6) with a planted header
    comment; EVEN doc_ids use maxval 1000, so their raster is 2-byte
    big-endian per sample; payloads are DECODED back through the
    injected codec inside mapInPandas. The oracle re-derives both
    weighted checksums from the test-card arithmetic, never touching
    the bytes."""
    import pandas as pd

    from collections.abc import Iterator

    MM.register_codec("image/x-portable-pixmap", MM.ppm_codec)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 8) & F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )

    width, height = 7, 4

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                maxval = 1000 if did % 2 == 0 else 255
                pixels = [
                    [
                        tuple(
                            (did * 7 + y * 11 + x * 3 + c) % (maxval + 1)
                            for c in range(3)
                        )
                        for x in range(width)
                    ]
                    for y in range(height)
                ]
                payloads.append(MM.ppm_encode(pixels, maxval=maxval))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": ["image/x-portable-pixmap"] * len(pdf),
                    "payload": payloads,
                }
            )

    binary = d.mapInPandas(encode, "doc_id long, mime string, payload binary")

    codecs = MM.registered_codecs()  # definition-time snapshot (seam contract)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mvs, cws, pws = [], [], [], [], [], []
            for did, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                img = codecs[mime](bytes(b))
                cw = pw = 0
                for y, row in enumerate(img.pixels):
                    for x, (r, g, bl) in enumerate(row):
                        cw += r + 2 * g + 3 * bl
                        pw += (1 + x + y * img.width) * (r + g + bl)
                ids.append(did)
                ws.append(img.width)
                hs.append(img.height)
                mvs.append(img.maxval)
                cws.append(cw)
                pws.append(pw)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "maxval": mvs,
                    "chan_weighted": cws,
                    "pos_weighted": pws,
                }
            )

    out = binary.mapInPandas(
        decode,
        "doc_id long, width int, height int, maxval int, "
        "chan_weighted long, pos_weighted long",
    )
    return out.orderBy("doc_id")


@register(
    "m_quarantine_boundaries",
    oracle="""
WITH ids AS (SELECT DISTINCT doc_id FROM documents
             WHERE doc_id < 48 AND doc_id IS NOT NULL),
verdict AS (
  -- schedule is doc_id arithmetic: mime cycles by %4, corruption by
  -- %3 (0 valid, 1 field-boundary truncation inside a valid prefix,
  -- 2 declared-size overflow near an int boundary). Valid features:
  -- bmp 8x3=24 px, wav 10 frames, pgm 5x4=20 px, ppm 6x2=12 px.
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
         WHEN 2 THEN 'image/x-portable-graymap'
         ELSE 'image/x-portable-pixmap' END AS mime,
    doc_id % 3 = 0 AS ok,
    CASE doc_id % 4 WHEN 0 THEN 24 WHEN 1 THEN 10
         WHEN 2 THEN 20 ELSE 12 END AS feat
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
def m_quarantine_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-corruption quarantine — round 8's two NEW corruption
    classes, applied across all FOUR real codecs:

    - **field-boundary truncation inside a valid prefix**: the payload
      ends mid-header-field (BMP cut at byte 30 of the 54-byte header;
      WAV fmt chunk declaring size 8, cut after it; PGM/PPM cut inside
      a header token). Round 7's tail truncation always cut inside the
      raster; cutting inside a FIELD is the class where a missing
      length guard surfaces as struct.error instead of the typed
      ValueError and ESCAPES the quarantine, killing the task — the
      exact wav-fmt ADVICE bug, which this entry's sweep also flushed
      (and fixed) in bmp_codec's header reads.
    - **declared-size overflow near int boundaries**: headers forged
      to declare 65535x65535 rasters (PGM/PPM ~12.8 GB), a WAV data
      chunk of 0xFFFFFFFE bytes, a BMP height of 2^30 — the codec must
      refuse on ARITHMETIC (declared > remaining), never attempt the
      allocation; a tolerant pipeline that 'clamps' would silently
      shrink the media instead of quarantining it.

    Same tolerant-decode shape as m_corrupt_quarantine: per-payload
    try/except ValueError inside mapInPandas, refusals counted per
    mime, nothing decodes partially. Oracle re-derives the census from
    doc_id arithmetic alone."""
    import struct

    import pandas as pd

    from collections.abc import Iterator

    MM.register_codec("image/bmp", MM.bmp_codec)
    MM.register_codec("audio/wav", MM.wav_codec)
    MM.register_codec("image/x-portable-graymap", MM.pgm_codec)
    MM.register_codec("image/x-portable-pixmap", MM.ppm_codec)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 48) & F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )

    def make_payload(did: int) -> tuple[str, bytes]:
        kind = did % 4
        if kind == 0:
            mime = "image/bmp"
            raw = MM.bmp_encode(
                [[(did % 200, x % 200, y % 200) for x in range(8)] for y in range(3)]
            )
        elif kind == 1:
            mime = "audio/wav"
            raw = MM.wav_encode([[((did * 5 + i) % 300) - 150 for i in range(10)]])
        elif kind == 2:
            mime = "image/x-portable-graymap"
            raw = MM.pgm_encode(
                [[(did * 3 + y * 5 + x) % 250 for x in range(5)] for y in range(4)]
            )
        else:
            mime = "image/x-portable-pixmap"
            raw = MM.ppm_encode(
                [
                    [((did + x) % 250, (did + y) % 250, (x + y) % 250) for x in range(6)]
                    for y in range(2)
                ]
            )
        c = did % 3
        if c == 1:  # field-boundary truncation inside a valid prefix
            if kind == 0:
                raw = raw[:30]  # inside the BITMAPINFOHEADER
            elif kind == 1:
                # rebuild: RIFF/WAVE + an 8-byte-declared fmt chunk as
                # the LAST chunk — valid chunk framing, impossible PCM
                # fmt (the ADVICE escape shape)
                body = b"WAVE" + b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x02\x00\x44\xac\x00\x00"
                raw = b"RIFF" + struct.pack("<I", len(body)) + body
            else:
                # cut inside the header's dimension token
                sp = raw.index(b"\n", 3)  # end of magic/comment line
                raw = raw[: sp + 2]
        elif c == 2:  # declared-size overflow near an int boundary
            b = bytearray(raw)
            if kind == 0:
                struct.pack_into("<i", b, 22, 1 << 30)  # height field
            elif kind == 1:
                at = raw.index(b"data") + 4
                struct.pack_into("<I", b, at, 0xFFFFFFFE)
            elif kind == 2:
                b = bytearray(raw.replace(b"5 4\n", b"65535 65535\n", 1))
            else:
                b = bytearray(raw.replace(b"6 2\n", b"65535 65535\n", 1))
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
