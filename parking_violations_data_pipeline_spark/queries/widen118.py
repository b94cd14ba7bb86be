"""Round-6 widening batch 118: real audio/wav decode through the
codec seam — the audio companion to widen105's image/bmp proof, so
BOTH stubbed media families (image + audio) now have one mime that
decodes actual bytes end-to-end in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import multimodal as MM
from parking_violations_data_pipeline_spark.registry import register


@register(
    "m_wav_decode",
    oracle="""
WITH ids AS (SELECT DISTINCT doc_id FROM documents
             WHERE doc_id < 8 AND doc_id IS NOT NULL),
s AS (
  -- the deterministic test card: stereo 16-bit PCM, 24 frames,
  --   L[i] = (doc_id*31 + i*7) % 2003 - 1001
  --   R[i] = (doc_id*17 + i*5) % 2003 - 1001
  -- re-derived arithmetically, never through the WAV bytes (the
  -- RIFF walk + de-interleave path is the engine's alone)
  SELECT i.doc_id, t.range AS i,
    ((i.doc_id * 31 + t.range * 7) % 2003) - 1001 AS l,
    ((i.doc_id * 17 + t.range * 5) % 2003) - 1001 AS r
  FROM ids i CROSS JOIN range(0, 24) t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(8000 AS INT) AS sample_rate,
  CAST(2 AS INT) AS n_channels,
  CAST(24 AS INT) AS n_frames,
  CAST(sum(l) AS BIGINT) AS left_sum,
  CAST(sum((i + 1) * r) AS BIGINT) AS right_weighted
FROM s GROUP BY doc_id ORDER BY doc_id
""",
    tags=("MM", "K2"),
)
def m_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the codec seam: a stereo 16-bit PCM
    RIFF/WAVE file is ENCODED executor-side per document (stdlib
    struct — interleaved frames, little-endian, plus a planted LIST
    metadata chunk before 'data' so the decoder must genuinely walk
    the chunk list), carried as an opaque binary payload, and DECODED
    back through the injected `audio/wav` codec inside mapInPandas.

    The features prove the parse is bit-faithful: `left_sum` (signed
    sample sum) catches two's-complement/sign errors, and
    `right_weighted` (position-weighted RIGHT channel) catches the
    three classic WAV decode bugs — channel-interleave swaps, byte-
    order mistakes, and data-offset errors from skipping the LIST
    chunk wrong. The oracle re-derives both from the test-card
    arithmetic, never touching the bytes. Pixel source is doc_id-only,
    so duplicate ids collapse via DISTINCT and NULL ids are excluded
    on both sides."""
    import pandas as pd

    from collections.abc import Iterator

    MM.register_codec("audio/wav", MM.wav_codec)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 8) & F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )

    n_frames, sr = 24, 8000

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                left = [
                    ((int(did) * 31 + i * 7) % 2003) - 1001 for i in range(n_frames)
                ]
                right = [
                    ((int(did) * 17 + i * 5) % 2003) - 1001 for i in range(n_frames)
                ]
                payloads.append(MM.wav_encode([left, right], sample_rate=sr))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": ["audio/wav"] * len(pdf),
                    "payload": payloads,
                }
            )

    binary = d.mapInPandas(encode, "doc_id long, mime string, payload binary")

    codecs = MM.registered_codecs()  # definition-time snapshot (seam contract)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srs, ncs, nfs, lsums, rwts = [], [], [], [], [], []
            for did, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                wav = codecs[mime](bytes(b))
                left, right = wav.channels[0], wav.channels[1]
                ids.append(did)
                srs.append(wav.sample_rate)
                ncs.append(wav.n_channels)
                nfs.append(wav.n_frames)
                lsums.append(sum(left))
                rwts.append(sum((i + 1) * v for i, v in enumerate(right)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": srs,
                    "n_channels": ncs,
                    "n_frames": nfs,
                    "left_sum": lsums,
                    "right_weighted": rwts,
                }
            )

    return binary.mapInPandas(
        decode,
        "doc_id long, sample_rate int, n_channels int, n_frames int,"
        " left_sum long, right_weighted long",
    ).orderBy("doc_id")


@register(
    "m_mixed_codec_decode",
    oracle="""
WITH ids AS (SELECT DISTINCT doc_id FROM documents
             WHERE doc_id < 12 AND doc_id IS NOT NULL),
bmp AS (
  SELECT i.doc_id, 'image/bmp' AS mime, 60 AS units,
    CAST(sum(3 * ((i.doc_id * 7 + y.range * 10 + x.range) % 254) + 3)
      AS BIGINT) AS content_sum
  FROM ids i CROSS JOIN range(0, 6) y CROSS JOIN range(0, 10) x
  WHERE i.doc_id % 2 = 0 GROUP BY i.doc_id
),
wav AS (
  SELECT i.doc_id, 'audio/wav' AS mime, 24 AS units,
    CAST(sum(abs(((i.doc_id * 31 + t.range * 7) % 2003) - 1001)
           + abs(((i.doc_id * 17 + t.range * 5) % 2003) - 1001))
      AS BIGINT) AS content_sum
  FROM ids i CROSS JOIN range(0, 24) t
  WHERE i.doc_id % 2 = 1 GROUP BY i.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, mime, CAST(units AS INT) AS units,
  content_sum
FROM (SELECT * FROM bmp UNION ALL SELECT * FROM wav)
ORDER BY doc_id
""",
    tags=("MM", "K2"),
)
def m_mixed_codec_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-corpus decode — the production multimodal shape:
    ONE binary column carries MIXED mimes (even doc_ids → a real
    24-bit BMP test card, odd → a real stereo PCM WAV), and ONE
    mapInPandas pass dispatches each payload to its registered codec
    (the m_modality_router pattern, but with both REAL decoders from
    this round behind the seam instead of fake features). Features are
    modality-appropriate — pixels vs frames for `units`, channel-byte
    sum vs absolute-sample sum for `content_sum` — and the oracle
    re-derives both arithmetically from the doc_id, never touching the
    bytes. Proves the codec registry handles per-row mime routing in a
    single Arrow batch, the shape a mixed crawl corpus needs."""
    import pandas as pd

    from collections.abc import Iterator

    MM.register_codec("image/bmp", MM.bmp_codec)
    MM.register_codec("audio/wav", MM.wav_codec)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 12) & F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    px = [
                        [
                            (
                                (did * 7 + y * 10 + x) % 254,
                                (did * 7 + y * 10 + x) % 254 + 1,
                                (did * 7 + y * 10 + x) % 254 + 2,
                            )
                            for x in range(10)
                        ]
                        for y in range(6)
                    ]
                    mimes.append("image/bmp")
                    payloads.append(MM.bmp_encode(px))
                else:
                    left = [((did * 31 + i * 7) % 2003) - 1001 for i in range(24)]
                    right = [((did * 17 + i * 5) % 2003) - 1001 for i in range(24)]
                    mimes.append("audio/wav")
                    payloads.append(MM.wav_encode([left, right]))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "mime": mimes, "payload": payloads}
            )

    binary = d.mapInPandas(encode, "doc_id long, mime string, payload binary")

    codecs = MM.registered_codecs()  # definition-time snapshot (seam contract)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, units, sums = [], [], [], []
            for did, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                media = codecs[mime](bytes(b))
                if mime == "image/bmp":
                    u = media.width * media.height
                    s = sum(
                        r + g + bl for row in media.pixels for (r, g, bl) in row
                    )
                else:
                    u = media.n_frames
                    s = sum(abs(v) for ch in media.channels for v in ch)
                ids.append(did)
                mimes.append(mime)
                units.append(u)
                sums.append(s)
            yield pd.DataFrame(
                {"doc_id": ids, "mime": mimes, "units": units, "content_sum": sums}
            )

    return binary.mapInPandas(
        decode, "doc_id long, mime string, units int, content_sum long"
    ).orderBy("doc_id")
