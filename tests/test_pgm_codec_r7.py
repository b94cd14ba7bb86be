"""Round-7 codec additions: binary-PGM codec unit contract, the
corrupted-payload refusal sweep for ALL THREE real codecs, and the
strict seam's loud-failure proof AT THE ARROW BOUNDARY (a corrupt
payload inside a mapInPandas batch must kill the task with the
codec's typed message, never shrink/skip silently).
"""

from __future__ import annotations

import struct

import pytest

from parking_violations_data_pipeline_spark.operators import multimodal as MM


def card(w, h, maxval=254):
    return [[(y * w + x) % (maxval + 1) for x in range(w)] for y in range(h)]


class TestPgmRoundtrip:
    def test_identity_8bit(self):
        img = card(7, 5)
        got = MM.pgm_codec(MM.pgm_encode(img))
        assert (got.width, got.height, got.maxval) == (7, 5, 255)
        assert got.pixels == img

    def test_identity_16bit_big_endian(self):
        img = [[(x * 500 + y * 7) % 40000 for x in range(4)] for y in range(3)]
        got = MM.pgm_codec(MM.pgm_encode(img, maxval=65535))
        assert got.maxval == 65535
        assert got.pixels == img

    def test_header_comment_is_skipped(self):
        img = card(3, 2)
        raw = MM.pgm_encode(img, comment="a # tricky comment 12 34")
        assert b"#" in raw[:40]
        assert MM.pgm_codec(raw).pixels == img

    def test_no_comment_form(self):
        img = card(3, 2)
        assert MM.pgm_codec(MM.pgm_encode(img, comment=None)).pixels == img

    def test_len_is_pixel_count(self):
        assert len(MM.pgm_codec(MM.pgm_encode(card(6, 4)))) == 24


class TestPgmRefusals:
    def test_not_p5(self):
        with pytest.raises(ValueError, match="P5"):
            MM.pgm_codec(b"P2\n1 1\n255\n0")

    def test_truncated_raster(self):
        raw = MM.pgm_encode(card(6, 5))
        with pytest.raises(ValueError, match="pgm_codec.*truncated"):
            MM.pgm_codec(raw[:-4])

    def test_oversized_declared_height(self):
        raw = MM.pgm_encode(card(6, 5)).replace(b" 5\n", b" 50000\n", 1)
        with pytest.raises(ValueError, match="pgm_codec.*truncated"):
            MM.pgm_codec(raw)

    def test_sample_above_maxval(self):
        # declare maxval 100 but ship a 200 byte: corrupt, refuse
        raw = MM.pgm_encode([[200]], maxval=254).replace(b"254", b"100")
        with pytest.raises(ValueError, match="exceeds declared maxval"):
            MM.pgm_codec(raw)

    def test_non_numeric_header(self):
        with pytest.raises(ValueError, match="non-numeric"):
            MM.pgm_codec(b"P5\nab 2\n255\n\x00\x00")


class TestBmpTruncation:
    def test_truncated_raster_refused(self):
        raw = MM.bmp_encode([[(1, 2, 3)] * 10 for _ in range(4)])
        with pytest.raises(ValueError, match="bmp_codec.*truncated"):
            MM.bmp_codec(raw[:-9])

    def test_oversized_declared_height_refused(self):
        b = bytearray(MM.bmp_encode([[(1, 2, 3)] * 10 for _ in range(4)]))
        struct.pack_into("<i", b, 22, 1 << 20)
        with pytest.raises(ValueError, match="bmp_codec.*truncated"):
            MM.bmp_codec(bytes(b))


class TestStrictSeamArrowBoundary:
    """decode_features (the STRICT path) must surface the codec's
    typed refusal through mapInPandas — the Spark task dies with the
    message, proving no silent skip at the Arrow boundary."""

    def _binary_df(self, spark, payload: bytes, mime: str):
        df = spark.createDataFrame([(1, mime, bytearray(payload))],
                                   "doc_id long, mime string, payload binary")
        return df

    @pytest.mark.parametrize(
        "mime,codec,make",
        [
            ("image/bmp", "bmp_codec.*truncated",
             lambda: MM.bmp_encode([[(9, 9, 9)] * 4 for _ in range(3)])),
            # 9-byte cut lands mid-chunk-header: the walk can't even
            # reach the data chunk, so the refusal is "missing ... data
            # chunk" — still wav_codec's typed ValueError
            ("audio/wav", "wav_codec.*(truncated|missing)",
             lambda: MM.wav_encode([[5, -5, 7, -7]])),
            ("image/x-portable-graymap", "pgm_codec.*truncated",
             lambda: MM.pgm_encode(card(4, 3))),
        ],
    )
    def test_truncated_payload_kills_task_loudly(self, spark, mime, codec, make):
        MM.register_codec("image/bmp", MM.bmp_codec)
        MM.register_codec("audio/wav", MM.wav_codec)
        MM.register_codec("image/x-portable-graymap", MM.pgm_codec)
        raw = make()
        corrupted = raw[: len(raw) - 9]
        out = MM.decode_features(self._binary_df(spark, corrupted, mime))
        with pytest.raises(Exception, match=codec):
            out.collect()

    def test_valid_payloads_still_decode(self, spark):
        MM.register_codec("image/x-portable-graymap", MM.pgm_codec)
        out = MM.decode_features(
            self._binary_df(spark, MM.pgm_encode(card(4, 3)),
                            "image/x-portable-graymap")
        ).collect()
        assert out[0].feature == 12  # 4x3 pixels
