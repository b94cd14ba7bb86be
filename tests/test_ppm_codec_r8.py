"""Round-8: PPM (P6) codec — the fourth real codec through the seam
and the first color one. Pure-Python coverage (no Spark session):
encode/decode roundtrips both raster widths, header traps, channel
order, refusal paths, and the two round-8 boundary-corruption classes
across ALL four codecs (the quarantine-escape contract: every refusal
must be the typed ValueError, never struct.error)."""

from __future__ import annotations

import struct

import pytest

from parking_violations_data_pipeline_spark.operators import multimodal as MM


def card(w, h, maxval, did=3):
    return [
        [
            tuple((did * 7 + y * 11 + x * 3 + c) % (maxval + 1) for c in range(3))
            for x in range(w)
        ]
        for y in range(h)
    ]


def test_ppm_roundtrip_1byte():
    px = card(7, 4, 255)
    d = MM.ppm_codec(MM.ppm_encode(px, maxval=255))
    assert (d.width, d.height, d.maxval) == (7, 4, 255)
    assert d.pixels == px
    assert len(d) == 28


def test_ppm_roundtrip_2byte_bigendian():
    px = card(3, 2, 1000)
    raw = MM.ppm_encode(px, maxval=1000)
    d = MM.ppm_codec(raw)
    assert d.maxval == 1000 and d.pixels == px
    # 2 bytes per sample, big-endian: raster is 3*2*3*2 = 36 bytes
    header_end = raw.index(b"1000\n") + 5
    assert len(raw) - header_end == 36


def test_ppm_header_comment_and_whitespace():
    raw = b"P6\n# a comment\n# another\n  3\t2\n255\n" + bytes(range(18))
    d = MM.ppm_codec(raw)
    assert (d.width, d.height) == (3, 2)
    assert d.pixels[0][0] == (0, 1, 2)  # RGB order, interleaved


def test_ppm_channel_order_not_swapped():
    px = [[(10, 20, 30)]]
    d = MM.ppm_codec(MM.ppm_encode(px))
    assert d.pixels[0][0] == (10, 20, 30)  # a BGR bug would yield (30, 20, 10)


def test_ppm_refusals():
    with pytest.raises(ValueError, match="P6"):
        MM.ppm_codec(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated header"):
        MM.ppm_codec(b"P6\n3")
    with pytest.raises(ValueError, match="declares"):
        MM.ppm_codec(b"P6\n2 2\n255\n" + b"\x00" * 5)
    with pytest.raises(ValueError, match="exceeds declared maxval"):
        MM.ppm_codec(b"P6\n1 1\n10\n" + bytes([5, 11, 3]))
    with pytest.raises(ValueError, match="unterminated"):
        MM.ppm_codec(b"P6\n# no newline")
    with pytest.raises(ValueError, match="ragged"):
        MM.ppm_encode([[(1, 2, 3)], [(1, 2, 3), (4, 5, 6)]])
    with pytest.raises(ValueError, match="outside"):
        MM.ppm_encode([[(300, 0, 0)]], maxval=255)
    with pytest.raises(ValueError, match="r, g, b"):
        MM.ppm_encode([[(1, 2)]])


def test_ppm_int_boundary_overflow_refuses_on_arithmetic():
    # forged 65535x65535 header: declared raster ~12.8 GB; must refuse
    # by comparing against remaining bytes, never attempt the slice
    raw = MM.ppm_encode(card(6, 2, 255))
    forged = raw.replace(b"6 2\n", b"65535 65535\n", 1)
    with pytest.raises(ValueError, match="declares"):
        MM.ppm_codec(forged)


# --- the round-8 boundary classes must be typed refusals on EVERY codec ---


def test_bmp_midheader_truncation_is_typed():
    raw = MM.bmp_encode([[(1, 2, 3), (4, 5, 6)]])
    for cut in (2, 10, 13, 22, 30, 53):
        with pytest.raises(ValueError):
            MM.bmp_codec(raw[:cut])


def test_bmp_invalid_dimensions_are_typed():
    raw = bytearray(MM.bmp_encode([[(1, 2, 3)]]))
    struct.pack_into("<i", raw, 18, 0)  # width = 0
    with pytest.raises(ValueError, match="dimensions"):
        MM.bmp_codec(bytes(raw))


def test_wav_small_fmt_chunk_is_typed():
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 8)
        + b"\x01\x00\x02\x00\x44\xac\x00\x00"
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="fmt chunk"):
        MM.wav_codec(raw)


def test_wav_declared_size_overflow_is_typed():
    raw = MM.wav_encode([[0, 1, -1, 2]])
    at = raw.index(b"data") + 4
    b = bytearray(raw)
    struct.pack_into("<I", b, at, 0xFFFFFFFE)
    with pytest.raises(ValueError, match="remain"):
        MM.wav_codec(bytes(b))


def test_pgm_header_token_truncation_is_typed():
    raw = MM.pgm_encode([[1, 2], [3, 4]])
    sp = raw.index(b"\n", 3)
    with pytest.raises(ValueError, match="truncated header"):
        MM.pgm_codec(raw[: sp + 2])


def test_pgm_encode_rejects_out_of_range_samples():
    with pytest.raises(ValueError, match="outside"):
        MM.pgm_encode([[256]], maxval=255)
    with pytest.raises(ValueError, match="outside"):
        MM.pgm_encode([[-1]], maxval=255)
