"""Round-6 WAV codec unit tests: the second REAL media codec through
the injectable seam (audio family, companion to the BMP one). Pure
stdlib — no Spark needed for the codec itself; one end-to-end test
drives the registered entry."""

from __future__ import annotations

import struct

import pytest

from parking_violations_data_pipeline_spark.operators import multimodal as MM


class TestRoundtrip:
    def test_identity_mono_and_stereo(self):
        for chans in (
            [[0, 1, -1, 32767, -32768, 500]],
            [[10, -20, 30], [-40, 50, -60]],
            [[7] * 24, [-7] * 24, [0] * 24],  # 3 channels
        ):
            wav = MM.wav_codec(MM.wav_encode(chans, sample_rate=44100))
            assert wav.sample_rate == 44100
            assert wav.n_channels == len(chans)
            assert wav.n_frames == len(chans[0])
            assert wav.channels == chans

    def test_channels_deinterleaved(self):
        # frame-major on disk: L0 R0 L1 R1 — a decoder that slices
        # halves instead of striding returns wrong channels
        wav = MM.wav_codec(MM.wav_encode([[1, 2, 3], [-1, -2, -3]]))
        assert wav.channels[0] == [1, 2, 3]
        assert wav.channels[1] == [-1, -2, -3]

    def test_sign_is_twos_complement(self):
        wav = MM.wav_codec(MM.wav_encode([[-1]]))
        assert wav.channels[0][0] == -1  # 0xFFFF must not read as 65535

    def test_list_chunk_is_walked_not_assumed(self):
        # the encoder plants a LIST chunk before data; byte 36 is NOT
        # the 'data' header — assert that directly so a regression in
        # the encoder cannot silently weaken the decoder test
        raw = MM.wav_encode([[5, 6]])
        assert raw[36:40] != b"data"
        assert MM.wav_codec(raw).channels == [[5, 6]]

    def test_odd_size_chunk_padding(self):
        # RIFF word-aligns odd-sized chunks; plant a 3-byte junk chunk
        raw = MM.wav_encode([[9, -9]])
        fmt_at = raw.index(b"fmt ")
        junk = struct.pack("<4sI", b"junk", 3) + b"abc" + b"\x00"  # pad byte
        patched = raw[:fmt_at] + junk + raw[fmt_at:]
        patched = (
            struct.pack("<4sI", b"RIFF", len(patched) - 8) + patched[8:]
        )
        assert MM.wav_codec(patched).channels == [[9, -9]]


class TestRefusals:
    def test_not_a_wav(self):
        with pytest.raises(ValueError, match="RIFF"):
            MM.wav_codec(b"OggS" + b"\x00" * 60)

    def test_unsupported_bits(self):
        raw = bytearray(MM.wav_encode([[1, 2]]))
        at = bytes(raw).index(b"fmt ") + 8 + 14  # bits_per_sample field
        struct.pack_into("<H", raw, at, 8)
        with pytest.raises(ValueError, match="16-bit"):
            MM.wav_codec(bytes(raw))

    def test_non_pcm_refused(self):
        raw = bytearray(MM.wav_encode([[1, 2]]))
        at = bytes(raw).index(b"fmt ") + 8  # audio_format field
        struct.pack_into("<H", raw, at, 3)  # IEEE float
        with pytest.raises(ValueError, match="PCM"):
            MM.wav_codec(bytes(raw))

    def test_zero_channels_refused(self):
        # ADVICE r6: 0 channels used to surface as a raw
        # ZeroDivisionError instead of the documented loud refusal
        raw = bytearray(MM.wav_encode([[1, 2]]))
        at = bytes(raw).index(b"fmt ") + 8 + 2  # n_channels field
        struct.pack_into("<H", raw, at, 0)
        with pytest.raises(ValueError, match="wav_codec.*0 channels"):
            MM.wav_codec(bytes(raw))

    def test_truncated_data_chunk_refused(self):
        # ADVICE r6: a data chunk whose declared size exceeds the
        # remaining payload was silently truncated (n_frames shrank)
        raw = bytearray(MM.wav_encode([[1, 2, 3, 4]]))
        at = bytes(raw).index(b"data") + 4  # declared data size
        struct.pack_into("<I", raw, at, 1 << 20)
        with pytest.raises(ValueError, match="wav_codec.*truncated"):
            MM.wav_codec(bytes(raw))

    def test_truncated_payload_refused(self):
        # cutting the tail off a valid file must refuse, not shrink
        raw = MM.wav_encode([[1, 2, 3, 4, 5, 6, 7, 8]])
        with pytest.raises(ValueError, match="wav_codec.*truncated"):
            MM.wav_codec(raw[:-5])


class TestSeamEndToEnd:
    def test_entry_decodes_real_bytes(self, spark):
        from parking_violations_data_pipeline_spark.registry import (
            REGISTRY,
            all_queries,
        )

        all_queries()
        got = REGISTRY["m_wav_decode"].fn(spark, "/root/testdata/sf0.001").toPandas()
        assert len(got) == 8
        n = 24
        for _, row in got.iterrows():
            did = int(row.doc_id)
            left = [((did * 31 + i * 7) % 2003) - 1001 for i in range(n)]
            right = [((did * 17 + i * 5) % 2003) - 1001 for i in range(n)]
            assert (int(row.sample_rate), int(row.n_channels), int(row.n_frames)) == (
                8000,
                2,
                n,
            )
            assert int(row.left_sum) == sum(left)
            assert int(row.right_weighted) == sum(
                (i + 1) * v for i, v in enumerate(right)
            )
