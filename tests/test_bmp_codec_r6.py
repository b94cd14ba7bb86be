"""Round-6 BMP codec unit tests: the one REAL (non-fake) media codec
shipped through the injectable seam (VERDICT r5 item 5). Pure
stdlib — no Spark needed for the codec itself; one end-to-end test
drives the registered entry."""

from __future__ import annotations

import pytest

from parking_violations_data_pipeline_spark.operators import multimodal as MM


def card(w, h, f):
    return [[f(x, y) for x in range(w)] for y in range(h)]


class TestRoundtrip:
    def test_identity_various_sizes(self):
        # widths chosen to hit every stride-padding remainder (w*3 % 4)
        for w, h in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 1), (10, 6)]:
            px = card(w, h, lambda x, y: ((x * 37) % 256, (y * 53) % 256, (x + y) % 256))
            img = MM.bmp_codec(MM.bmp_encode(px))
            assert (img.width, img.height) == (w, h)
            assert img.pixels == px

    def test_row_order_is_top_down(self):
        # top row red, bottom row blue: a decoder that forgets BMP's
        # bottom-up storage returns them swapped
        px = [[(255, 0, 0)] * 2, [(0, 0, 255)] * 2]
        img = MM.bmp_codec(MM.bmp_encode(px))
        assert img.pixels[0][0] == (255, 0, 0)
        assert img.pixels[1][0] == (0, 0, 255)

    def test_channel_order_untangled(self):
        # pure red: stored on disk as BGR, must come back as (r,g,b)
        img = MM.bmp_codec(MM.bmp_encode([[(200, 10, 30)]]))
        assert img.pixels[0][0] == (200, 10, 30)


class TestRefusals:
    def test_not_a_bmp(self):
        with pytest.raises(ValueError, match="magic"):
            MM.bmp_codec(b"PNG....definitely-not-bmp" + b"\x00" * 60)

    def test_unsupported_bpp(self):
        raw = bytearray(MM.bmp_encode([[(1, 2, 3)]]))
        raw[28] = 8  # claim 8 bpp
        with pytest.raises(ValueError, match="24-bit"):
            MM.bmp_codec(bytes(raw))


class TestSeamEndToEnd:
    def test_entry_decodes_real_bytes(self, spark):
        from parking_violations_data_pipeline_spark.registry import (
            REGISTRY,
            all_queries,
        )

        all_queries()  # populate the registry
        got = REGISTRY["m_bmp_decode"].fn(spark, "/root/testdata/sf0.001").toPandas()
        assert len(got) == 8
        w, h = 10, 6
        for _, row in got.iterrows():
            did = int(row.doc_id)
            vs = [(did * 7 + y * w + x) % 254 for y in range(h) for x in range(w)]
            assert (int(row.width), int(row.height)) == (w, h)
            assert int(row.checksum) == sum(3 * v + 3 for v in vs)
            assert int(row.weighted) == sum(
                (1 + x + y * w) * ((did * 7 + y * w + x) % 254)
                for y in range(h)
                for x in range(w)
            )
