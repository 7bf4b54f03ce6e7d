"""Baseline-JPEG luma decode (operators/jpegdec.py): pure-stdlib
huffman + dequant + IDCT, validated against the module's own annex-K
encoder (independent forward path: FDCT + quant + huffman encode) and
analytic DCT facts — no image library anywhere.

Reference parity note: LibreCrawl keeps image bytes opaque and leans
on PIL out-of-engine; this suite proves the engine-side stand-in
produces true pixels for the dominant web format."""

import random

import pytest


def _maxdiff(a, b):
    return max(abs(x - y) for ra, rb in zip(a, b) for x, y in zip(ra, rb))


class TestJpegLumaDecode:
    def test_solid_exact(self):
        """A solid block quantizes losslessly: DC = 8*(v-128)/16 rounds
        exactly for v=130? No — assert within 1, and exactness for
        v=128 (all-zero coefficients)."""
        from librecrawl_spark.operators.jpegdec import (
            decode_jpeg_luma, make_test_jpeg)

        img = [[128] * 16 for _ in range(16)]
        assert decode_jpeg_luma(make_test_jpeg(img)) == img
        img2 = [[130] * 16 for _ in range(16)]
        out = decode_jpeg_luma(make_test_jpeg(img2))
        assert _maxdiff(img2, out) <= 1

    def test_gradient_roundtrip_odd_dims(self):
        """Smooth content survives annex-K quantization within a small
        bound; non-multiple-of-8 dims are edge-padded by the encoder
        and cropped by the decoder."""
        from librecrawl_spark.operators.jpegdec import (
            decode_jpeg_luma, make_test_jpeg)

        img = [[(x * 255) // 23 for x in range(24)] for _ in range(17)]
        out = decode_jpeg_luma(make_test_jpeg(img))
        assert len(out) == 17 and len(out[0]) == 24
        assert _maxdiff(img, out) <= 4

    def test_color_sampling_variants(self):
        """3-component YCbCr at 4:4:4 and 4:2:0: chroma blocks are
        entropy-decoded (the bitstream can't be skipped) and the luma
        plane still reconstructs — including the 2x2-luma-blocks-per-
        MCU geometry and odd frame dims."""
        from librecrawl_spark.operators.jpegdec import (
            decode_jpeg_luma, make_test_jpeg)

        img = [[(x * 8 + y * 3) % 256 for x in range(16)] for y in range(16)]
        out = decode_jpeg_luma(make_test_jpeg(img, chroma=(100, 140)))
        assert _maxdiff(img, out) <= 4
        img2 = [[(x * 5) % 256 for x in range(19)] for y in range(21)]
        out2 = decode_jpeg_luma(
            make_test_jpeg(img2, chroma=(90, 60), sampling=(2, 2)))
        assert len(out2) == 21 and len(out2[0]) == 19
        assert _maxdiff(img2, out2) <= 4

    def test_restart_markers_invariant(self):
        """RSTn markers change the byte stream (DC predictor resets,
        byte realignment) but not the decoded pixels: with/without
        restart must decode identically, grayscale and 4:2:0."""
        from librecrawl_spark.operators.jpegdec import (
            decode_jpeg_luma, make_test_jpeg)

        rnd = random.Random(3)
        img = [[rnd.randrange(256) for _ in range(32)] for _ in range(32)]
        assert decode_jpeg_luma(make_test_jpeg(img, restart_interval=3)) \
            == decode_jpeg_luma(make_test_jpeg(img))
        assert decode_jpeg_luma(
            make_test_jpeg(img, chroma=(128, 128), sampling=(2, 2),
                           restart_interval=2)) \
            == decode_jpeg_luma(
                make_test_jpeg(img, chroma=(128, 128), sampling=(2, 2)))

    def test_out_of_scope_rejection(self):
        """Malformed frames (precision != 8), arithmetic coding,
        table-less header fixtures, and non-JPEG bytes return None —
        the documented fake-fallback contract, never an exception."""
        from librecrawl_spark.operators.jpegdec import decode_jpeg_luma
        from librecrawl_spark.operators.multimodal import make_test_jpeg_header

        # SOF2 with precision 0 (malformed progressive header)
        assert decode_jpeg_luma(
            b"\xff\xd8\xff\xc2\x00\x10" + b"\x00" * 14) is None
        # SOF9 (arithmetic-coded extended sequential) is out of scope
        assert decode_jpeg_luma(
            b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00") is None
        assert decode_jpeg_luma(make_test_jpeg_header(4, 4)) is None
        assert decode_jpeg_luma(b"not a jpeg") is None
        assert decode_jpeg_luma(b"") is None
        # truncated entropy stream
        from librecrawl_spark.operators.jpegdec import make_test_jpeg
        good = make_test_jpeg([[90] * 16 for _ in range(16)])
        assert decode_jpeg_luma(good[:len(good) - 40]) is None

    def test_progressive_equals_baseline(self):
        """Progressive (SOF2) decode: spectral-selection + successive-
        approximation scans accumulate the SAME quantized coefficients
        a sequential stream carries, so progressive and baseline
        encodings of one image must decode to IDENTICAL pixels — over
        gradients, noise, grayscale/color, 4:4:4/4:2:0, odd dims, and
        restart intervals (EOB runs, ZRL-interleaved correction bits,
        and DC/AC refinement all exercised by the noise cases)."""
        import random

        from librecrawl_spark.operators.jpegdec import (
            decode_jpeg_luma, make_test_jpeg, make_test_jpeg_progressive)

        rnd = random.Random(11)

        def noise(w, h):
            return [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]

        grad = [[(x * 255) // 15 for x in range(16)] for _ in range(16)]
        cases = [
            (grad, None, (1, 1), 0),
            (noise(24, 17), None, (1, 1), 0),
            ([[128] * 16 for _ in range(16)], None, (1, 1), 0),
            (noise(20, 20), (90, 160), (2, 2), 0),
            (noise(40, 16), None, (1, 1), 2),
            (noise(33, 18), (128, 128), (2, 2), 1),
            (noise(17, 9), (64, 200), (1, 1), 3),
        ]
        for t in range(8):   # deterministic fuzz tail
            w, h = rnd.randrange(8, 40), rnd.randrange(8, 40)
            chroma = None if t % 3 == 0 else (rnd.randrange(256),
                                              rnd.randrange(256))
            samp = (1, 1) if chroma is None or t % 2 else (2, 2)
            cases.append((noise(w, h), chroma, samp,
                          rnd.choice([0, 1, 2, 5])))
        for luma, chroma, samp, ri in cases:
            base = decode_jpeg_luma(make_test_jpeg(luma, chroma, samp, ri))
            prog = decode_jpeg_luma(
                make_test_jpeg_progressive(luma, chroma, samp, ri))
            assert base is not None and prog == base, (chroma, samp, ri)

    def test_progressive_features_real_in_pipeline(self, spark):
        """image_features serves REAL pixel features for progressive
        JPEG payloads — same mean_luma/phash as the baseline encoding
        of the same image."""
        from librecrawl_spark.operators.jpegdec import (
            make_test_jpeg, make_test_jpeg_progressive)
        from librecrawl_spark.operators.multimodal import (
            MEDIA_SCHEMA, image_features)

        grad = [[(x * 255) // 23 for x in range(24)] for _ in range(16)]
        rows = [
            ("p0", "image", bytearray(make_test_jpeg_progressive(grad)),
             ("image/jpeg", 0, 0, 0)),
            ("b0", "image", bytearray(make_test_jpeg(grad)),
             ("image/jpeg", 0, 0, 0)),
        ]
        m = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        out = {r["media_id"]: r.asDict() for r in image_features(m).collect()}
        p, b = out["p0"], out["b0"]
        assert (p["width"], p["height"]) == (24, 16)
        assert p["phash"] == b["phash"] == "f" * 16  # left-to-right brightening
        assert p["mean_luma"] == b["mean_luma"]

    def test_dhash_gradient_analytic(self):
        """The dHash contract holds through the JPEG path: a strictly
        left-to-right brightening ramp hashes to all-ones, its vertical
        transpose to all-zeros (same analytic oracle as the PNG suite)."""
        from librecrawl_spark.operators.jpegdec import make_test_jpeg
        from librecrawl_spark.operators.multimodal import real_image_features

        ramp_h = [[16 + x * 24 for x in range(10)] for _ in range(12)]
        ramp_v = [[16 + y * 20 for _ in range(10)] for y in range(12)]
        fh = real_image_features(make_test_jpeg(ramp_h))
        fv = real_image_features(make_test_jpeg(ramp_v))
        assert fh["phash"] == "f" * 16
        assert fv["phash"] == "0" * 16
        assert (fh["width"], fh["height"]) == (10, 12)

    def test_pipeline_real_for_decodable_jpeg(self, spark):
        """image_features serves REAL pixel features for a decodable
        JPEG payload (solid gray -> exact mean_luma, zero dHash) while
        the header-only JPEG fixture still takes the fake path."""
        from librecrawl_spark.operators.jpegdec import make_test_jpeg
        from librecrawl_spark.operators.multimodal import (
            MEDIA_SCHEMA, image_features, make_test_jpeg_header)

        solid = make_test_jpeg([[128] * 16 for _ in range(16)],
                               chroma=(128, 128))
        rows = [("j0", "image", bytearray(solid), ("image/jpeg", 16, 16, 0)),
                ("j1", "image", bytearray(make_test_jpeg_header(6, 5)),
                 ("image/jpeg", 6, 5, 0))]
        m = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in image_features(m).collect()}
        assert out["j0"]["phash"] == "0" * 16
        assert out["j0"]["mean_luma"] == round(128 / 255.0, 6)
        assert (out["j0"]["width"], out["j0"]["height"]) == (16, 16)
        # header-only: real dims from the header, fake pixel features
        assert (out["j1"]["width"], out["j1"]["height"]) == (6, 5)
        assert len(out["j1"]["phash"]) == 16


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
