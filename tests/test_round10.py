"""Round-10 additions.

PNG native decode (r9 verdict #5): the decoder must be pinned to the
PNG SPEC, not merely to our own encoder — a symmetric filter bug
(encoder and decoder both deviating the same way) survives round-trip
AND the oracle gate (reconstruction would still equal the original
pixels). So the core tests here feed `_parse_png` HAND-DERIVED filter
vectors: scanline bytes computed by hand from the spec's filter
definitions (RFC 2083 §6 / PNG spec §9) for a fixed 2x2 RGB image,
wrapped in genuine chunks. Any deviation from spec filtering fails
these even if encode/decode stay mutually consistent.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

# struct/np used by both the PNG and JPEG vector builders below

from mwa_uvdata_pipeline_spark.operators.multimodal import (
    _parse_png,
    synth_png_bytes,
)

# fixed 2x2 RGB test image (row-major):
#   row0: (1,2,3) (4,5,6)
#   row1: (7,8,9) (10,11,12)
PIXELS = np.array(
    [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype="i8"
)

# hand-derived filtered scanlines for PIXELS, one per filter type.
# Derivation (bpp=3, left/up/upleft = 0 outside the image):
#   Sub:  f[i] = raw[i] - raw[i-3]
#   Up:   f[i] = raw[i] - up[i]
#   Avg:  f[i] = raw[i] - (left + up) // 2
#   Paeth: predictor = nearest of (left, up, upleft) to left+up-upleft,
#          ties resolved left, then up
HAND_FILTERED = {
    0: [[1, 2, 3, 4, 5, 6], [7, 8, 9, 10, 11, 12]],
    1: [[1, 2, 3, 3, 3, 3], [7, 8, 9, 3, 3, 3]],
    2: [[1, 2, 3, 4, 5, 6], [6, 6, 6, 6, 6, 6]],
    3: [[1, 2, 3, 4, 4, 5], [7, 7, 8, 5, 5, 5]],
    4: [[1, 2, 3, 3, 3, 3], [6, 6, 6, 3, 3, 3]],
}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_from_scanlines(w, h, scanlines) -> bytes:
    raw = b"".join(
        bytes([ft]) + bytes(row) for ft, row in scanlines
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


class TestPngDecoderSpecVectors:
    """Decoder vs hand-derived spec filter vectors (encoder-independent)."""

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_each_filter_type_reconstructs_hand_vector(self, ft):
        rows = HAND_FILTERED[ft]
        data = _png_from_scanlines(2, 2, [(ft, rows[0]), (ft, rows[1])])
        w, h, img = _parse_png(data)
        assert (w, h) == (2, 2)
        assert (img == PIXELS).all(), f"filter {ft} mis-reconstructed"

    def test_mixed_filters_across_rows(self):
        # row0 Average, row1 Paeth — unfiltering must thread the
        # RECONSTRUCTED previous row, not the filtered one
        data = _png_from_scanlines(
            2, 2, [(3, HAND_FILTERED[3][0]), (4, HAND_FILTERED[4][1])]
        )
        _, _, img = _parse_png(data)
        assert (img == PIXELS).all()

    def test_multiple_idat_chunks_concatenate(self):
        raw = (
            bytes([0]) + bytes(HAND_FILTERED[0][0])
            + bytes([0]) + bytes(HAND_FILTERED[0][1])
        )
        z = zlib.compress(raw)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", z[: len(z) // 2])
            + _chunk(b"IDAT", z[len(z) // 2 :])
            + _chunk(b"IEND", b"")
        )
        _, _, img = _parse_png(data)
        assert (img == PIXELS).all()


class TestPngDecoderRejections:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            _parse_png(b"\x88PNG\r\n\x1a\n" + b"\x00" * 40)

    def test_crc_corruption_detected(self):
        data = bytearray(synth_png_bytes(3))
        data[40] ^= 0xFF  # inside a chunk body
        with pytest.raises(ValueError, match="CRC"):
            _parse_png(bytes(data))

    def test_unknown_interlace_method_rejected(self):
        """Round 11 closed the Adam7 seam, so interlace=1 now decodes
        (tests/test_round11.py); any OTHER interlace value stays a
        clean rejection."""
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="interlace"):
            _parse_png(data)

    def test_bad_filter_type_rejected(self):
        data = _png_from_scanlines(
            2, 2, [(0, HAND_FILTERED[0][0]), (5, HAND_FILTERED[0][1])]
        )
        with pytest.raises(ValueError, match="filter"):
            _parse_png(data)

    def test_truncated_idat_rejected(self):
        raw = bytes([0]) + bytes(HAND_FILTERED[0][0])  # one row only
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="truncated|length mismatch"):
            _parse_png(data)


class TestPngRoundTrip:
    """Encoder/decoder consistency over the synthetic corpus shapes."""

    @pytest.mark.parametrize("ft", [None, 0, 1, 2, 3, 4])
    def test_round_trip_every_filter(self, ft):
        for doc_id in (0, 1, 7, 42, 123, 999_999):
            w, h, img = _parse_png(synth_png_bytes(doc_id, filter_type=ft))
            W, H = 5 + doc_id % 11, 3 + doc_id % 6
            assert (w, h) == (W, H)
            x = np.arange(W, dtype="i8")[None, :]
            y = np.arange(H, dtype="i8")[:, None]
            want = np.stack(
                [
                    (doc_id * 3 + x * 7 + y * 11) % 256,
                    (doc_id + x * y) % 256,
                    (x * 5 + y * 3 + doc_id * 2) % 256,
                ],
                axis=2,
            )
            assert (img == want).all(), (ft, doc_id)

    def test_synth_exercises_all_five_filters(self):
        # per-row filter = (doc_id + y) % 5, so any height-8 doc (for
        # instance doc_id 5: h = 3 + 5 % 6 = 8) covers all five
        seen = set()
        for doc_id in range(12):
            h = 3 + doc_id % 6
            seen |= {(doc_id + yy) % 5 for yy in range(h)}
        assert seen == {0, 1, 2, 3, 4}


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _jpeg_headers(w: int = 8, h: int = 8) -> bytes:
    from mwa_uvdata_pipeline_spark.operators.multimodal import (
        _JPEG_QZZ,
        _jpeg_tables,
    )

    (dc_bits, dc_vals), (ac_bits, ac_vals) = _jpeg_tables()
    return (
        b"\xff\xd8"
        + _jpeg_seg(0xFFDB, bytes([0x00]) + bytes(_JPEG_QZZ))
        + _jpeg_seg(
            0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        )
        + _jpeg_seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + _jpeg_seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _jpeg_seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )


class TestJpegDecoder:
    """Baseline JPEG decode pinned to the SPEC, not just to our
    encoder: the AC-path test feeds a HAND-BUILT bitstream (codes
    derived by hand from the canonical table construction) and checks
    against an IDCT written here as the literal T.81 double sum."""

    def test_round_trip_block_constant_exact(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg,
            synth_jpeg_bytes,
        )

        for doc_id in (0, 1, 5, 11, 42, 999, 123456):
            w, h, img = _parse_jpeg(synth_jpeg_bytes(doc_id))
            wb, hb = 1 + doc_id % 4, 1 + doc_id % 3
            assert (w, h) == (wb * 8, hb * 8)
            for by in range(hb):
                for bx in range(wb):
                    v = (doc_id * 7 + bx * 31 + by * 17) % 256
                    blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    assert (blk == v).all(), (doc_id, bx, by)

    def test_ac_coefficient_matches_textbook_idct(self):
        """Hand-built stream: DC cat 0 (code 0000), AC (run 0, size 1)
        = symbol 0x01 at canonical index 1 (code 00000001) + value bit
        1, then EOB (code 00000000), padded with 1s:
        0000 00000001 1 00000000 111 -> bytes 0x00 0x18 0x07."""
        import math

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg,
            _zigzag_order,
        )

        data = _jpeg_headers() + bytes([0x00, 0x18, 0x07]) + b"\xff\xd9"
        w, h, img = _parse_jpeg(data)
        assert (w, h) == (8, 8)
        zz = _zigzag_order()
        F = np.zeros((8, 8))
        r, c = divmod(zz[1], 8)
        F[r][c] = 16.0  # coefficient 1 dequantized by AC step 16
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * F[v][u]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                want = min(255, max(0, round(s / 4 + 128)))
                assert img[y][x] == want, (x, y)

    def test_dc_difference_coding_carries_across_blocks(self):
        """Two-block image where block 1's DC is coded as a DIFFERENCE
        from block 0 — a decoder that forgets the predictor gets block
        1 wrong. synth covers this (wb up to 4), so check explicitly:
        doc 1 has 2x2 blocks with four distinct values."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg,
            synth_jpeg_bytes,
        )

        _, _, img = _parse_jpeg(synth_jpeg_bytes(1))
        vals = {
            img[by * 8, bx * 8] for bx in range(2) for by in range(2)
        }
        want = {(1 * 7 + bx * 31 + by * 17) % 256
                for bx in range(2) for by in range(2)}
        assert vals == want

    def test_lossless_and_arithmetic_sofs_rejected(self):
        """SOF2 (progressive) is DECODED as of round 13 — see
        tests/test_round13.py — so this pin moved to the frame types
        that stay out of scope: lossless (SOF3) and arithmetic-coded
        (SOF9) frames still fail clean."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import _parse_jpeg

        for marker in (0xFFC3, 0xFFC9):
            data = (
                b"\xff\xd8"
                + _jpeg_seg(
                    marker,
                    struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]),
                )
            )
            with pytest.raises(ValueError, match="SOF"):
                _parse_jpeg(data)

    def test_truncated_entropy_detected(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import _parse_jpeg

        # EOI arrives where entropy bits are still needed
        data = _jpeg_headers() + b"\xff\xd9"
        with pytest.raises(ValueError, match="entropy"):
            _parse_jpeg(data)

    def test_not_a_jpeg(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import _parse_jpeg

        with pytest.raises(ValueError, match="SOI"):
            _parse_jpeg(b"\x89PNG\r\n\x1a\n")


class TestJpegColorDecoder:
    """4:2:0 interleaved color: MCU order, per-component predictors,
    per-component quant table selectors, subsampled plane geometry."""

    def test_round_trip_all_planes_exact(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg_ycbcr,
            synth_jpeg_color_bytes,
        )

        for doc_id in (0, 1, 2, 5, 11, 42, 999):
            w, h, Y, Cb, Cr = _parse_jpeg_ycbcr(
                synth_jpeg_color_bytes(doc_id)
            )
            mbw, mbh = 1 + doc_id % 3, 1 + doc_id % 2
            assert (w, h) == (mbw * 16, mbh * 16)
            assert Y.shape == (h, w)
            assert Cb.shape == Cr.shape == (h // 2, w // 2)
            for my in range(mbh):
                for mx in range(mbw):
                    yv = (doc_id * 5 + mx * 19 + my * 23) % 256
                    cbv = (doc_id * 3 + mx * 13 + my * 29) % 256
                    crv = (doc_id * 11 + mx * 7 + my * 31) % 256
                    assert (
                        Y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                        == yv
                    ).all()
                    assert (
                        Cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] == cbv
                    ).all()
                    assert (
                        Cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] == crv
                    ).all()

    def test_per_component_dc_predictors_are_independent(self):
        """doc 5 has 3x2 macroblocks whose Y/Cb/Cr values move with
        DIFFERENT strides — a decoder sharing one predictor across
        components reconstructs wrong constants somewhere."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg_ycbcr,
            synth_jpeg_color_bytes,
        )

        _, _, Y, Cb, Cr = _parse_jpeg_ycbcr(synth_jpeg_color_bytes(5))
        got = {
            (int(Y[my * 16, mx * 16]), int(Cb[my * 8, mx * 8]),
             int(Cr[my * 8, mx * 8]))
            for mx in range(3) for my in range(2)
        }
        want = {
            ((5 * 5 + mx * 19 + my * 23) % 256,
             (5 * 3 + mx * 13 + my * 29) % 256,
             (5 * 11 + mx * 7 + my * 31) % 256)
            for mx in range(3) for my in range(2)
        }
        assert got == want

    def test_grayscale_wrapper_rejects_color(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg,
            synth_jpeg_color_bytes,
        )

        with pytest.raises(ValueError, match="grayscale"):
            _parse_jpeg(synth_jpeg_color_bytes(3))

    def test_ycbcr_to_rgb_hand_values(self):
        """BT.601 full-range spot checks: neutral gray maps to itself;
        the textbook red (Y=81, Cb=90, Cr=240) lands on ~(238,14,14);
        clamping engages at the blue corner."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            ycbcr_to_rgb,
        )

        r, g, b = ycbcr_to_rgb(
            np.array([[128]]), np.array([[128]]), np.array([[128]])
        )
        assert (r[0, 0], g[0, 0], b[0, 0]) == (128, 128, 128)
        r, g, b = ycbcr_to_rgb(
            np.array([[81]]), np.array([[90]]), np.array([[240]])
        )
        assert (r[0, 0], g[0, 0], b[0, 0]) == (238, 14, 14)
        r, g, b = ycbcr_to_rgb(
            np.array([[255]]), np.array([[255]]), np.array([[128]])
        )
        assert b[0, 0] == 255  # clamped: 255 + 1.772*127 > 255

    def test_sampling_beyond_4x4_rejected(self):
        # the cap moved from 2 to the spec's 4 in round 12 (4:1:1
        # support); factor 5 is still out of range
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _jpeg_decode,
        )

        data = (
            b"\xff\xd8"
            + _jpeg_seg(
                0xFFC0,
                struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x51, 0]),
            )
        )
        with pytest.raises(ValueError, match="sampling"):
            _jpeg_decode(data)


class TestFlacDecoder:
    """FLAC from spec: round-trip across all three synthesized
    subframe types, fixed orders 0-4, both CRCs, and a HAND-DERIVED
    Rice bitstream (decoder-independent, like the PNG filter vectors
    and the JPEG AC stream)."""

    def test_round_trip_all_subframe_types(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
            synth_flac_bytes,
        )

        # doc 0: verbatim (0 % 7 == 0); doc 8: constant (b = 0);
        # doc 3: fixed order 1 with nonzero slope
        kinds_seen = set()
        for doc_id in (0, 8, 3, 42, 999):
            rate, s = _parse_flac(synth_flac_bytes(doc_id))
            n = 64 + doc_id % 64
            a = (doc_id * 7) % 2048 - 1024
            b = doc_id % 17 - 8
            want = np.array([a + b * i for i in range(n)], dtype="i8")
            assert rate == 8000
            assert (s == want).all(), doc_id
            kinds_seen.add(
                "verbatim" if doc_id % 7 == 0
                else ("constant" if b == 0 else "fixed")
            )
        assert kinds_seen == {"verbatim", "constant", "fixed"}

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders_reconstruct(self, order):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
            synth_flac_bytes,
        )

        for doc_id in (3, 20, 50):
            _, s = _parse_flac(
                synth_flac_bytes(doc_id, fixed_order=order)
            )
            n = 64 + doc_id % 64
            a = (doc_id * 7) % 2048 - 1024
            b = doc_id % 17 - 8
            assert (
                s == np.array([a + b * i for i in range(n)], dtype="i8")
            ).all(), (order, doc_id)

    def test_hand_derived_rice_stream(self):
        """Decoder vs a Rice stream written out BY HAND from the spec:
        FIXED order 1, k=2, warmup s0=5, residuals [+3, -2].
        zigzag: +3 -> 6 = q1 r2 -> unary '01' + '10'; -2 -> 3 = q0
        r3 -> '1' + '11'. Samples: 5, 8, 6."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _Bits,
            _crc8_flac,
            _crc16_flac,
            _parse_flac,
        )

        n = 3
        si = _Bits()
        si.write(n, 16); si.write(n, 16)
        si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(0, 3); si.write(15, 5)
        si.write(n, 36)
        streaminfo = (
            b"\x80" + (34).to_bytes(3, "big") + si.bytes() + b"\x00" * 16
        )
        hb = _Bits()
        hb.write(0b11111111111110, 14)
        hb.write(0, 2)
        hb.write(0b0111, 4); hb.write(0b0100, 4)
        hb.write(0b0000, 4); hb.write(0b100, 3); hb.write(0, 1)
        hb.write(0x00, 8)
        hb.write(n - 1, 16)
        header = hb.bytes()
        header += bytes([_crc8_flac(header)])
        body = _Bits()
        body.write((0b001000 | 1) << 1, 8)  # FIXED order 1
        body.write(5, 16)                   # warmup s0 = 5
        body.write(0b00, 2)                 # 4-bit Rice method
        body.write(0, 4)                    # partition order 0
        body.write(2, 4)                    # k = 2
        # residual +3: zigzag 6 -> q=1: '0','1', then remainder '10'
        body.write(0b0110, 4)
        # residual -2: zigzag 3 -> q=0: '1', then remainder '11'
        body.write(0b111, 3)
        body.pad_to_byte()
        frame = header + body.bytes()
        frame += _crc16_flac(frame).to_bytes(2, "big")
        rate, s = _parse_flac(b"fLaC" + streaminfo + frame)
        assert rate == 8000
        assert list(s) == [5, 8, 6]

    def test_synth_exercises_all_four_subframe_types(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
            synth_flac_bytes,
        )

        kinds = set()
        for doc_id in range(60):
            _parse_flac(synth_flac_bytes(doc_id))  # must decode exactly
            b = doc_id % 17 - 8
            kinds.add(
                "verbatim" if doc_id % 7 == 0
                else "constant" if b == 0
                else "lpc" if doc_id % 11 == 0
                else "fixed"
            )
        assert kinds == {"verbatim", "constant", "lpc", "fixed"}

    def test_hand_derived_lpc_stream_with_shift(self):
        """LPC arm vs hand-derived bits, NONZERO shift (the synth uses
        shift 0): order 1, qlp=[4], shift=1 -> pred = (4*prev) >> 1.
        Samples [3, 7, 13]: s1 pred 6, r=+1 -> zigzag 2, k=1: '01'+'0';
        s2 pred 14, r=-1 -> zigzag 1, k=1: '1'+'1'."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _Bits,
            _crc8_flac,
            _crc16_flac,
            _parse_flac,
        )

        n = 3
        si = _Bits()
        si.write(n, 16); si.write(n, 16)
        si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(0, 3); si.write(15, 5)
        si.write(n, 36)
        streaminfo = (
            b"\x80" + (34).to_bytes(3, "big") + si.bytes() + b"\x00" * 16
        )
        hb = _Bits()
        hb.write(0b11111111111110, 14); hb.write(0, 2)
        hb.write(0b0111, 4); hb.write(0b0100, 4)
        hb.write(0b0000, 4); hb.write(0b100, 3); hb.write(0, 1)
        hb.write(0x00, 8); hb.write(n - 1, 16)
        header = hb.bytes()
        header += bytes([_crc8_flac(header)])
        body = _Bits()
        body.write(0b100000 << 1, 8)  # LPC order 1, wasted = 0
        body.write(3, 16)             # warmup s0 = 3
        body.write(3, 4)              # precision - 1 = 3
        body.write(1, 5)              # shift = 1
        body.write(4, 4)              # qlp coefficient +4
        body.write(0b00, 2); body.write(0, 4); body.write(1, 4)  # k=1
        body.write(0b010, 3)          # residual +1
        body.write(0b11, 2)           # residual -1
        body.pad_to_byte()
        frame = header + body.bytes()
        frame += _crc16_flac(frame).to_bytes(2, "big")
        rate, s = _parse_flac(b"fLaC" + streaminfo + frame)
        assert list(s) == [3, 7, 13]

    def test_header_crc8_corruption_detected(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
            synth_flac_bytes,
        )

        data = bytearray(synth_flac_bytes(3))
        # flip a bit in the frame header's blocksize field (header
        # byte 4, counting from the 0xFFF8 sync)
        data[data.index(b"\xff\xf8") + 4] ^= 0x01
        with pytest.raises(ValueError, match="CRC-8|sync|blocksize"):
            _parse_flac(bytes(data))

    def test_frame_crc16_corruption_detected(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
            synth_flac_bytes,
        )

        data = bytearray(synth_flac_bytes(3))
        data[-10] ^= 0x01  # inside the subframe payload
        with pytest.raises(ValueError, match="CRC-16"):
            _parse_flac(bytes(data))

    def test_truncated_stream_raises_valueerror(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
            synth_flac_bytes,
        )

        data = synth_flac_bytes(3)
        for cut in (len(data) - 5, len(data) // 2, 45):
            with pytest.raises(ValueError):
                _parse_flac(data[:cut])

    def test_not_flac_rejected(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
        )

        with pytest.raises(ValueError, match="fLaC"):
            _parse_flac(b"RIFF" + b"\x00" * 40)


class TestMp4ContainerScan:
    def test_round_trip_and_internal_consistency(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_mp4,
            synth_mp4_bytes,
        )

        for doc_id in (0, 1, 7, 29, 42, 999):
            meta = _parse_mp4(synth_mp4_bytes(doc_id))
            ns = 2 + doc_id % 29
            assert meta["duration_ms"] == (doc_id % 30 + 1) * 1000
            assert meta["width"] == 16 * (1 + doc_id % 20)
            assert meta["height"] == 16 * (1 + doc_id % 12)
            assert meta["n_samples"] == ns
            assert meta["sum_sample_bytes"] == sum(
                100 + ((doc_id * 13 + i * 7) % 900) for i in range(ns)
            )
            # container-internal cross-check: stsz sum == mdat payload
            assert meta["mdat_bytes"] == meta["sum_sample_bytes"]
            assert meta["timescale"] == 90000

    def test_large_size_box_supported(self):
        """size==1 switches to the 64-bit largesize field (spec §4.2);
        rewrap a synth file's mdat as a large-size box."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_mp4,
            synth_mp4_bytes,
        )

        data = synth_mp4_bytes(3)
        idx = data.index(b"mdat") - 4
        size = int.from_bytes(data[idx : idx + 4], "big")
        body = data[idx + 8 : idx + size]
        large = (
            (1).to_bytes(4, "big") + b"mdat"
            + (len(body) + 16).to_bytes(8, "big") + body
        )
        meta = _parse_mp4(data[:idx] + large)
        assert meta["mdat_bytes"] == len(body)

    def test_fixed_sample_size_stsz(self):
        """stsz with sample_size != 0 carries no per-sample table."""
        import struct

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _mp4_full,
            _parse_mp4,
            synth_mp4_bytes,
        )

        data = synth_mp4_bytes(2)
        fixed = _mp4_full(b"stsz", 0, 0, struct.pack(">II", 50, 7))
        # rebuild a minimal container around the fixed-size stsz
        # (splicing into the original would desync parent box sizes)
        ftyp = data[: data.index(b"moov") - 4]
        mvhd_start = data.index(b"mvhd") - 4
        mvhd_size = int.from_bytes(data[mvhd_start : mvhd_start + 4], "big")
        mvhd = data[mvhd_start : mvhd_start + mvhd_size]
        tkhd_start = data.index(b"tkhd") - 4
        tkhd_size = int.from_bytes(data[tkhd_start : tkhd_start + 4], "big")
        tkhd = data[tkhd_start : tkhd_start + tkhd_size]
        mdhd_start = data.index(b"mdhd") - 4
        mdhd_size = int.from_bytes(data[mdhd_start : mdhd_start + 4], "big")
        mdhd = data[mdhd_start : mdhd_start + mdhd_size]
        stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, 7, 3000))

        def box(t, b):
            return (len(b) + 8).to_bytes(4, "big") + t + b

        stbl = box(b"stbl", fixed + stts)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        mdat = box(b"mdat", b"\x00" * 350)
        meta = _parse_mp4(ftyp + moov + mdat)
        assert meta["n_samples"] == 7
        assert meta["sum_sample_bytes"] == 350
        assert meta["mdat_bytes"] == 350

    def test_sample_slices_match_python_rederivation(self):
        """Frame sampling: offsets from the stsz running sum, byte
        sums from the REAL payload — re-derived in plain Python."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _mp4_sample_slices,
            synth_mp4_bytes,
        )

        for doc_id in (0, 7, 29, 42):
            ns = 2 + doc_id % 29
            sizes = [100 + ((doc_id * 13 + i * 7) % 900)
                     for i in range(ns)]
            want, off = [], 0
            for i, sz in enumerate(sizes):
                if i % 4 == 0:
                    want.append((i, off, sz, sum(
                        (doc_id + off + j) % 256 for j in range(sz)
                    )))
                off += sz
            assert _mp4_sample_slices(synth_mp4_bytes(doc_id)) == want

    def test_sample_slice_offset_error_detectable(self):
        """The mod-256 ramp content makes a one-byte offset error
        change the byte sum (different residue class) for any slice
        whose length is not a multiple of 256."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _mp4_sample_slices,
            synth_mp4_bytes,
        )

        doc_id = 7
        good = _mp4_sample_slices(synth_mp4_bytes(doc_id))
        for i, off, sz, bsum in good:
            if sz % 256 == 0:
                continue
            shifted = sum(
                (doc_id + off + 1 + j) % 256 for j in range(sz)
            )
            assert shifted != bsum, (i, off, sz)

    def test_truncated_rejected(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_mp4,
            synth_mp4_bytes,
        )

        data = synth_mp4_bytes(4)
        # every truncation point must surface as ValueError (box-size
        # checks for clean cuts, the struct wrap for mid-header cuts)
        for cut in (len(data) - 20, len(data) // 2, 30, 9):
            with pytest.raises(ValueError):
                _parse_mp4(data[:cut])


class TestStreamQuantileDrift:
    def test_streaming_estimates_inherit_rank_error_envelope(self, spark):
        """stream_quantile_drift_exec (r9 verdict #7): the p50/p90/p99
        read off the DRAINED stream state must (a) equal a pure-Python
        re-derivation of the one-dollar-bin histogram + capped
        interpolation + exact rank recount, and (b) respect the same
        |rank_err| <= bin_pop envelope the batch audit proves — the
        estimate and its target rank share a bin by construction, and
        the streaming fold must not break that."""
        from decimal import ROUND_HALF_UP, Decimal

        from tests.conftest import SF_SMALL

        from mwa_uvdata_pipeline_spark.plans import load_all, load_events

        cents = [
            int(
                Decimal(repr(r["value"] * 100)).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP
                )
            )
            for r in load_events(spark, SF_SMALL).select("value").collect()
        ]
        n = len(cents)
        hist: dict[int, int] = {}
        for c in cents:
            hist[c // 100] = hist.get(c // 100, 0) + 1
        want = {}
        for q in (50, 90, 99):
            k = (q * n + 99) // 100
            cumc = 0
            for b in sorted(hist):
                before, cumc = cumc, cumc + hist[b]
                if cumc >= k > before:
                    est = min(
                        b * 100 + ((k - before) * 100) // hist[b],
                        b * 100 + 99,
                    )
                    rank = sum(1 for c in cents if c <= est)
                    want[q] = (n, k, est, rank, rank - k, hist[b])
                    break
        got = {
            r["q"]: (
                r["n"],
                r["k_target"],
                r["est_cents"],
                r["actual_rank"],
                r["rank_err"],
                r["bin_pop"],
            )
            for r in load_all()["stream_quantile_drift_exec"]
            .spark(spark, SF_SMALL)
            .collect()
        }
        assert got == want
        for q, (_, _, _, _, err, pop) in got.items():
            assert abs(err) <= pop, (q, err, pop)


class TestConfigSurfaceGates:
    """x8/x9 (r10): the SQL twins gate the RULE cross-engine; these
    tests tie each gated column to the ACTUAL Python implementation
    (sources.compute_optimal_batches / SelectOptions.suffix) so the
    oracle, the Spark column math, and the driver-side helper are
    provably the same logic."""

    def test_x8_rows_match_compute_optimal_batches(self, spark):
        from tests.conftest import SF_SMALL

        from mwa_uvdata_pipeline_spark.plans import PLANS, load_all
        from mwa_uvdata_pipeline_spark.sources import (
            compute_optimal_batches,
        )

        load_all()
        rows = PLANS["x8_batch_plan"].spark(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert r["n_batches"] == compute_optimal_batches(
                size_gb=r["size_units"], avail_mem_gb=1_000_000
            ), dict(r.asDict())
            assert r["predicted"] == r["size_units"] * 7

    def test_x9_rows_match_select_options_suffix(self, spark):
        from tests.conftest import SF_SMALL

        from mwa_uvdata_pipeline_spark.operators.select import (
            SelectOptions,
        )
        from mwa_uvdata_pipeline_spark.plans import PLANS, load_all

        load_all()
        rows = PLANS["x9_output_suffix"].spark(spark, SF_SMALL).collect()
        assert rows
        seen_empty = seen_all_arms = False
        for r in rows:
            opts = SelectOptions(
                spectrum_type=r["spectrum_type"],
                sel_ants=list(range(1, r["nsel"] + 1)) or None,
                sel_pols=["xx", "yy"][: r["npol"]] or None,
            )
            assert opts.suffix() == r["suffix"], dict(r.asDict())
            if r["suffix"] == "":
                seen_empty = True
            if (
                r["spectrum_type"] != "all"
                and r["nsel"] > 0
                and r["npol"] > 0
            ):
                seen_all_arms = True
        assert seen_empty, "combination frame never hit all-defaults"
        assert seen_all_arms, "combination frame never hit every tag arm"

    def test_s7_roundtrip_values_match_direct_aggregate(self, spark):
        from tests.conftest import SF_SMALL

        from mwa_uvdata_pipeline_spark.plans import PLANS, load_all

        load_all()
        got = {
            (r["lang"], r["source"]): (r["n_docs"], r["sum_chars"])
            for r in PLANS["s7_tsv_roundtrip"]
            .spark(spark, SF_SMALL)
            .collect()
        }
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        want = {
            (r["lang"], r["source"]): (r["n"], r["s"])
            for r in docs.groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("s"),
            )
            .collect()
        }
        assert got == want


class TestPngSparkPlan:
    def test_m_png_native_matches_formula(self, spark):
        from tests.conftest import SF_SMALL

        from mwa_uvdata_pipeline_spark.plans import PLANS, load_all

        load_all()
        rows = PLANS["m_png_native"].spark(spark, SF_SMALL).collect()
        assert rows, "empty decode result"
        for r in rows[:25]:
            d = r["doc_id"]
            W, H = 5 + d % 11, 3 + d % 6
            assert (r["width"], r["height"]) == (W, H)
            x = np.arange(W, dtype="i8")[None, :]
            y = np.arange(H, dtype="i8")[:, None]
            assert r["sum_r"] == int(((d * 3 + x * 7 + y * 11) % 256).sum())
            assert r["sum_g"] == int(((d + x * y) % 256).sum())
            assert r["sum_b"] == int(((x * 5 + y * 3 + d * 2) % 256).sum())
