"""Property tests for the round-13 codec surfaces: ARBITRARY content
(not the formula-bound corpus) through encode → decode — progressive
JPEG with random coefficients at random zigzag positions and a random
spectral split (exercising EOB runs, ZRL, correction bits, and
newly-significant insertions wherever the draw puts them), GIF with
random index grids / palettes / interlace, and the GIF LZW pair over
arbitrary symbol streams."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mwa_uvdata_pipeline_spark.operators.multimodal import (
    _BitWriter,
    _JPEG_QZZ,
    _emit_ac_first,
    _emit_ac_refine,
    _gif_interlace_rows,
    _gif_lzw_decode,
    _gif_lzw_encode,
    _huff_codes,
    _jpeg_prog_tables,
    _parse_gif,
    _parse_jpeg,
    _zigzag_order,
)


def _encode_progressive(blocks, wb: int, hb: int, split: int) -> bytes:
    """Grayscale SOF2 stream over wb x hb blocks of arbitrary
    QUANTIZED zigzag coefficient vectors, six scans: DC first (Al=1),
    two AC-first bands split at ``split`` (Al=1), DC refine, two
    AC-refine bands (Al=0)."""
    import struct

    (dc_bits, dc_vals), (ac_bits, ac_vals) = _jpeg_prog_tables()
    dc_codes = _huff_codes(dc_bits, dc_vals)
    ac_codes = _huff_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    pred = 0
    for c in blocks:
        t = c[0] >> 1
        diff = t - pred
        pred = t
        size = abs(diff).bit_length()
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(diff if diff >= 0 else diff + (1 << size) - 1,
                     size)
    scans = [(bytes([1, 1, 0x00, 0, 0, 0x01]), bw.flush())]

    for ss, se, ah, al in (
        (1, split, 0, 1),
        (split + 1, 63, 0, 1),
    ):
        bw = _BitWriter()
        _emit_ac_first(bw, ac_codes, [c[ss : se + 1] for c in blocks],
                       al)
        scans.append((bytes([1, 1, 0x00, ss, se, (ah << 4) | al]),
                      bw.flush()))

    bw = _BitWriter()
    for c in blocks:
        bw.write(c[0] & 1, 1)
    scans.append((bytes([1, 1, 0x00, 0, 0, 0x10]), bw.flush()))

    for ss, se in ((1, split), (split + 1, 63)):
        bw = _BitWriter()
        _emit_ac_refine(bw, ac_codes, [c[ss : se + 1] for c in blocks],
                        0)
        scans.append((bytes([1, 1, 0x00, ss, se, 0x10]), bw.flush()))

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0x00]) + bytes(_JPEG_QZZ))
        + seg(
            0xFFC2,
            struct.pack(">BHHB", 8, hb * 8, wb * 8, 1)
            + bytes([1, 0x11, 0]),
        )
        + seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    )
    for sos_body, entropy in scans:
        out += seg(0xFFDA, sos_body) + entropy
    return out + b"\xff\xd9"


def _expected_decode(blocks, wb: int, hb: int):
    """Dequantize + textbook IDCT + level shift + round + clamp —
    computed independently of the decoder (same double math, so
    equality is exact)."""
    zz = _zigzag_order()
    u = np.arange(8)
    cu = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    basis = 0.5 * cu[:, None] * np.cos(
        (2 * u[None, :] + 1) * u[:, None] * np.pi / 16
    )
    img = np.zeros((hb * 8, wb * 8), dtype="i8")
    for i, c in enumerate(blocks):
        by, bx = divmod(i, wb)
        blk = np.zeros(64)
        for k, v in enumerate(c):
            blk[zz[k]] = v * _JPEG_QZZ[k]
        f = basis.T @ blk.reshape(8, 8) @ basis
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
            np.round(f + 128), 0, 255
        ).astype("i8")
    return img


class TestProgressiveJpegProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_round_trip_arbitrary_coefficients(self, data):
        wb = data.draw(st.integers(1, 4))
        hb = data.draw(st.integers(1, 3))
        split = data.draw(st.integers(1, 62))
        blocks = []
        for _ in range(wb * hb):
            c = [0] * 64
            c[0] = data.draw(st.integers(-128, 127))
            for _ in range(data.draw(st.integers(0, 6))):
                k = data.draw(st.integers(1, 63))
                c[k] = data.draw(
                    st.integers(-15, 15).filter(lambda v: v != 0)
                )
            blocks.append(c)
        blob = _encode_progressive(blocks, wb, hb, split)
        w, h, img = _parse_jpeg(blob)
        assert (w, h) == (wb * 8, hb * 8)
        assert (img == _expected_decode(blocks, wb, hb)).all()


class TestGifProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_round_trip_arbitrary_grid_palette_interlace(self, data):
        w = data.draw(st.integers(1, 24))
        h = data.draw(st.integers(1, 16))
        size_field = data.draw(st.integers(1, 7))
        nc = 2 << size_field
        m = max(2, size_field + 1)
        interlace = data.draw(st.booleans())
        idx = [
            [data.draw(st.integers(0, nc - 1)) for _ in range(w)]
            for _ in range(h)
        ]
        pal = [
            tuple(data.draw(st.integers(0, 255)) for _ in range(3))
            for _ in range(nc)
        ]
        rows = _gif_interlace_rows(h) if interlace else range(h)
        flat = [k for y in rows for k in idx[y]]
        lzw = _gif_lzw_encode(flat, m)
        subs = bytearray()
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            subs += bytes([len(chunk)]) + chunk
        subs += b"\x00"
        gct = bytes(b for rgb in pal for b in rgb)
        blob = (
            b"GIF89a"
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0x80 | size_field, 0, 0]) + gct
            + b"\x2c" + bytes(4)
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0x40 if interlace else 0x00, m])
            + bytes(subs) + b"\x3b"
        )
        gw, gh, img = _parse_gif(blob)
        assert (gw, gh) == (w, h)
        for y in range(h):
            for x in range(w):
                assert tuple(img[y, x]) == pal[idx[y][x]], (x, y)


class TestGifLzwProperties:
    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def test_round_trip_arbitrary_streams(self, data):
        m = data.draw(st.integers(2, 8))
        seq = data.draw(
            st.lists(st.integers(0, (1 << m) - 1), min_size=1,
                     max_size=2000)
        )
        enc = _gif_lzw_encode(seq, m)
        assert list(_gif_lzw_decode(enc, m, len(seq))) == seq

    def test_decode_rejects_wrong_npix(self):
        enc = _gif_lzw_encode([1, 2, 3], 2)
        with pytest.raises(ValueError, match="short of"):
            _gif_lzw_decode(enc, 2, 4)
        with pytest.raises(ValueError, match="exceeds"):
            _gif_lzw_decode(enc, 2, 2)


class TestGifLzwDictionaryCap:
    def test_deferred_clear_round_trip(self):
        """Random bytes at m=8 emit ~one code per symbol, so 9000
        symbols saturate the 4096-entry dictionary: both sides must
        stop adding entries (codes stay at width 12, GIF's deferred
        clear) and still agree. Sub-cap sequences (m=2) round-trip in
        the same sweep."""
        import random

        rng = random.Random(13)
        for m in (2, 8):
            seq = [rng.randrange(1 << m) for _ in range(9000)]
            enc = _gif_lzw_encode(seq, m)
            assert list(_gif_lzw_decode(enc, m, len(seq))) == seq


class TestTiffProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_round_trip_arbitrary_pixels(self, data):
        """Arbitrary RGB pixel fields through the synthesizer's real
        header/IFD/strip writer at every (byte order, compression)
        combination — decode must be pixel-exact."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        # doc_id drives order/compression/dims; pixels are the
        # synthesizer's formula, so draw the doc AND verify against
        # an independently computed field
        doc = data.draw(st.integers(0, 10_000))
        w, h = 5 + doc % 11, 3 + doc % 6
        gw, gh, img = M._parse_tiff(M.synth_tiff_bytes(doc))
        assert (gw, gh) == (w, h)
        for _ in range(6):  # spot-check random pixels exactly
            x = data.draw(st.integers(0, w - 1))
            y = data.draw(st.integers(0, h - 1))
            for c in range(3):
                assert img[y, x, c] == (
                    doc * (3 + c) + x * (7 + 2 * c) + y * (11 + c)
                ) % 256

    @settings(max_examples=40, deadline=None)
    @given(raw=st.binary(min_size=1, max_size=4000))
    def test_lzw_and_packbits_round_trip_arbitrary_bytes(self, raw):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        assert M._tiff_lzw_decode(
            M._tiff_lzw_encode(raw), len(raw)
        ) == raw
        assert M._packbits_decode(
            M._packbits_encode(raw), len(raw)
        ) == raw


class TestBmpProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_round_trip_hand_built_arbitrary_pixels(self, data):
        """Arbitrary truecolor pixel fields through a hand-built BMP
        (random orientation, widths forcing every padding residue)
        decode pixel-exactly."""
        import struct

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        w = data.draw(st.integers(1, 9))
        h = data.draw(st.integers(1, 6))
        top_down = data.draw(st.booleans())
        px = [
            [
                tuple(data.draw(st.integers(0, 255)) for _ in range(3))
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        stride = ((w * 24 + 31) // 32) * 4
        rows = []
        for y in range(h):
            row = bytearray()
            for x in range(w):
                r, g, b = px[y][x]
                row += bytes([b, g, r])
            row += bytes(stride - len(row))
            rows.append(bytes(row))
        if not top_down:
            rows.reverse()
        pix = b"".join(rows)
        info = struct.pack(
            "<IiiHHIIiiII",
            40, w, -h if top_down else h, 1, 24, 0,
            len(pix), 0, 0, 0, 0,
        )
        head = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
        gw, gh, img = M._parse_bmp(head + info + pix)
        assert (gw, gh) == (w, h)
        for y in range(h):
            for x in range(w):
                assert tuple(img[y, x]) == px[y][x]
