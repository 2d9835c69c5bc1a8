"""Property tests for the round-12 codec surfaces: ARBITRARY content
(not the formula-bound corpus) through encode → decode, extending
tests/test_round11_property.py's blind-spot removal to the new
paths — restart-interval JPEG (random block values, random Ri),
grayscale/palette/RGBA PNG (random pixels, random per-row filters),
and wasted-bits FLAC (random base signal, random k)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mwa_uvdata_pipeline_spark.operators.multimodal import (
    _Bits,
    _BitWriter,
    _JPEG_QZZ,
    _crc8_flac,
    _crc16_flac,
    _huff_codes,
    _jpeg_tables,
    _parse_flac,
    _parse_jpeg,
    _parse_png,
    _png_chunk,
    _png_filter_rows,
)


def _encode_rst_jpeg(values, wb: int, hb: int, ri: int) -> bytes:
    """Grayscale baseline JPEG with DRI=ri over wb x hb constant
    blocks of the given values (len == wb*hb), spec restart markers
    and per-interval DC predictor resets."""
    import struct

    (dc_bits, dc_vals), (ac_bits, ac_vals) = _jpeg_tables()
    dc_codes = _huff_codes(dc_bits, dc_vals)
    ac_codes = _huff_codes(ac_bits, ac_vals)
    bw = _BitWriter()
    pred = 0
    rst = 0
    for mcu, v in enumerate(values):
        if ri and mcu and mcu % ri == 0:
            bw.restart(rst)
            rst = (rst + 1) & 7
            pred = 0
        qdc = (8 * (v - 128)) // _JPEG_QZZ[0]
        diff = qdc - pred
        pred = qdc
        size = abs(diff).bit_length()
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bits = diff if diff >= 0 else diff + (1 << size) - 1
            bw.write(bits, size)
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0x00]) + bytes(_JPEG_QZZ))
        + seg(
            0xFFC0,
            struct.pack(">BHHB", 8, hb * 8, wb * 8, 1)
            + bytes([1, 0x11, 0]),
        )
        + seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xFFDD, struct.pack(">H", ri))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )


class TestRestartJpegProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_round_trip_arbitrary_blocks_and_intervals(self, data):
        wb = data.draw(st.integers(1, 5))
        hb = data.draw(st.integers(1, 4))
        ri = data.draw(st.integers(1, max(1, wb * hb)))
        values = data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=wb * hb,
                max_size=wb * hb,
            )
        )
        w, h, img = _parse_jpeg(_encode_rst_jpeg(values, wb, hb, ri))
        assert (w, h) == (wb * 8, hb * 8)
        for i, v in enumerate(values):
            by, bx = divmod(i, wb)
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == v).all(), (i, ri)


def _wrap_png(w, h, ctype, raw, chunks=()):
    import struct
    import zlib

    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    for typ, body in chunks:
        out += _png_chunk(typ, body)
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _png_chunk(b"IEND", b"")


class TestPngTypeProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_grayscale_round_trip(self, data):
        w = data.draw(st.integers(1, 16))
        h = data.draw(st.integers(1, 10))
        flat = data.draw(
            st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
        )
        fts = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        plane = np.array(flat, dtype="u1").reshape(h, w, 1)
        raw = _png_filter_rows(plane, lambda yy: fts[yy])
        gw, gh, img = _parse_png(_wrap_png(w, h, 0, raw))
        exp = np.repeat(
            plane.reshape(h, w).astype("i8")[:, :, None], 3, axis=2
        )
        assert (img == exp).all()

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_palette_round_trip(self, data):
        w = data.draw(st.integers(1, 16))
        h = data.draw(st.integers(1, 10))
        npal = data.draw(st.integers(1, 256))
        pal = data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=3 * npal,
                max_size=3 * npal,
            )
        )
        idx = data.draw(
            st.lists(
                st.integers(0, npal - 1), min_size=w * h, max_size=w * h
            )
        )
        fts = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        plane = np.array(idx, dtype="u1").reshape(h, w, 1)
        raw = _png_filter_rows(plane, lambda yy: fts[yy])
        gw, gh, img = _parse_png(
            _wrap_png(w, h, 3, raw, [(b"PLTE", bytes(pal))])
        )
        parr = np.array(pal, dtype="i8").reshape(npal, 3)
        assert (img == parr[plane.reshape(h, w)]).all()

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_rgba_round_trip_alpha_dropped(self, data):
        w = data.draw(st.integers(1, 12))
        h = data.draw(st.integers(1, 8))
        flat = data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * 4,
                max_size=w * h * 4,
            )
        )
        fts = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        img4 = np.array(flat, dtype="u1").reshape(h, w, 4)
        raw = _png_filter_rows(img4, lambda yy: fts[yy])
        gw, gh, img = _parse_png(_wrap_png(w, h, 6, raw))
        assert (img == img4[:, :, :3].astype("i8")).all()


def _encode_wasted_flac(base, k: int) -> bytes:
    """Mono 16-bit FLAC: FIXED order-1 subframe over base << k with
    k wasted bits (the subframe codes `base` at 16-k width)."""
    n = len(base)
    si = _Bits()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    streaminfo = (
        b"\x80" + (34).to_bytes(3, "big") + si.bytes() + b"\x00" * 16
    )
    hb = _Bits()
    hb.write(0b11111111111110, 14)
    hb.write(0, 2)
    hb.write(0b0111, 4)
    hb.write(0b0100, 4)
    hb.write(0b0000, 4)
    hb.write(0b100, 3)
    hb.write(0, 1)
    hb.write(0x00, 8)
    hb.write(n - 1, 16)
    header = hb.bytes()
    header += bytes([_crc8_flac(header)])
    body = _Bits()
    cb = 16 - k
    body.write(((0b001000 | 1) << 1) | 1, 8)
    body.write(1, k)  # unary k
    body.write(base[0] & ((1 << cb) - 1), cb)
    body.write(0b00, 2)
    body.write(0, 4)
    rk = 4
    body.write(rk, 4)
    for i in range(1, n):
        r = base[i] - base[i - 1]
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        body.write(0, u >> rk)
        body.write(1, 1)
        body.write(u & ((1 << rk) - 1), rk)
    body.pad_to_byte()
    frame = header + body.bytes()
    frame += _crc16_flac(frame).to_bytes(2, "big")
    return b"fLaC" + streaminfo + frame


class TestWastedFlacProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_round_trip_arbitrary_signal_and_k(self, data):
        k = data.draw(st.integers(1, 6))
        n = data.draw(st.integers(2, 32))
        lim = (1 << (15 - k)) - 1  # base << k must fit 16-bit signed
        base = data.draw(
            st.lists(
                st.integers(-min(lim, 1500), min(lim, 1500)),
                min_size=n,
                max_size=n,
            )
        )
        rate, s = _parse_flac(_encode_wasted_flac(base, k))
        assert rate == 8000
        assert list(s) == [b << k for b in base]
