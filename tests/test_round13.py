"""Round-13 pins.

ADVICE-r12 behavior fixes:
- ingest_dispatch's WAV branch is width-aware (8/16/24/32-bit via
  _pcm_samples) instead of a hardcoded '<i2' view;
- _parse_flac_body truncates a final-frame overshoot (a fixed
  blocksize code larger than the remaining STREAMINFO total) to the
  declared total, matching libFLAC.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
import pytest


def _wav_bytes(samples, sw, nch=1, rate=8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sw)
        w.setframerate(rate)
        a = np.asarray(samples)
        if sw == 1:
            raw = (a + 128).astype("u1").tobytes()
        elif sw == 2:
            raw = a.astype("<i2").tobytes()
        elif sw == 3:
            raw = a.astype("<i4").view("u1").reshape(-1, 4)[:, :3].tobytes()
        else:
            raw = a.astype("<i4").tobytes()
        w.writeframes(raw)
    return buf.getvalue()


class TestIngestDispatchWavWidths:
    """A real scraped corpus carries 8/24/32-bit WAVs alongside the
    common 16-bit ones; the dispatcher must sum them width-correctly
    (the pre-fix '<i2' view mis-summed every non-16-bit file and blew
    up on 24-bit odd-frame-count payloads with a raw numpy error)."""

    @pytest.mark.parametrize("sw,vals", [
        (1, [-128, -1, 0, 1, 127]),
        (2, [-32768, -5, 0, 7, 32767]),
        (3, [-8388608, -70000, -1, 0, 1, 70000, 8388607]),  # odd count
        (4, [-2147483648, -1, 0, 1, 2147483647]),
    ])
    def test_dispatch_sums_every_width(self, spark, sw, vals):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            ingest_dispatch,
        )

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "payload": [_wav_bytes(vals, sw)]})
        )
        row = ingest_dispatch(df).collect()[0]
        assert row["kind"] == "wav"
        assert row["n_units"] == len(vals)
        assert row["value_sum"] == sum(vals)

    def test_dispatch_matches_decode_wav_gate(self, spark):
        """Dispatcher and the dedicated decode_wav operator agree on a
        24-bit payload — one PCM reader, not two divergent ones."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            decode_wav,
            ingest_dispatch,
        )

        vals = [13 * i - 40000 for i in range(101)]  # odd frame count
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [7], "payload": [_wav_bytes(vals, 3)]})
        )
        d = ingest_dispatch(df).collect()[0]
        w = decode_wav(df).collect()[0]
        assert d["n_units"] == w["n_samples"] == len(vals)
        assert d["value_sum"] == sum(vals)


class TestFlacOvershootTruncation:
    """FLAC spec: the last frame of a stream coded with a FIXED
    blocksize code can declare more samples than STREAMINFO's total;
    reference decoders (libFLAC) truncate the decode to total.
    Pre-fix, _parse_flac_body returned all decoded samples, so
    n_samples/sum_sq disagreed with libFLAC on such streams."""

    @staticmethod
    def _stream(samples, total):
        """One verbatim-coded frame with fixed blocksize code 0b1000
        (= 256 samples) over a STREAMINFO declaring ``total``."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        n = len(samples)
        assert n == 256
        si = M._Bits()
        si.write(n, 16)
        si.write(n, 16)
        si.write(0, 24)
        si.write(0, 24)
        si.write(8000, 20)
        si.write(0, 3)
        si.write(15, 5)  # bps - 1
        si.write(total, 36)
        streaminfo = (
            b"\x80" + (34).to_bytes(3, "big") + si.bytes() + b"\x00" * 16
        )
        hb = M._Bits()
        hb.write(0b11111111111110, 14)
        hb.write(0, 2)
        hb.write(0b1000, 4)  # FIXED blocksize 256 — may overshoot
        hb.write(0b0100, 4)
        hb.write(0b0000, 4)
        hb.write(0b100, 3)  # 16-bit
        hb.write(0, 1)
        hb.write(0x00, 8)
        header = hb.bytes()
        header += bytes([M._crc8_flac(header)])
        body = M._Bits()
        body.write((0b001000 | 1) << 1, 8)  # FIXED order 1
        body.write(samples[0] & 0xFFFF, 16)
        body.write(0b00, 2)
        body.write(0, 4)
        k = 4
        body.write(k, 4)
        for i in range(1, n):
            r = samples[i] - samples[i - 1]
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            body.write(0, u >> k)
            body.write(1, 1)
            body.write(u & ((1 << k) - 1), k)
        body.pad_to_byte()
        frame = header + body.bytes()
        frame += M._crc16_flac(frame).to_bytes(2, "big")
        return b"fLaC" + streaminfo + frame

    def test_overshoot_truncates_to_total(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        samples = [7 * i - 300 for i in range(256)]
        rate, s = M._parse_flac(self._stream(samples, total=200))
        assert rate == 8000
        assert list(s) == samples[:200]

    def test_exact_total_unaffected(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        samples = [7 * i - 300 for i in range(256)]
        _, s = M._parse_flac(self._stream(samples, total=256))
        assert list(s) == samples


def _seg(marker: int, body: bytes) -> bytes:
    import struct

    return struct.pack(">HH", marker, len(body) + 2) + body


def _sos(comps, ss, se, ah, al) -> bytes:
    body = bytes([len(comps)])
    for cid, tdta in comps:
        body += bytes([cid, tdta])
    return _seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))


def _prog_headers(sof_comps, w, h):
    """SOI..DHT prefix for a hand-built progressive stream using the
    module's progressive Huffman tables."""
    import struct

    from mwa_uvdata_pipeline_spark.operators import multimodal as M

    (dc_bits, dc_vals), (ac_bits, ac_vals) = M._jpeg_prog_tables()
    sof2 = struct.pack(">BHHB", 8, h, w, len(sof_comps))
    for cid, hv, tq in sof_comps:
        sof2 += bytes([cid, hv, tq])
    return (
        b"\xff\xd8"
        + _seg(0xFFDB, bytes([0x00]) + bytes(M._JPEG_QZZ))
        + _seg(0xFFC2, sof2)
        + _seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + _seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    )


def _dc_first_bits(bw, dc_codes, ts, pred=0):
    """Append DC-first difference coding for quantized values ts."""
    for t in ts:
        diff = t - pred
        pred = t
        size = abs(diff).bit_length()
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(diff if diff >= 0 else diff + (1 << size) - 1,
                     size)
    return pred


class TestProgressiveJpeg:
    """From-spec progressive (SOF2) decode — T.81 G.2 spectral
    selection + successive approximation, the r12 verdict's #2."""

    @staticmethod
    def _expected(doc_id):
        S = (1, -1, -1, 1, 1, -1, -1, 1)
        wb, hb = 2 + doc_id % 3, 1 + doc_id % 2
        exp = np.zeros((hb * 8, wb * 8), dtype="i8")
        for by in range(hb):
            for bx in range(wb):
                v = (doc_id * 13 + bx * 41 + by * 27) % 224 + 16
                a = (doc_id + bx * 3 + by * 5) % 5 - 2
                for y in range(8):
                    for x in range(8):
                        exp[by * 8 + y, bx * 8 + x] = (
                            v + S[x] * S[y] * 2 * a
                        )
        return exp

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 11, 17, 29])
    def test_five_scan_round_trip_exact(self, doc_id):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        w, h, img = M._parse_jpeg(
            M.synth_jpeg_progressive_bytes(doc_id)
        )
        exp = self._expected(doc_id)
        assert (w, h) == (exp.shape[1], exp.shape[0])
        assert (img == exp).all()

    @pytest.mark.parametrize("doc_id", [0, 3, 7])
    def test_first_scans_alone_decode_differently(self, doc_id):
        """Cut the stream before the two refinement scans: the
        partial decode must equal the CLOSED HALF-PRECISION form —
        DC truncated to even, odd-magnitude AC still invisible —
        proving the refinement bits land in the full decode."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = M.synth_jpeg_progressive_bytes(doc_id)
        offs = []
        i = 2
        while True:
            j = blob.find(b"\xff\xda", i)
            if j < 0:
                break
            offs.append(j)
            i = j + 2
        assert len(offs) == 5
        partial = blob[: offs[3]] + b"\xff\xd9"
        _w, _h, img = M._parse_jpeg(partial)
        S = (1, -1, -1, 1, 1, -1, -1, 1)
        wb, hb = 2 + doc_id % 3, 1 + doc_id % 2
        exp = np.zeros((hb * 8, wb * 8), dtype="i8")
        for by in range(hb):
            for bx in range(wb):
                v = (doc_id * 13 + bx * 41 + by * 27) % 224 + 16
                a = (doc_id + bx * 3 + by * 5) % 5 - 2
                t = ((v - 128) >> 1) << 1  # DC at half precision
                half_a = (abs(a) >> 1) * (1 if a >= 0 else -1) * 2
                for y in range(8):
                    for x in range(8):
                        exp[by * 8 + y, bx * 8 + x] = (
                            t + 128 + S[x] * S[y] * 2 * half_a
                        )
        assert (img == exp).all()
        assert (img != self._expected(doc_id)).any()

    def test_dispatch_routes_progressive(self, spark):
        """sniff sees plain JPEG magic; the dispatcher's jpeg branch
        decodes SOF2 transparently."""
        import pandas as pd

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = M.synth_jpeg_progressive_bytes(5)
        assert M.sniff_payload_kind(blob) == "jpeg"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [5], "payload": [blob]})
        )
        row = M.ingest_dispatch(df).collect()[0]
        exp = self._expected(5)
        assert row["kind"] == "jpeg"
        assert (row["width"], row["height"]) == (exp.shape[1],
                                                 exp.shape[0])
        assert row["value_sum"] == int(exp.sum())


class TestProgressiveInterleavedDC:
    """Progressive DC scans MAY interleave components over the MCU
    grid (T.81 G.1.1.1) — a 4:2:0 color stream whose two DC scans
    (first at Al=1, then a raw-bit refinement) are both ns=3."""

    def test_color_dc_only_stream(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        (dc_bits, dc_vals), _ = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        yv = [41, 81, 121, 201]
        cbv, crv = 100, 161
        ts = {1: [v - 128 for v in yv], 2: [cbv - 128], 3: [crv - 128]}

        bw = M._BitWriter()
        for cid in (1, 2, 3):  # one MCU: 4 Y units, 1 Cb, 1 Cr
            _dc_first_bits(bw, dc_codes, [t >> 1 for t in ts[cid]])
        first = bw.flush()
        bw = M._BitWriter()
        for cid in (1, 2, 3):
            for t in ts[cid]:
                bw.write(t & 1, 1)
        refine = bw.flush()

        blob = (
            _prog_headers([(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)],
                          16, 16)
            + _sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, 1)
            + first
            + _sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
            + refine
            + b"\xff\xd9"
        )
        w, h, Y, Cb, Cr = M._parse_jpeg_ycbcr(blob)
        assert (w, h) == (16, 16)
        exp_y = np.zeros((16, 16), dtype="i8")
        exp_y[:8, :8], exp_y[:8, 8:] = yv[0], yv[1]
        exp_y[8:, :8], exp_y[8:, 8:] = yv[2], yv[3]
        assert (Y == exp_y).all()
        assert (Cb == cbv).all() and Cb.shape == (8, 8)
        assert (Cr == crv).all() and Cr.shape == (8, 8)


class TestProgressiveZrlRefine:
    """An AC-refinement scan whose newly-significant coefficient sits
    44 zero-history positions into the band forces the ZRL path of
    G.1.2.3 (two 16-zero skips, then run/size 12/1) — untouched by
    the synthesizer's 3-zero runs."""

    def test_deep_coefficient_via_zrl(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        v = 150  # DC: t = 22 (even, refine bit 0)
        coef = [0] * 64
        coef[0] = v - 128
        coef[45] = 1  # invisible at Al=1, inserted by the refinement
        (dc_bits, dc_vals), (ac_bits, ac_vals) = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        ac_codes = M._huff_codes(ac_bits, ac_vals)

        bw = M._BitWriter()
        _dc_first_bits(bw, dc_codes, [coef[0] >> 1])
        s1 = bw.flush()
        bw = M._BitWriter()
        M._emit_ac_first(bw, ac_codes, [coef[1:64]], 1)
        s2 = bw.flush()
        bw = M._BitWriter()
        bw.write(coef[0] & 1, 1)
        s3 = bw.flush()
        bw = M._BitWriter()
        M._emit_ac_refine(bw, ac_codes, [coef[1:64]], 0)
        s4 = bw.flush()

        head = _prog_headers([(1, 0x11, 0)], 8, 8)
        tail = (
            _sos([(1, 0x00)], 0, 0, 0, 1) + s1
            + _sos([(1, 0x00)], 1, 63, 0, 1) + s2
            + _sos([(1, 0x00)], 0, 0, 1, 0) + s3
        )
        full = head + tail + _sos([(1, 0x00)], 1, 63, 1, 0) + s4 \
            + b"\xff\xd9"
        partial = head + tail + b"\xff\xd9"

        # independent expected decode: dequantize + textbook IDCT
        zz = M._zigzag_order()
        q = list(M._JPEG_QZZ)
        blk = np.zeros(64)
        for k, c in enumerate(coef):
            blk[zz[k]] = c * q[k]
        u = np.arange(8)
        cu = np.where(u == 0, 1 / np.sqrt(2), 1.0)
        basis = 0.5 * cu[:, None] * np.cos(
            (2 * u[None, :] + 1) * u[:, None] * np.pi / 16
        )
        exp = np.clip(
            np.round(basis.T @ blk.reshape(8, 8) @ basis + 128),
            0, 255,
        ).astype("i8")

        _w, _h, img = M._parse_jpeg(full)
        assert (img == exp).all()
        _w, _h, img_part = M._parse_jpeg(partial)
        assert (img_part == v).all()  # coefficient invisible pre-refine
        assert (img != img_part).any()


class TestProgressiveRestart:
    """Restart markers inside progressive scans byte-align, verify
    the RSTn sequence, and reset the DC predictor AND the EOB run."""

    def test_dc_predictor_resets_at_restart(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        v0, v1 = 70, 180
        t0, t1 = v0 - 128, v1 - 128
        (dc_bits, dc_vals), (ac_bits, ac_vals) = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        ac_codes = M._huff_codes(ac_bits, ac_vals)

        bw = M._BitWriter()
        _dc_first_bits(bw, dc_codes, [t0])  # diff from 0
        bw.restart(0)
        _dc_first_bits(bw, dc_codes, [t1])  # ABSOLUTE: pred reset
        dc_scan = bw.flush()

        bw = M._BitWriter()  # AC scan: per-interval EOB0 runs
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
        bw.restart(0)  # the RSTn sequence restarts at EVERY scan
        bw.write(code, ln)
        ac_scan = bw.flush()

        blob = (
            _prog_headers([(1, 0x11, 0)], 16, 8)
            + _seg(0xFFDD, (1).to_bytes(2, "big"))  # DRI: Ri = 1
            + _sos([(1, 0x00)], 0, 0, 0, 0) + dc_scan
            + _sos([(1, 0x00)], 1, 63, 0, 0) + ac_scan
            + b"\xff\xd9"
        )
        _w, _h, img = M._parse_jpeg(blob)
        assert (img[:, :8] == v0).all()
        assert (img[:, 8:] == v1).all()

    def test_wrong_restart_index_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        (dc_bits, dc_vals), _ = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        bw = M._BitWriter()
        _dc_first_bits(bw, dc_codes, [10])
        bw.restart(5)  # out of sequence: RST0 expected
        _dc_first_bits(bw, dc_codes, [20])
        blob = (
            _prog_headers([(1, 0x11, 0)], 16, 8)
            + _seg(0xFFDD, (1).to_bytes(2, "big"))
            + _sos([(1, 0x00)], 0, 0, 0, 0) + bw.flush()
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="RST0"):
            M._parse_jpeg(blob)


class TestProgressiveValidation:
    """Clean-failure contract over malformed progressive structure."""

    @staticmethod
    def _dc_scan_bits():
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        (dc_bits, dc_vals), _ = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        bw = M._BitWriter()
        _dc_first_bits(bw, dc_codes, [0])
        return bw.flush()

    def test_ac_scan_before_dc_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = (
            _prog_headers([(1, 0x11, 0)], 8, 8)
            + _sos([(1, 0x00)], 1, 63, 0, 0)
            + b"\x00" + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="before the component"):
            M._parse_jpeg(blob)

    def test_interleaved_ac_scan_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = (
            _prog_headers(
                [(1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0)], 8, 8
            )
            + _sos([(1, 0x00), (2, 0x00)], 1, 63, 0, 0)
            + b"\x00" + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="single-component"):
            M._parse_jpeg(blob)

    def test_dc_scan_with_spectral_end_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = (
            _prog_headers([(1, 0x11, 0)], 8, 8)
            + _sos([(1, 0x00)], 0, 5, 0, 0)
            + b"\x00" + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="Se = 0"):
            M._parse_jpeg(blob)

    def test_missing_eoi_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = (
            _prog_headers([(1, 0x11, 0)], 8, 8)
            + _sos([(1, 0x00)], 0, 0, 0, 0) + self._dc_scan_bits()
        )
        with pytest.raises(ValueError, match="missing EOI"):
            M._parse_jpeg(blob)

    def test_missing_component_dc_scan_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        # 3-component frame, but only component 1 ever gets DC data
        blob = (
            _prog_headers(
                [(1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0)], 8, 8
            )
            + _sos([(1, 0x00)], 0, 0, 0, 0) + self._dc_scan_bits()
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="missing DC scan"):
            M._parse_jpeg(blob)

    def test_second_sof_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = M.synth_jpeg_bytes(3)
        at = blob.find(b"\xff\xc0")
        sof = blob[at : at + 2 + int.from_bytes(
            blob[at + 2 : at + 4], "big"
        )]
        with pytest.raises(ValueError, match="multiple SOF"):
            M._parse_jpeg(blob[:at] + sof + blob[at:])

    def test_bad_refinement_size_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        (dc_bits, dc_vals), (ac_bits, ac_vals) = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        ac_codes = M._huff_codes(ac_bits, ac_vals)
        bw = M._BitWriter()
        _dc_first_bits(bw, dc_codes, [0])
        dc = bw.flush()
        bw = M._BitWriter()
        code, ln = ac_codes[0x02]  # run 0, size 2: illegal in refine
        bw.write(code, ln)
        bad = bw.flush()
        blob = (
            _prog_headers([(1, 0x11, 0)], 8, 8)
            + _sos([(1, 0x00)], 0, 0, 0, 0) + dc
            + _sos([(1, 0x00)], 1, 63, 1, 0) + bad
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="refinement coefficient"):
            M._parse_jpeg(blob)


class TestProgressiveFuzzSurface:
    """Clean-failure contract for the progressive path: no prefix and
    no single-bit flip may raise anything but ValueError (sampled
    every 3rd bit here; the exhaustive every-bit sweep ran clean in
    development)."""

    def test_every_prefix_fails_clean(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        data = bytes(M.synth_jpeg_progressive_bytes(9))
        for cut in range(len(data)):
            try:
                M._parse_jpeg(data[:cut])
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"prefix {cut} leaked {type(exc).__name__}: {exc}"
                ) from exc

    def test_every_nth_bit_flip_fails_clean(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        data = bytes(M.synth_jpeg_progressive_bytes(9))
        for bit in range(0, len(data) * 8, 3):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                M._parse_jpeg(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"bit {bit} leaked {type(exc).__name__}: {exc}"
                ) from exc


class TestGifDecode:
    """From-spec GIF89a decode (r12 verdict #6): variable-width LZW,
    interlace, palettes, extension skipping."""

    @staticmethod
    def _expected(doc_id):
        W, H = 5 + doc_id % 11, 3 + doc_id % 6
        nc = 2 << (1 + doc_id % 3)
        exp = np.zeros((H, W, 3), dtype="i8")
        for y in range(H):
            for x in range(W):
                i = (doc_id + x * 7 + y * 11) % nc
                exp[y, x] = [
                    (doc_id * 5 + i * 17) % 256,
                    (doc_id * 3 + i * 29) % 256,
                    (doc_id * 7 + i * 13) % 256,
                ]
        return exp

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 12, 21, 40])
    def test_round_trip_exact(self, doc_id):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        w, h, img = M._parse_gif(M.synth_gif_bytes(doc_id))
        exp = self._expected(doc_id)
        assert (h, w) == exp.shape[:2]
        assert (img == exp).all()

    def test_lzw_width_follows_decoder_dictionary(self):
        """The encoder must bump its code width on the DECODER's slot
        counter (one behind its own table): this exact sequence made
        the decoder grow to width 5 immediately before END while a
        self-counting encoder still wrote END at width 4 — the
        desync caught during development, pinned here."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        seq = [0, 3, 2, 1, 0, 3, 3, 2, 1, 0, 3, 2, 2, 1, 0, 3, 2, 1]
        enc = M._gif_lzw_encode(seq, 2)
        assert list(M._gif_lzw_decode(enc, 2, len(seq))) == seq

    def test_lzw_kwkwk_and_clear(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        # KwKwK: code == next-free-slot (decoder-side special case)
        seq = [1, 1, 1, 1, 1, 1, 1]
        enc = M._gif_lzw_encode(seq, 2)
        assert list(M._gif_lzw_decode(enc, 2, len(seq))) == seq
        # an explicit mid-stream CLEAR resets dictionary and width
        acc = []

        def emit(codes_widths):
            a = n = 0
            out = bytearray()
            for c, wdt in codes_widths:
                a |= c << n
                n += wdt
                while n >= 8:
                    out.append(a & 255)
                    a >>= 8
                    n -= 8
            if n:
                out.append(a & 255)
            return bytes(out)

        # clear, 1, 2, clear, 2, 1, end (all width 3 for m=2)
        blob = emit([(4, 3), (1, 3), (2, 3), (4, 3), (2, 3), (1, 3),
                     (5, 3)])
        assert list(M._gif_lzw_decode(blob, 2, 4)) == [1, 2, 2, 1]
        del acc

    def test_interlace_hand_vector(self):
        """9-row interlaced image: stored row order must be
        0,8 / 4 / 2,6 / 1,3,5,7 (the four GIF passes)."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        assert M._gif_interlace_rows(9) == [0, 8, 4, 2, 6, 1, 3, 5, 7]
        # one column, 9 rows, palette index = stored position; the
        # decoder must scatter stored rows back to display order
        stored = list(range(9))  # row r of storage carries index r
        lzw = M._gif_lzw_encode(stored, 4)
        subs = bytes([len(lzw)]) + lzw + b"\x00"
        gct = bytes(
            b for i in range(16) for b in (i, 2 * i, 3 * i)
        )
        blob = (
            b"GIF89a" + (1).to_bytes(2, "little")
            + (9).to_bytes(2, "little")
            + bytes([0x80 | 3, 0, 0]) + gct
            + b"\x2c" + bytes(4)
            + (1).to_bytes(2, "little") + (9).to_bytes(2, "little")
            + bytes([0x40, 4]) + subs + b"\x3b"
        )
        _w, _h, img = M._parse_gif(blob)
        order = M._gif_interlace_rows(9)
        for stored_pos, display_row in enumerate(order):
            assert img[display_row, 0, 0] == stored_pos

    def test_multiframe_identical_second_frame_is_noop(self):
        """Animations: every frame decodes (round-14 compositing); a
        second frame identical to the first leaves the canvas
        unchanged, and the trailer is still required."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        base = bytearray(M.synth_gif_bytes(2))
        assert base[-1] == 0x3B
        # append a second image descriptor (same data) before the
        # trailer; locate it structurally (right after the 8-byte
        # GCE) — a bare index(0x2C) scan can hit a palette byte
        at = base.index(b"\x21\xf9") + 8
        assert base[at] == 0x2C
        first_img = base[at:-1]
        two = bytes(base[:-1]) + bytes(first_img) + b"\x3b"
        w, h, img = M._parse_gif(two)
        assert (img == self._expected(2)).all()
        with pytest.raises(ValueError, match="trailer"):
            M._parse_gif(bytes(base[:-1]))  # trailer gone

    def test_validation_errors(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        good = bytearray(M.synth_gif_bytes(4))
        bad = bytearray(good)
        bad[0] = ord("J")
        with pytest.raises(ValueError, match="signature"):
            M._parse_gif(bytes(bad))
        # palette index out of range: shrink declared GCT to 2 colors
        bad = bytearray(good)
        bad[10] = 0x80  # size field 0 -> 2 entries; indices go to 3+
        del bad[13 + 6 : 13 + 12]  # drop the last 2 of 4 RGB entries
        with pytest.raises(ValueError):
            M._parse_gif(bytes(bad))

    def test_dispatch_routes_gif(self, spark):
        import pandas as pd

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = M.synth_gif_bytes(7)
        assert M.sniff_payload_kind(blob) == "gif"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [7], "payload": [blob]})
        )
        row = M.ingest_dispatch(df).collect()[0]
        exp = self._expected(7)
        assert row["kind"] == "gif"
        assert (row["width"], row["height"]) == (exp.shape[1],
                                                 exp.shape[0])
        assert row["n_units"] == exp.shape[0] * exp.shape[1]
        assert row["value_sum"] == int(exp.sum())


class TestGifFuzzSurface:
    """Clean-failure contract for the GIF path (sampled every 3rd
    bit; exhaustive every-bit sweeps of both the sequential and
    interlaced shapes ran clean in development)."""

    @pytest.mark.parametrize("doc", [9, 12])
    def test_every_prefix_fails_clean(self, doc):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        data = bytes(M.synth_gif_bytes(doc))
        for cut in range(len(data)):
            try:
                M._parse_gif(data[:cut])
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"prefix {cut} leaked {type(exc).__name__}: {exc}"
                ) from exc

    @pytest.mark.parametrize("doc", [9, 12])
    def test_every_nth_bit_flip_fails_clean(self, doc):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        data = bytes(M.synth_gif_bytes(doc))
        for bit in range(0, len(data) * 8, 3):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                M._parse_gif(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"bit {bit} leaked {type(exc).__name__}: {exc}"
                ) from exc


class TestProgressiveColorEndToEnd:
    """The full shape real progressive JPEGs take: a 4:2:0 COLOR
    frame whose DC scans are interleaved (ns=3) and whose AC scans
    run per component over each component's OWN block grid (chroma
    at its subsampled resolution), with successive approximation on
    both. Composes every progressive mechanism in one stream; EOBRUN
    state must reset between scans (it is per-scan, not per-frame)."""

    def test_seven_scan_color_stream(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        (dc_bits, dc_vals), (ac_bits, ac_vals) = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        ac_codes = M._huff_codes(ac_bits, ac_vals)
        ack = M._JPEG_PROG_ACK
        S = M._JPEG_PROG_SIGNS

        yv = [41, 81, 121, 201]
        ya = [1, -2, 0, 2]  # quantized (4,4) coef per Y block
        cbv, crv = 100, 161
        y_coefs = []
        for v, a in zip(yv, ya):
            c = [0] * 64
            c[0] = v - 128
            c[ack] = a
            y_coefs.append(c)

        # scan 1: DC first, interleaved, Al=1
        bw = M._BitWriter()
        _dc_first_bits(bw, dc_codes, [(v - 128) >> 1 for v in yv])
        _dc_first_bits(bw, dc_codes, [(cbv - 128) >> 1])
        _dc_first_bits(bw, dc_codes, [(crv - 128) >> 1])
        s1 = bw.flush()
        # scans 2-4: AC first per component, Al=1
        bw = M._BitWriter()
        M._emit_ac_first(bw, ac_codes, [c[1:64] for c in y_coefs], 1)
        s2 = bw.flush()
        bw = M._BitWriter()
        M._emit_ac_first(bw, ac_codes, [[0] * 63], 1)
        s3 = bw.flush()
        bw = M._BitWriter()
        M._emit_ac_first(bw, ac_codes, [[0] * 63], 1)
        s4 = bw.flush()
        # scan 5: DC refine, interleaved, Al=0 (one raw bit per unit)
        bw = M._BitWriter()
        for t in [v - 128 for v in yv] + [cbv - 128, crv - 128]:
            bw.write(t & 1, 1)
        s5 = bw.flush()
        # scans 6-8: AC refine per component, Al=0
        bw = M._BitWriter()
        M._emit_ac_refine(bw, ac_codes, [c[1:64] for c in y_coefs], 0)
        s6 = bw.flush()
        bw = M._BitWriter()
        M._emit_ac_refine(bw, ac_codes, [[0] * 63], 0)
        s7 = bw.flush()
        bw = M._BitWriter()
        M._emit_ac_refine(bw, ac_codes, [[0] * 63], 0)
        s8 = bw.flush()

        all3 = [(1, 0x00), (2, 0x00), (3, 0x00)]
        blob = (
            _prog_headers([(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)],
                          16, 16)
            + _sos(all3, 0, 0, 0, 1) + s1
            + _sos([(1, 0x00)], 1, 63, 0, 1) + s2
            + _sos([(2, 0x00)], 1, 63, 0, 1) + s3
            + _sos([(3, 0x00)], 1, 63, 0, 1) + s4
            + _sos(all3, 0, 0, 1, 0) + s5
            + _sos([(1, 0x00)], 1, 63, 1, 0) + s6
            + _sos([(2, 0x00)], 1, 63, 1, 0) + s7
            + _sos([(3, 0x00)], 1, 63, 1, 0) + s8
            + b"\xff\xd9"
        )
        w, h, Y, Cb, Cr = M._parse_jpeg_ycbcr(blob)
        assert (w, h) == (16, 16)
        exp_y = np.zeros((16, 16), dtype="i8")
        for bi, (v, a) in enumerate(zip(yv, ya)):
            by, bx = divmod(bi, 2)
            for y in range(8):
                for x in range(8):
                    exp_y[by * 8 + y, bx * 8 + x] = (
                        v + S[x] * S[y] * 2 * a
                    )
        assert (Y == exp_y).all()
        assert (Cb == cbv).all() and Cb.shape == (8, 8)
        assert (Cr == crv).all() and Cr.shape == (8, 8)


class TestProgressiveMultiLevelApproximation:
    """Real encoders may chain MORE than one refinement: first scan
    at Al=2, refinements at Al=1 then Al=0 (T.81 allows any chain
    with Ah = previous Al). Pins the general-Al paths: DC refine ORs
    at bit Al; AC refine adds ±(1<<Al) correction magnitudes and
    inserts newly-significant values at each level."""

    def test_three_level_dc_and_ac(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        (dc_bits, dc_vals), (ac_bits, ac_vals) = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        ac_codes = M._huff_codes(ac_bits, ac_vals)
        ack = M._JPEG_PROG_ACK
        # DC -51 = ...11001101b exercises nonzero bits at every level;
        # AC values 5 (101b) and -6 (110b) become newly significant at
        # DIFFERENT levels: |5|>>2=1 (level 2), |6|>>2=1 too; use 1 and
        # -6 so one appears only at the last level
        cases = [(-51, 5), (77, -6), (3, 1), (-128, 0)]
        blocks = []
        for dc, ac in cases:
            c = [0] * 64
            c[0] = dc
            c[ack] = ac
            blocks.append(c)
        wb, hb = 2, 2

        bw = M._BitWriter()
        pred = 0
        for c in blocks:
            t = c[0] >> 2  # Al=2 first scan
            diff = t - pred
            pred = t
            size = abs(diff).bit_length()
            code, ln = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(diff if diff >= 0 else diff + (1 << size) - 1,
                         size)
        s_dc0 = bw.flush()
        refines = []
        for al in (1, 0):  # DC refinement levels
            bw = M._BitWriter()
            for c in blocks:
                bw.write((c[0] >> al) & 1, 1)
            refines.append(bw.flush())
        bw = M._BitWriter()
        M._emit_ac_first(bw, ac_codes, [c[1:64] for c in blocks], 2)
        s_ac0 = bw.flush()
        ac_refines = []
        for al in (1, 0):
            bw = M._BitWriter()
            M._emit_ac_refine(bw, ac_codes, [c[1:64] for c in blocks],
                              al)
            ac_refines.append(bw.flush())

        blob = (
            _prog_headers([(1, 0x11, 0)], 16, 16)
            + _sos([(1, 0x00)], 0, 0, 0, 2) + s_dc0
            + _sos([(1, 0x00)], 1, 63, 0, 2) + s_ac0
            + _sos([(1, 0x00)], 0, 0, 2, 1) + refines[0]
            + _sos([(1, 0x00)], 1, 63, 2, 1) + ac_refines[0]
            + _sos([(1, 0x00)], 0, 0, 1, 0) + refines[1]
            + _sos([(1, 0x00)], 1, 63, 1, 0) + ac_refines[1]
            + b"\xff\xd9"
        )
        S = M._JPEG_PROG_SIGNS
        w, h, img = M._parse_jpeg(blob)
        assert (w, h) == (16, 16)
        exp = np.zeros((16, 16), dtype="i8")
        for bi, (dc, ac) in enumerate(cases):
            by, bx = divmod(bi, wb)
            for y in range(8):
                for x in range(8):
                    exp[by * 8 + y, bx * 8 + x] = np.clip(
                        dc + 128 + S[x] * S[y] * 2 * ac, 0, 255
                    )
        assert (img == exp).all()


class TestDuplicateScanComponents:
    """A scan listing the same component twice is malformed (T.81
    B.2.3 requires distinct Cs_j); without validation the MCU loop
    silently double-decodes units. Both frame types reject."""

    def test_baseline_duplicate_rejects(self):
        import struct

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = bytearray(M.synth_jpeg_color_bytes(3))
        # find SOS (FF DA); scan components start at body+1
        at = blob.index(b"\xff\xda")
        ns = blob[at + 4]
        assert ns == 3
        # duplicate component 1 into component 2's slot
        blob[at + 5 + 2] = blob[at + 5]
        blob[at + 6 + 2] = blob[at + 6]
        with pytest.raises(ValueError, match="scan components"):
            M._parse_jpeg_ycbcr(bytes(blob))
        del struct

    def test_progressive_duplicate_rejects(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = (
            _prog_headers([(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)],
                          16, 16)
            + _sos([(1, 0x00), (1, 0x00), (3, 0x00)], 0, 0, 0, 1)
            + b"\x00" + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="duplicate scan"):
            M._parse_jpeg_ycbcr(blob)


class TestGifLocalColorTable:
    """A frame carrying its OWN color table composes in RGB space:
    background pixels resolve through the GLOBAL table, frame pixels
    through the LOCAL one — index-space composition would cross the
    two tables."""

    def test_partial_frame_with_lct_over_gct_background(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        gct = bytes([10, 20, 30,  40, 50, 60,  70, 80, 90,  5, 6, 7])
        lct = bytes([200, 201, 202,  210, 211, 212,
                     220, 221, 222,  230, 231, 232])
        lzw = M._gif_lzw_encode([3, 0], 2)  # 2x1 frame, indices 3, 0
        subs = bytes([len(lzw)]) + lzw + b"\x00"
        blob = (
            b"GIF89a" + (4).to_bytes(2, "little")
            + (2).to_bytes(2, "little")
            + bytes([0x80 | 1, 1, 0])  # GCT of 4, background index 1
            + gct
            + b"\x2c"
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + bytes([0x80 | 1])  # LCT flag, size 4
            + lct + bytes([2]) + subs + b"\x3b"  # LZW min code AFTER LCT
        )
        w, h, img = M._parse_gif(blob)
        assert (w, h) == (4, 2)
        assert tuple(img[0, 0]) == (40, 50, 60)  # GCT background
        assert tuple(img[1, 1]) == (230, 231, 232)  # LCT index 3
        assert tuple(img[1, 2]) == (200, 201, 202)  # LCT index 0
        assert tuple(img[1, 3]) == (40, 50, 60)  # background again

    def test_lct_frame_without_gct_must_cover_canvas(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        lct = bytes(range(12))
        lzw = M._gif_lzw_encode([0], 2)
        subs = bytes([len(lzw)]) + lzw + b"\x00"
        blob = (
            b"GIF89a" + (2).to_bytes(2, "little")
            + (1).to_bytes(2, "little")
            + bytes([0x00, 0, 0])  # no GCT
            + b"\x2c" + bytes(4)
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + bytes([0x80 | 1]) + lct + bytes([2]) + subs + b"\x3b"
        )
        with pytest.raises(ValueError, match="partial first frame"):
            M._parse_gif(blob)


class TestProgressiveNonInterleavedDC:
    """T.81 G.1.1.1 also allows a COLOR frame's DC data to arrive as
    three separate single-component scans (ns=1 each, over each
    component's own grid) instead of one interleaved scan — some
    encoders emit exactly this script."""

    def test_three_separate_dc_scans(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        (dc_bits, dc_vals), _ = M._jpeg_prog_tables()
        dc_codes = M._huff_codes(dc_bits, dc_vals)
        yv = [50, 90, 130, 170]
        cbv, crv = 110, 140

        def dc_scan(vals):
            bw = M._BitWriter()
            _dc_first_bits(bw, dc_codes, [v - 128 for v in vals])
            return bw.flush()

        blob = (
            _prog_headers([(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)],
                          16, 16)
            + _sos([(1, 0x00)], 0, 0, 0, 0) + dc_scan(yv)
            + _sos([(2, 0x00)], 0, 0, 0, 0) + dc_scan([cbv])
            + _sos([(3, 0x00)], 0, 0, 0, 0) + dc_scan([crv])
            + b"\xff\xd9"
        )
        w, h, Y, Cb, Cr = M._parse_jpeg_ycbcr(blob)
        assert (w, h) == (16, 16)
        exp_y = np.zeros((16, 16), dtype="i8")
        exp_y[:8, :8], exp_y[:8, 8:] = yv[0], yv[1]
        exp_y[8:, :8], exp_y[8:, 8:] = yv[2], yv[3]
        assert (Y == exp_y).all()
        assert (Cb == cbv).all() and (Cr == crv).all()


class TestGif87a:
    def test_gif87a_signature_accepted(self):
        """Pre-89a files (no extensions) still appear in old corpora;
        the decoder takes either signature."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = bytearray(M.synth_gif_bytes(6))
        assert blob[:6] == b"GIF89a"
        blob[4] = ord("7")  # GIF87a
        # drop the GCE (87a has no extension blocks)
        at = blob.index(b"\x21\xf9")
        del blob[at : at + 8]
        w, h, img = M._parse_gif(bytes(blob))
        assert (w, h) == (5 + 6 % 11, 3 + 6 % 6)
        assert M.sniff_payload_kind(bytes(blob)) == "gif"


class TestTiffDecode:
    """From-spec TIFF 6.0: IFD walk, both byte orders, strip
    assembly, none/PackBits/LZW (early-change) compressions."""

    @staticmethod
    def _expected(doc_id):
        W, H = 5 + doc_id % 11, 3 + doc_id % 6
        exp = np.zeros((H, W, 3), dtype="i8")
        for y in range(H):
            for x in range(W):
                for c in range(3):
                    exp[y, x, c] = (
                        doc_id * (3 + c) + x * (7 + 2 * c)
                        + y * (11 + c)
                    ) % 256
        return exp

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 17, 40])
    def test_round_trip_exact(self, doc_id):
        """doc parity selects II/MM; doc_id % 3 selects
        none/PackBits/LZW — eight draws cover every combination."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        w, h, img = M._parse_tiff(M.synth_tiff_bytes(doc_id))
        exp = self._expected(doc_id)
        assert (h, w) == exp.shape[:2]
        assert (img == exp).all()

    def test_packbits_hand_vector(self):
        """The TIFF 6.0 §9 worked example: Apple's documented
        PackBits stream decodes to the documented bytes."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
        exp = (
            b"\xaa\xaa\xaa" + b"\x80\x00\x2a" + b"\xaa" * 4
            + b"\x80\x00\x2a\x22" + b"\xaa" * 10
        )
        assert M._packbits_decode(enc, len(exp)) == exp
        # and the encoder round-trips the same data
        assert M._packbits_decode(
            M._packbits_encode(exp), len(exp)
        ) == exp

    def test_lzw_width_boundaries_round_trip(self):
        """Random bytes force one dictionary entry per symbol, so a
        3000-byte stream crosses the 9->10 (at 511, the EARLY
        change) and 10->11 (at 1023) width boundaries; 12000 bytes
        cross 11->12 and the mid-stream Clear at the 4094 cap."""
        import random

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        rng = random.Random(99)
        for n in (300, 3000, 12000):
            raw = bytes(rng.randrange(256) for _ in range(n))
            assert M._tiff_lzw_decode(M._tiff_lzw_encode(raw), n) == raw

    def test_gray_tiff_replicates_channels(self):
        """8-bit BlackIsZero grayscale: one sample per pixel,
        replicated to RGB so the unified channel sums apply."""
        import struct

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        w, h = 3, 2
        raw = bytes([10, 20, 30, 40, 50, 60])
        ifd_off = 8 + len(raw)

        def entry(tag, typ, count, value):
            if typ == 3:
                return struct.pack("<HHI", tag, typ, count) + \
                    struct.pack("<HH", value, 0)
            return struct.pack("<HHII", tag, typ, count, value)

        entries = [
            entry(256, 3, 1, w),
            entry(257, 3, 1, h),
            entry(258, 3, 1, 8),
            entry(259, 3, 1, 1),
            entry(262, 3, 1, 1),  # BlackIsZero
            entry(273, 4, 1, 8),
            entry(277, 3, 1, 1),
            entry(278, 3, 1, h),
            entry(279, 4, 1, len(raw)),
        ]
        blob = (
            struct.pack("<2sHI", b"II", 42, ifd_off) + raw
            + struct.pack("<H", len(entries)) + b"".join(entries)
            + struct.pack("<I", 0)
        )
        gw, gh, img = M._parse_tiff(blob)
        assert (gw, gh) == (w, h)
        assert (img[:, :, 0] == img[:, :, 1]).all()
        assert (img[:, :, 2].flatten() == [10, 20, 30, 40, 50, 60]).all()

    def test_validation_errors(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        good = bytearray(M.synth_tiff_bytes(0))
        bad = bytearray(good)
        bad[0] = ord("X")
        with pytest.raises(ValueError, match="byte-order"):
            M._parse_tiff(bytes(bad))
        with pytest.raises(ValueError):
            M._parse_tiff(bytes(good[:20]))

    def test_dispatch_routes_tiff(self, spark):
        import pandas as pd

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = M.synth_tiff_bytes(11)
        assert M.sniff_payload_kind(blob) == "tiff"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [11], "payload": [blob]})
        )
        row = M.ingest_dispatch(df).collect()[0]
        exp = self._expected(11)
        assert row["kind"] == "tiff"
        assert (row["width"], row["height"]) == (exp.shape[1],
                                                 exp.shape[0])
        assert row["value_sum"] == int(exp.sum())


class TestTiffFuzzSurface:
    """Clean-failure contract for the TIFF path (sampled every 3rd
    bit; exhaustive every-bit sweeps of five shapes covering both
    byte orders and all three compressions ran clean in
    development)."""

    @pytest.mark.parametrize("doc", [0, 1, 2])
    def test_every_prefix_fails_clean(self, doc):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        data = bytes(M.synth_tiff_bytes(doc))
        for cut in range(len(data)):
            try:
                M._parse_tiff(data[:cut])
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"prefix {cut} leaked {type(exc).__name__}: {exc}"
                ) from exc

    @pytest.mark.parametrize("doc", [0, 1, 2])
    def test_every_nth_bit_flip_fails_clean(self, doc):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        data = bytes(M.synth_tiff_bytes(doc))
        for bit in range(0, len(data) * 8, 3):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                M._parse_tiff(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"bit {bit} leaked {type(exc).__name__}: {exc}"
                ) from exc


class TestBmpDecode:
    """From-spec BMP: bottom-up vs top-down rows, BGR order, 4-byte
    row padding, non-power-of-two biClrUsed palettes."""

    @staticmethod
    def _expected(doc_id):
        W, H = 4 + doc_id % 9, 3 + doc_id % 5
        nc = 16 + doc_id % 17
        exp = np.zeros((H, W, 3), dtype="i8")
        for y in range(H):
            for x in range(W):
                if doc_id % 2 == 0:
                    exp[y, x] = [
                        (doc_id * 7 + x * 5 + y * 3) % 256,
                        (doc_id * 11 + x * 3 + y * 7) % 256,
                        (doc_id * 13 + x * 9 + y * 5) % 256,
                    ]
                else:
                    i = (doc_id + x * 3 + y * 5) % nc
                    exp[y, x] = [
                        (doc_id * 5 + i * 17) % 256,
                        (doc_id * 3 + i * 29) % 256,
                        (doc_id * 7 + i * 13) % 256,
                    ]
        return exp

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 20, 37])
    def test_round_trip_exact(self, doc_id):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        w, h, img = M._parse_bmp(M.synth_bmp_bytes(doc_id))
        exp = self._expected(doc_id)
        assert (h, w) == exp.shape[:2]
        assert (img == exp).all()

    def test_orientation_matters(self):
        """Flipping the height sign without re-ordering rows must
        change the decode (pins that orientation is honored, not
        ignored)."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = bytearray(M.synth_bmp_bytes(0))  # bottom-up, h=3
        import struct

        (h,) = struct.unpack("<i", blob[22:26])
        blob[22:26] = struct.pack("<i", -h)  # claim top-down
        _w, _h, img = M._parse_bmp(bytes(blob))
        assert (img != self._expected(0)).any()
        assert (img == self._expected(0)[::-1]).all()

    def test_v5_header_accepted(self):
        """A 124-byte BITMAPV5HEADER whose first 40 bytes match the
        classic layout decodes identically."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        import struct

        base = M.synth_bmp_bytes(0)
        head, info, pix = base[:14], base[14:54], base[54:]
        pad = 124 - 40
        info = struct.pack("<I", 124) + info[4:] + bytes(pad)
        data_off = 14 + 124
        head = struct.pack(
            "<2sIHHI", b"BM", data_off + len(pix), 0, 0, data_off
        )
        _w, _h, img = M._parse_bmp(head + info + pix)
        assert (img == self._expected(0)).all()

    def test_dispatch_routes_bmp(self, spark):
        import pandas as pd

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = M.synth_bmp_bytes(9)
        assert M.sniff_payload_kind(blob) == "bmp"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [9], "payload": [blob]})
        )
        row = M.ingest_dispatch(df).collect()[0]
        exp = self._expected(9)
        assert row["kind"] == "bmp"
        assert row["value_sum"] == int(exp.sum())

    def test_bm_without_known_header_not_sniffed(self):
        """'BM' alone is weak magic — a text blob starting with BM
        must stay unrecognized, not crash the BMP parser."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        with pytest.raises(ValueError, match="unrecognized"):
            M.sniff_payload_kind(b"BMW is a carmaker, not a bitmap.")


class TestBmpFuzzSurface:
    @pytest.mark.parametrize("doc", [0, 1, 2, 3])
    def test_every_nth_bit_flip_fails_clean(self, doc):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        data = bytes(M.synth_bmp_bytes(doc))
        for bit in range(0, len(data) * 8, 3):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                M._parse_bmp(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"bit {bit} leaked {type(exc).__name__}: {exc}"
                ) from exc


class TestReviewFixes:
    """Round-13 self-review findings, each pinned."""

    def test_tiff_predictor2_round_trip_and_reject(self):
        """LZW corpus docs now carry Predictor=2 (the libtiff
        pairing); values decode identically to the closed form, and
        unsupported predictor values reject instead of silently
        mis-decoding."""
        import struct

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = bytearray(M.synth_tiff_bytes(2))  # II + LZW + pred 2
        assert b"\x3d\x01" in bytes(blob)  # tag 317 LE present
        w, h, img = M._parse_tiff(bytes(blob))
        assert img[0, 1, 0] == (2 * 3 + 1 * 7) % 256
        at = bytes(blob).index(
            struct.pack("<HH", 317, 3)
        )
        blob[at + 8] = 3  # predictor 3 (floating point): unsupported
        with pytest.raises(ValueError, match="predictor"):
            M._parse_tiff(bytes(blob))

    def test_tiff_lzw_decode_linear_time(self):
        """The decoder masks its accumulator after each code —
        decoding 320 KB must take well under a second (it was 51 s
        when acc grew unboundedly and every shift went O(stream))."""
        import random
        import time

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        raw = bytes(
            random.Random(3).randrange(256) for _ in range(320_000)
        )
        enc = M._tiff_lzw_encode(raw)
        t0 = time.perf_counter()
        assert M._tiff_lzw_decode(enc, len(raw)) == raw
        assert time.perf_counter() - t0 < 5.0

    def test_flac_unknown_length_decodes_all_frames(self):
        """STREAMINFO total = 0 is the spec's 'unknown length'
        (pipe-mode encoders): decode to end of file instead of
        truncating to zero samples."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = bytearray(M.synth_flac_bytes(5))
        _rate, full = M._parse_flac(bytes(blob))
        blob[8 + 13] &= 0xF0  # zero the 36-bit total-samples field
        for i in range(14, 18):
            blob[8 + i] = 0
        _rate, unk = M._parse_flac(bytes(blob))
        assert list(unk) == list(full) and len(full) > 0

    def test_gif_transparency_composites_background(self):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        gct = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 5, 6, 7])
        lzw = M._gif_lzw_encode([1, 0], 2)
        subs = bytes([len(lzw)]) + lzw + b"\x00"
        blob = (
            b"GIF89a" + (2).to_bytes(2, "little")
            + (1).to_bytes(2, "little")
            + bytes([0x80 | 1, 2, 0]) + gct
            + b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # transparent idx 1
            + b"\x2c" + bytes(4)
            + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + bytes([0x00, 2]) + subs + b"\x3b"
        )
        _w, _h, img = M._parse_gif(blob)
        assert tuple(img[0, 0]) == (70, 80, 90)  # background (idx 2)
        assert tuple(img[0, 1]) == (10, 20, 30)  # opaque idx 0

    def test_gif_junk_background_byte_tolerated_when_hidden(self):
        """Real encoders emit junk bg bytes on full-canvas opaque
        frames; the check applies only when background pixels
        actually render."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = bytearray(M.synth_gif_bytes(4))
        blob[11] = 200  # bg far beyond the table
        M._parse_gif(bytes(blob))  # accepted
        # but a PARTIAL frame with the same junk byte still rejects
        gct = bytes(range(6))  # 2 entries
        lzw = M._gif_lzw_encode([0], 2)
        subs = bytes([len(lzw)]) + lzw + b"\x00"
        partial = (
            b"GIF89a" + (2).to_bytes(2, "little")
            + (1).to_bytes(2, "little")
            + bytes([0x80 | 0, 3, 0]) + gct
            + b"\x2c" + bytes(4)
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + bytes([0x00, 2]) + subs + b"\x3b"
        )
        with pytest.raises(ValueError, match="background"):
            M._parse_gif(partial)

    def test_gif_out_of_range_transparent_index_ok(self):
        """A transparent index at/above the palette size is legal —
        those pixels are never looked up."""
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        gct = bytes(range(6))  # 2 entries
        lzw = M._gif_lzw_encode([3, 0], 2)
        subs = bytes([len(lzw)]) + lzw + b"\x00"
        blob = (
            b"GIF89a" + (2).to_bytes(2, "little")
            + (1).to_bytes(2, "little")
            + bytes([0x80 | 0, 0, 0]) + gct
            + b"\x21\xf9\x04\x01\x00\x00\x03\x00"
            + b"\x2c" + bytes(4)
            + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + bytes([0x00, 2]) + subs + b"\x3b"
        )
        _w, _h, img = M._parse_gif(blob)
        assert tuple(img[0, 0]) == (0, 1, 2)  # background idx 0
        assert tuple(img[0, 1]) == (0, 1, 2)  # opaque idx 0

    def test_bmp_pixel_offset_inside_header_rejects(self):
        import struct

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        blob = bytearray(M.synth_bmp_bytes(0))
        blob[10:14] = struct.pack("<I", 10)  # bfOffBits into header
        with pytest.raises(ValueError, match="offset inside"):
            M._parse_bmp(bytes(blob))
