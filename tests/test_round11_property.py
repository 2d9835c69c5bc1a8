"""Property tests for the round-11 codec surfaces: ARBITRARY content
(not the formula-bound corpus) through encode → decode.

The synthesizers used by the gated entries always emit the closed-form
ramp/field content, so a bug that is symmetric in formula-space could
in principle hide from the oracle. These tests remove that blind spot:
random pixels / samples, random per-row filter choices, random
subframe mixes — encoder and decoder meet only at the byte stream,
and the filter (subtract-predictor) vs unfilter (add-reconstructed)
paths are genuinely inverse code, not shared."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mwa_uvdata_pipeline_spark.operators.multimodal import (
    _ADAM7,
    _Bits,
    _crc8_flac,
    _crc16_flac,
    _flac_write_fixed1,
    _flac_write_verbatim,
    _parse_flac_multi,
    _parse_png,
    _png_chunk,
    _png_filter_rows,
)


def _wrap_png(w: int, h: int, raw: bytes, interlace: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@st.composite
def _images(draw):
    w = draw(st.integers(1, 16))
    h = draw(st.integers(1, 12))
    flat = draw(
        st.lists(
            st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
        )
    )
    return np.array(flat, dtype="u1").reshape(h, w, 3)


class TestPngProperties:
    @settings(max_examples=40, deadline=None)
    @given(img=_images(), data=st.data())
    def test_sequential_round_trip_arbitrary_pixels_and_filters(
        self, img, data
    ):
        h, w = img.shape[:2]
        fts = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        raw = _png_filter_rows(img, lambda yy: fts[yy])
        w2, h2, out = _parse_png(_wrap_png(w, h, raw, 0))
        assert (w2, h2) == (w, h)
        assert (out == img).all()

    @settings(max_examples=40, deadline=None)
    @given(img=_images(), data=st.data())
    def test_adam7_round_trip_arbitrary_pixels_and_filters(
        self, img, data
    ):
        """Random content through the INTERLACED serialization: each
        non-empty pass filtered independently with its own random
        per-row filter draw — any pass-geometry, pass-order, byte
        accounting, or filter-state-reset bug surfaces as a pixel
        mismatch somewhere in the 40 draws."""
        h, w = img.shape[:2]
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            fts = data.draw(
                st.lists(
                    st.integers(0, 4),
                    min_size=sub.shape[0],
                    max_size=sub.shape[0],
                )
            )
            raw += _png_filter_rows(
                np.ascontiguousarray(sub), lambda yy: fts[yy]
            )
        w2, h2, out = _parse_png(_wrap_png(w, h, raw, 1))
        assert (w2, h2) == (w, h)
        assert (out == img).all()

    @settings(max_examples=20, deadline=None)
    @given(img=_images())
    def test_both_serializations_agree(self, img):
        """Sequential and Adam7 bytes of the SAME random image decode
        to the same pixels (filter 0 everywhere isolates the pass
        scatter from filter handling)."""
        h, w = img.shape[:2]
        seq = _png_filter_rows(img, lambda yy: 0)
        ilc = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                ilc += _png_filter_rows(
                    np.ascontiguousarray(sub), lambda yy: 0
                )
        _, _, a = _parse_png(_wrap_png(w, h, seq, 0))
        _, _, b = _parse_png(_wrap_png(w, h, ilc, 1))
        assert (a == b).all()


def _encode_flac(chans: list[list[int]], verbatim_mask: list[bool],
                 rate: int = 8000) -> bytes:
    """Minimal single-frame FLAC encoder over ARBITRARY 16-bit
    channel signals (1-8 channels, independent assignment) reusing
    the synthesizers' subframe writers."""
    n = len(chans[0])
    nch = len(chans)
    si = _Bits()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
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
    hb.write(nch - 1, 4)
    hb.write(0b100, 3)
    hb.write(0, 1)
    hb.write(0x00, 8)
    hb.write(n - 1, 16)
    header = hb.bytes()
    header += bytes([_crc8_flac(header)])
    body = _Bits()
    for sig, verb in zip(chans, verbatim_mask):
        if verb:
            _flac_write_verbatim(body, sig, 16)
        else:
            _flac_write_fixed1(body, sig, 16)
    body.pad_to_byte()
    frame = header + body.bytes()
    frame += _crc16_flac(frame).to_bytes(2, "big")
    return b"fLaC" + streaminfo + frame


class TestFlacProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_round_trip_arbitrary_signals_any_channel_count(self, data):
        """Random 16-bit signals (bounded so FIXED-1 Rice quotients
        stay short), random 1-8 channel count, random per-channel
        VERBATIM/FIXED mix — lossless means exact reproduction."""
        nch = data.draw(st.integers(1, 8))
        n = data.draw(st.integers(2, 24))
        chans = [
            data.draw(
                st.lists(
                    st.integers(-2000, 2000), min_size=n, max_size=n
                )
            )
            for _ in range(nch)
        ]
        mask = [data.draw(st.booleans()) for _ in range(nch)]
        rate, got_nch, got = _parse_flac_multi(_encode_flac(chans, mask))
        assert rate == 8000 and got_nch == nch
        for want, s in zip(chans, got):
            assert list(s) == want

    @settings(max_examples=20, deadline=None)
    @given(data=st.data())
    def test_single_bit_flip_never_decodes_silently(self, data):
        """Flip one random bit anywhere in a frame (header or body):
        the decode must either raise (CRC-8/CRC-16/structure) or —
        never — return the original samples unchanged while claiming
        success. A flip that still decodes MUST change some sample,
        and with both CRCs in place even that is not expected; we
        assert no silent identical decode."""
        n = data.draw(st.integers(4, 16))
        chans = [
            data.draw(
                st.lists(
                    st.integers(-500, 500), min_size=n, max_size=n
                )
            )
        ]
        blob = bytearray(_encode_flac(chans, [True]))
        frame_start = 4 + 4 + 34
        bit = data.draw(
            st.integers(frame_start * 8, len(blob) * 8 - 1)
        )
        blob[bit // 8] ^= 1 << (7 - bit % 8)
        try:
            _, _, got = _parse_flac_multi(bytes(blob))
        except ValueError:
            return  # detected: the expected outcome
        assert list(got[0]) != chans[0], "silent corruption"


class TestMp4ContainerVariants:
    """The box walk against layouts real files have but the
    synthesizer never emits: unknown skippable boxes and the 64-bit
    large-size form."""

    @staticmethod
    def _parts(data: bytes):
        """Split a synth MP4 into its three top-level boxes."""
        import struct

        out, pos = [], 0
        while pos < len(data):
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            out.append(data[pos : pos + size])
            pos += size
        return out

    @settings(max_examples=25, deadline=None)
    @given(doc_id=st.integers(0, 500), data=st.data())
    def test_unknown_top_level_boxes_are_skipped(self, doc_id, data):
        import struct

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_mp4,
            synth_mp4_bytes,
        )

        base = synth_mp4_bytes(doc_id)
        want = _parse_mp4(base)
        ftyp, moov, mdat = self._parts(base)
        fillers = []
        for typ in (b"free", b"skip", b"udta", b"uuid"):
            n = data.draw(st.integers(0, 40))
            fillers.append(
                struct.pack(">I", 8 + n) + typ + bytes(n)
            )
        # inject after ftyp, between moov and mdat, and trailing
        blob = (
            ftyp + fillers[0] + moov + fillers[1] + mdat
            + fillers[2] + fillers[3]
        )
        assert _parse_mp4(blob) == want

    @settings(max_examples=25, deadline=None)
    @given(doc_id=st.integers(0, 500))
    def test_large_size_mdat_form(self, doc_id):
        """Rewrite mdat in the size==1 / 64-bit largesize form (what
        >4 GiB files use); the reported payload size must be
        unchanged."""
        import struct

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_mp4,
            synth_mp4_bytes,
        )

        base = synth_mp4_bytes(doc_id)
        want = _parse_mp4(base)
        ftyp, moov, mdat = self._parts(base)
        payload = mdat[8:]
        big = (
            struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(payload)) + payload
        )
        got = _parse_mp4(ftyp + moov + big)
        assert got == want

    def test_truncated_unknown_box_still_clean_error(self):
        import struct

        import pytest

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_mp4,
            synth_mp4_bytes,
        )

        base = synth_mp4_bytes(3)
        # a trailing unknown box whose declared size overruns the file
        bad = base + struct.pack(">I", 64) + b"free" + bytes(8)
        with pytest.raises(ValueError, match="box"):
            _parse_mp4(bad)


class TestTruncationSweep:
    """EVERY prefix of every native format must either decode (only
    possible for the full payload) or raise ValueError — never leak
    IndexError / struct.error / zlib.error, and never hang. This is
    the task-failure contract a 100-TB scan relies on: a corrupt
    object fails its row cleanly instead of killing or wedging the
    executor."""

    @pytest.mark.parametrize(
        "name",
        ["png", "png_adam7", "jpeg", "jpeg_color", "jpeg_422",
         "flac", "flac_stereo", "flac_multi", "wav", "ppm", "mp4",
         "mjpeg_mp4"],
    )
    def test_every_prefix_fails_clean(self, name):
        import wave

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        synth = {
            "png": M.synth_png_bytes,
            "png_adam7": M.synth_png_adam7_bytes,
            "jpeg": M.synth_jpeg_bytes,
            "jpeg_color": M.synth_jpeg_color_bytes,
            "jpeg_422": M.synth_jpeg_422_bytes,
            "flac": M.synth_flac_bytes,
            "flac_stereo": M.synth_flac_stereo_bytes,
            "flac_multi": M.synth_flac_multichannel_bytes,
            "wav": M.synth_wav_bytes,
            "ppm": M.synth_ppm_bytes,
            "mp4": M.synth_mp4_bytes,
            "mjpeg_mp4": M.synth_mjpeg_mp4_bytes,
        }[name]
        parse = {
            "png": M._parse_png,
            "png_adam7": M._parse_png,
            "jpeg": M._parse_jpeg,
            "jpeg_color": M._parse_jpeg_ycbcr,
            "jpeg_422": M._parse_jpeg_ycbcr,
            "flac": M._parse_flac,
            "flac_stereo": M._parse_flac_multi,
            "flac_multi": M._parse_flac_multi,
            "wav": None,  # stdlib wave below
            "ppm": M._parse_ppm,
            "mp4": M._parse_mp4,
            "mjpeg_mp4": M._parse_mp4,
        }[name]
        data = synth(7)
        ok_types = (ValueError,)
        if name == "wav":
            import io

            def parse(b):  # noqa: F811 - local stdlib shim
                with wave.open(io.BytesIO(b), "rb") as wv:
                    wv.readframes(wv.getnframes())

            ok_types = (ValueError, wave.Error, EOFError)
        step = max(1, len(data) // 400)  # cap the sweep for big files
        for cut in range(0, len(data), step):
            try:
                parse(data[:cut])
            except ok_types:
                continue
            except Exception as exc:  # noqa: BLE001 - the assertion
                raise AssertionError(
                    f"{name} prefix {cut}/{len(data)} leaked "
                    f"{type(exc).__name__}: {exc}"
                ) from exc


class TestBitFlipSurface:
    """Single-bit corruption anywhere in a payload must either still
    decode (JPEG has no checksums — a flipped entropy bit can yield a
    different valid image) or raise ValueError; internal exception
    types (KeyError from a clobbered table selector was a real leak)
    must never escape the task."""

    @pytest.mark.parametrize("variant", ["gray", "420", "422"])
    def test_jpeg_every_nth_bit(self, variant):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        synth, parse = {
            "gray": (M.synth_jpeg_bytes, M._parse_jpeg),
            "420": (M.synth_jpeg_color_bytes, M._parse_jpeg_ycbcr),
            "422": (M.synth_jpeg_422_bytes, M._parse_jpeg_ycbcr),
        }[variant]
        data = bytes(synth(9))
        for bit in range(0, len(data) * 8, 5):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                parse(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001 - the assertion
                raise AssertionError(
                    f"{variant} bit {bit} leaked "
                    f"{type(exc).__name__}: {exc}"
                ) from exc

    @pytest.mark.parametrize("fmt", ["png", "png_adam7", "mp4"])
    def test_other_formats_every_nth_bit(self, fmt):
        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        synth, parse = {
            "png": (M.synth_png_bytes, M._parse_png),
            "png_adam7": (M.synth_png_adam7_bytes, M._parse_png),
            "mp4": (M.synth_mp4_bytes, M._parse_mp4),
        }[fmt]
        data = bytes(synth(9))
        for bit in range(0, len(data) * 8, 7):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                parse(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001 - the assertion
                raise AssertionError(
                    f"{fmt} bit {bit} leaked "
                    f"{type(exc).__name__}: {exc}"
                ) from exc


class TestWavBitFlipViaIngest:
    def test_wav_bit_flips_fail_clean_through_dispatch_logic(self):
        """Drive corrupt WAV bytes through the same parse+wrap the
        ingest dispatcher uses: every flip either decodes or raises
        ValueError (stdlib wave's bare RuntimeError is wrapped)."""
        import io
        import wave

        import numpy as np

        from mwa_uvdata_pipeline_spark.operators import multimodal as M

        def parse(data):
            try:
                with wave.open(io.BytesIO(data), "rb") as wv:
                    np.frombuffer(
                        wv.readframes(wv.getnframes()), dtype="<i2"
                    )
            except (wave.Error, EOFError, RuntimeError) as exc:
                raise ValueError("corrupt WAV payload") from exc

        data = bytes(M.synth_wav_bytes(9))
        for bit in range(0, len(data) * 8, 5):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                parse(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001 - the assertion
                raise AssertionError(
                    f"bit {bit} leaked {type(exc).__name__}"
                ) from exc
