"""Round 11: stereo FLAC (all four channel assignments, mid-side
hand vector), 3-8 channel FLAC, JPEG truncation surface + T.81
non-interleaved single-component scans, 4:2:2 JPEG,
JPEG-frames-in-MP4, Adam7 interlaced PNG (hand-laid pass layout),
the mixed-corpus magic-byte ingest dispatcher, and decode_media's
native non-deterministic path — pure-Python codec pins; the Spark
side is oracle-gated via the six new registry entries."""

import numpy as np
import pytest


class TestFlacStereo:
    """Stereo decode from spec: lossless decorrelation means every
    mode must reproduce the ramp channels bit-exactly."""

    def test_round_trip_all_four_channel_modes(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_stereo_bytes,
        )

        modes_seen = set()
        for doc_id in range(80):
            rate, nch, chans = _parse_flac_multi(
                synth_flac_stereo_bytes(doc_id)
            )
            n = 64 + doc_id % 64
            al = (doc_id * 7) % 2048 - 1024
            bl = doc_id % 17 - 8
            ar = (doc_id * 11) % 2048 - 1024
            br = doc_id % 13 - 6
            left = np.array([al + bl * i for i in range(n)], dtype="i8")
            right = np.array([ar + br * i for i in range(n)], dtype="i8")
            assert rate == 8000 and nch == 2
            assert (chans[0] == left).all(), doc_id
            assert (chans[1] == right).all(), doc_id
            modes_seen.add(doc_id % 4)
        assert modes_seen == {0, 1, 2, 3}

    def test_verbatim_17bit_side_arm_exercised(self):
        """doc_id % 5 == 0 writes the second subframe VERBATIM at its
        own width; doc 15 is mode 3 (mid-side), so its side subframe
        is 17-bit verbatim."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_stereo_bytes,
        )

        rate, nch, chans = _parse_flac_multi(synth_flac_stereo_bytes(15))
        n = 64 + 15 % 64
        assert len(chans[0]) == len(chans[1]) == n

    def test_hand_derived_mid_side_vector(self):
        """Mid-side reconstruction vs bits written out BY HAND:
        L=[5,2], R=[2,1] -> mid=[(7)>>1, (3)>>1]=[3,1],
        side=[3,1]; L+R is ODD both samples, so the parity carry
        L+R = (mid<<1)|(side&1) is exercised. Two VERBATIM
        subframes: mid at 16 bits, side at 17 (spec §9.2.1)."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _Bits,
            _crc8_flac,
            _crc16_flac,
            _parse_flac_multi,
        )

        n = 2
        si = _Bits()
        si.write(n, 16); si.write(n, 16)
        si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(1, 3); si.write(15, 5)
        si.write(n, 36)
        streaminfo = (
            b"\x80" + (34).to_bytes(3, "big") + si.bytes() + b"\x00" * 16
        )
        hb = _Bits()
        hb.write(0b11111111111110, 14)
        hb.write(0, 2)
        hb.write(0b0111, 4)   # blocksize: 16-bit at end
        hb.write(0b0100, 4)   # 8 kHz
        hb.write(0b1010, 4)   # MID-SIDE
        hb.write(0b100, 3); hb.write(0, 1)
        hb.write(0x00, 8)
        hb.write(n - 1, 16)
        header = hb.bytes()
        header += bytes([_crc8_flac(header)])
        body = _Bits()
        body.write(0b00000010, 8)  # VERBATIM mid
        body.write(3, 16)
        body.write(1, 16)
        body.write(0b00000010, 8)  # VERBATIM side, 17 bits
        body.write(3, 17)
        body.write(1, 17)
        body.pad_to_byte()
        frame = header + body.bytes()
        frame += _crc16_flac(frame).to_bytes(2, "big")
        rate, nch, chans = _parse_flac_multi(
            b"fLaC" + streaminfo + frame
        )
        assert rate == 8000 and nch == 2
        assert list(chans[0]) == [5, 2]
        assert list(chans[1]) == [2, 1]

    def test_negative_side_17bit_sign_extension(self):
        """A mid-side frame where side is NEGATIVE (R > L) pins the
        17-bit two's-complement sign read: L=[1], R=[4] -> mid=2,
        side=-3 (stored as 2^17 - 3)."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _Bits,
            _crc8_flac,
            _crc16_flac,
            _parse_flac_multi,
        )

        n = 1
        si = _Bits()
        si.write(n, 16); si.write(n, 16)
        si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(1, 3); si.write(15, 5)
        si.write(n, 36)
        streaminfo = (
            b"\x80" + (34).to_bytes(3, "big") + si.bytes() + b"\x00" * 16
        )
        hb = _Bits()
        hb.write(0b11111111111110, 14); hb.write(0, 2)
        hb.write(0b0111, 4); hb.write(0b0100, 4)
        hb.write(0b1010, 4); hb.write(0b100, 3); hb.write(0, 1)
        hb.write(0x00, 8); hb.write(n - 1, 16)
        header = hb.bytes()
        header += bytes([_crc8_flac(header)])
        body = _Bits()
        body.write(0b00000010, 8)
        body.write(2, 16)                       # mid = 2
        body.write(0b00000010, 8)
        body.write((-3) & ((1 << 17) - 1), 17)  # side = -3
        body.pad_to_byte()
        frame = header + body.bytes()
        frame += _crc16_flac(frame).to_bytes(2, "big")
        _, _, chans = _parse_flac_multi(b"fLaC" + streaminfo + frame)
        assert list(chans[0]) == [1]
        assert list(chans[1]) == [4]

    def test_stereo_decorrelation_in_mono_stream_raises(self):
        """A mono STREAMINFO with a mid-side frame code is invalid."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_bytes,
            synth_flac_stereo_bytes,
        )

        mono = synth_flac_bytes(3)
        stereo = synth_flac_stereo_bytes(3)  # mode 3 = mid-side
        # graft the stereo frame onto the mono STREAMINFO
        hacked = mono[: 4 + 4 + 34] + stereo[4 + 4 + 34 :]
        with pytest.raises(ValueError):
            _parse_flac_multi(hacked)

    def test_truncated_stereo_raises_clean_value_error(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_stereo_bytes,
        )

        data = synth_flac_stereo_bytes(7)
        with pytest.raises(ValueError, match="truncated FLAC"):
            _parse_flac_multi(data[: len(data) - 20])

    def test_stereo_crc16_corruption_detected(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_stereo_bytes,
        )

        data = bytearray(synth_flac_stereo_bytes(9))
        data[-1] ^= 0x01  # flip a CRC-16 bit
        with pytest.raises(ValueError, match="CRC-16"):
            _parse_flac_multi(bytes(data))

    def test_mono_wrapper_contract_unchanged(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac,
            synth_flac_stereo_bytes,
        )

        with pytest.raises(ValueError, match="expected mono"):
            _parse_flac(synth_flac_stereo_bytes(2))


class TestJpegRound11:
    """The two r10-advice fixes plus the 4:2:2 sampling variant."""

    def test_truncated_entropy_segment_raises_value_error(self):
        """r10 advice #1: a byte-truncated entropy segment must
        surface as a clean ValueError, matching FLAC/MP4."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg,
            synth_jpeg_bytes,
        )

        data = synth_jpeg_bytes(11)
        # cut inside the entropy segment (EOI plus some coded bytes)
        with pytest.raises(ValueError, match="truncated JPEG entropy"):
            _parse_jpeg(data[: len(data) - 4])

    def test_single_component_scan_is_non_interleaved(self):
        """r10 advice #2 (T.81 A.2.2): a grayscale frame DECLARING
        2x2 sampling decodes on the component's own ceil(w/8) x
        ceil(h/8) grid — identical pixels to the 1x1 declaration,
        not a 4x-larger MCU walk."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg,
            synth_jpeg_bytes,
        )

        data = synth_jpeg_bytes(7)
        w1, h1, img1 = _parse_jpeg(data)
        # patch the SOF0 component sampling byte 0x11 -> 0x22
        i = data.index(b"\xff\xc0")
        body = i + 4  # marker + length
        assert data[body + 7] == 0x11
        patched = data[: body + 7] + b"\x22" + data[body + 8 :]
        w2, h2, img2 = _parse_jpeg(patched)
        assert (w1, h1) == (w2, h2)
        assert (img1 == img2).all()

    def test_422_decodes_to_closed_form(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg_ycbcr,
            synth_jpeg_422_bytes,
        )

        for doc_id in range(12):
            w, h, Y, Cb, Cr = _parse_jpeg_ycbcr(
                synth_jpeg_422_bytes(doc_id)
            )
            mbw, mbh = 1 + doc_id % 3, 1 + doc_id % 2
            assert (w, h) == (mbw * 16, mbh * 8)
            assert Y.shape == (h, w)
            assert Cb.shape == (h, w // 2)  # coded (subsampled) res
            sy = sum(
                ((doc_id * 13 + mx * 17 + my * 19) % 256) * 128
                for mx in range(mbw) for my in range(mbh)
            )
            assert int(Y.sum()) == sy, doc_id

    def test_422_mcu_placement_weighted(self):
        """Two MCUs with different constants: the left half of the
        luma plane must equal the (mx=0) constant, the right half the
        (mx=1) constant — a 4:2:0-shaped walk would interleave them
        wrongly."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_jpeg_ycbcr,
            synth_jpeg_422_bytes,
        )

        doc_id = 1  # mbw = 2, mbh = 2
        w, h, Y, _, _ = _parse_jpeg_ycbcr(synth_jpeg_422_bytes(doc_id))
        for my in range(2):
            for mx in range(2):
                want = (doc_id * 13 + mx * 17 + my * 19) % 256
                tile = Y[my * 8 : my * 8 + 8, mx * 16 : mx * 16 + 16]
                assert (tile == want).all(), (mx, my)


class TestMjpegInMp4:
    """Container index -> ranged read -> frame decode, end-to-end on
    from-spec code with both decoders reused unchanged."""

    def test_sampled_frames_decode_to_closed_form(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _mp4_stsz_mdat,
            _parse_jpeg,
            synth_mjpeg_mp4_bytes,
        )

        for doc_id in range(15):
            data = synth_mjpeg_mp4_bytes(doc_id)
            sizes, mo = _mp4_stsz_mdat(data)
            assert len(sizes) == 2 + doc_id % 5
            off = mo
            for i, sz in enumerate(sizes):
                if i % 2 == 0:
                    fid = doc_id * 31 + i * 7
                    w, h, img = _parse_jpeg(data[off : off + sz])
                    wb, hb = 1 + fid % 4, 1 + fid % 3
                    assert (w, h) == (wb * 8, hb * 8)
                    want = sum(
                        ((fid * 7 + bx * 31 + by * 17) % 256) * 64
                        for bx in range(wb) for by in range(hb)
                    )
                    assert int(img.sum()) == want, (doc_id, i)
                off += sz

    def test_container_still_parses_with_general_meta_walk(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_mp4,
            synth_mjpeg_mp4_bytes,
        )

        meta = _parse_mp4(synth_mjpeg_mp4_bytes(6))
        assert meta["n_samples"] == 2 + 6 % 5
        assert meta["mdat_bytes"] == meta["sum_sample_bytes"]

    def test_one_byte_offset_shear_breaks_the_frame(self):
        """The failure mode the gate exists to catch: a slice shifted
        by one byte is no longer a valid JPEG at all (SOI gone)."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _mp4_stsz_mdat,
            _parse_jpeg,
            synth_mjpeg_mp4_bytes,
        )

        data = synth_mjpeg_mp4_bytes(4)
        sizes, mo = _mp4_stsz_mdat(data)
        with pytest.raises(ValueError):
            _parse_jpeg(data[mo + 1 : mo + 1 + sizes[0]])


class TestAdam7:
    """Adam7-interlaced PNG: same pixel field, the other legal
    serialization — pass geometry, per-pass filter state, and empty
    passes pinned by hand."""

    def test_adam7_equals_sequential_all_size_combos(self):
        """66 doc_ids cover every (w mod 11, h mod 6) size class; a
        correct interlaced decoder reproduces the sequential image
        bit-exactly for all of them."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
            synth_png_adam7_bytes,
            synth_png_bytes,
        )

        for doc_id in range(66):
            w1, h1, seq = _parse_png(synth_png_bytes(doc_id))
            w2, h2, ilc = _parse_png(synth_png_adam7_bytes(doc_id))
            assert (w1, h1) == (w2, h2)
            assert (seq == ilc).all(), doc_id

    @staticmethod
    def _wrap(w, h, raw):
        import struct
        import zlib

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _png_chunk,
        )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    def test_hand_laid_5x3_pass_layout(self):
        """The full 5x3 Adam7 datastream laid out BY HAND from the
        spec's pass grid (membership derived manually: pass 3 is
        EMPTY because its y-origin 4 >= h; pass 6 row 0 uses filter
        2 = Up so a decoder that carries filter state across the
        pass boundary — instead of resetting prev to zeros — decodes
        the wrong pixels there)."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
        )

        def px(x, y):
            return bytes([10 * x + y, 20 + x, x + 7 * y])

        raw = bytearray()
        raw += b"\x00" + px(0, 0)                       # pass 1: (0,0)
        raw += b"\x00" + px(4, 0)                       # pass 2: (4,0)
        # pass 3: y0=4 >= 3 -> EMPTY, zero bytes
        raw += b"\x00" + px(2, 0)                       # pass 4: (2,0)
        raw += b"\x00" + px(0, 2) + px(2, 2) + px(4, 2)  # pass 5
        raw += b"\x02" + px(1, 0) + px(3, 0)            # pass 6 row 0 (Up)
        raw += b"\x00" + px(1, 2) + px(3, 2)            # pass 6 row 1
        raw += b"\x00" + b"".join(px(x, 1) for x in range(5))  # pass 7
        w, h, img = _parse_png(self._wrap(5, 3, raw))
        assert (w, h) == (5, 3)
        for y in range(3):
            for x in range(5):
                assert tuple(img[y, x]) == tuple(px(x, y)), (x, y)

    def test_single_pixel_image_only_pass_one(self):
        """1x1: pass 1 holds the pixel; passes 2-7 are all empty and
        must consume zero bytes."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
        )

        w, h, img = _parse_png(self._wrap(1, 1, b"\x00\x09\x14\x00"))
        assert (w, h) == (1, 1)
        assert tuple(img[0, 0]) == (9, 20, 0)

    def test_truncated_pass_raises_clean_valueerror(self):
        """Dropping the final pass's scanline must surface as a clean
        ValueError (same failure surface as FLAC/MP4/JPEG)."""
        import pytest

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
        )

        raw = b"\x00\x09\x14\x00"[:-2]  # 1x1 stream cut mid-scanline
        with pytest.raises(ValueError):
            _parse_png(self._wrap(1, 1, raw))

    def test_trailing_garbage_raises(self):
        """Extra bytes after the last pass break the stream-length
        cross-check."""
        import pytest

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
        )

        with pytest.raises(ValueError):
            _parse_png(self._wrap(1, 1, b"\x00\x09\x14\x00\xff"))


class TestIngestDispatch:
    """Magic-byte sniffing + unified dispatch over a mixed corpus."""

    def test_sniff_routes_every_synth_kind(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            sniff_payload_kind,
            synth_flac_bytes,
            synth_jpeg_bytes,
            synth_mp4_bytes,
            synth_png_adam7_bytes,
            synth_png_bytes,
            synth_wav_bytes,
        )

        assert sniff_payload_kind(synth_png_bytes(3)) == "png"
        assert sniff_payload_kind(synth_png_adam7_bytes(3)) == "png"
        assert sniff_payload_kind(synth_jpeg_bytes(3)) == "jpeg"
        assert sniff_payload_kind(synth_flac_bytes(3)) == "flac"
        assert sniff_payload_kind(synth_wav_bytes(3)) == "wav"
        assert sniff_payload_kind(synth_mp4_bytes(3)) == "mp4"
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            synth_ppm_bytes,
        )
        assert sniff_payload_kind(synth_ppm_bytes(3)) == "ppm"

    def test_sniff_rejects_unknown_magic(self):
        import pytest

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            sniff_payload_kind,
        )

        with pytest.raises(ValueError):
            sniff_payload_kind(b"\x00\x01\x02\x03not a media file....")

    def test_mixed_corpus_interleaves_all_five_kinds(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            sniff_payload_kind,
            synth_mixed_bytes,
        )

        expected = ["png", "jpeg", "flac", "wav", "mp4", "ppm"]
        for doc_id in range(18):
            got = sniff_payload_kind(synth_mixed_bytes(doc_id))
            assert got == expected[doc_id % 6], doc_id

    def test_dispatch_rows_unified_schema(self, spark):
        """One Spark pass over a mixed corpus: kind from the bytes,
        dims NULL exactly for the audio formats, checksum equal to
        each format's closed form."""
        from mwa_uvdata_pipeline_spark.plans import PLANS, load_all

        load_all()
        rows = {
            r["doc_id"]: r
            for r in PLANS["m_ingest_dispatch"]
            .spark(spark, "/root/testdata/sf0.001")
            .collect()
        }
        kinds = {r["kind"] for r in rows.values()}
        assert kinds == {"png", "jpeg", "flac", "wav", "mp4", "ppm"}
        for doc_id, r in rows.items():
            if r["kind"] in ("flac", "wav"):
                assert r["width"] is None and r["height"] is None
            else:
                assert r["width"] and r["height"]
        # flac branch closed form: sum of the ramp a + b*i
        for doc_id, r in rows.items():
            if r["kind"] != "flac":
                continue
            n = 64 + doc_id % 64
            a = (doc_id * 7) % 2048 - 1024
            b = doc_id % 17 - 8
            assert r["n_units"] == n
            assert r["value_sum"] == n * a + b * n * (n - 1) // 2


class TestFlacMultichannel:
    """3-8 independent channels (spec §9.1.3): the >2-channel seam,
    closed — decorrelation stays stereo-only."""

    def test_round_trip_all_channel_counts(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_multichannel_bytes,
        )

        seen = set()
        for doc_id in range(60):
            rate, nch, chans = _parse_flac_multi(
                synth_flac_multichannel_bytes(doc_id)
            )
            n = 64 + doc_id % 64
            assert rate == 8000 and nch == 3 + doc_id % 6
            for c, s in enumerate(chans):
                a = (doc_id * 7 + c * 29) % 2048 - 1024
                b = (doc_id + 3 * c) % 17 - 8
                want = np.array(
                    [a + b * i for i in range(n)], dtype="i8"
                )
                assert (s == want).all(), (doc_id, c)
            seen.add(nch)
        assert seen == {3, 4, 5, 6, 7, 8}

    def test_mixed_subframe_types_within_one_frame(self):
        """doc 20: nch=5, channel 0 is VERBATIM ((20+0)%5==0) and
        channel 1 FIXED — a decoder that assumes one subframe type
        per frame mis-walks the bitstream and fails the CRC."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_multichannel_bytes,
        )

        rate, nch, chans = _parse_flac_multi(
            synth_flac_multichannel_bytes(20)
        )
        assert nch == 5
        assert len({len(s) for s in chans}) == 1

    def test_channel_count_mismatch_rejected(self):
        """A frame declaring fewer independent channels than
        STREAMINFO is a corrupt stream, not a silent truncation."""
        import pytest

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _crc8_flac,
            _parse_flac_multi,
            synth_flac_multichannel_bytes,
        )

        data = bytearray(synth_flac_multichannel_bytes(0))  # nch=3
        # frame header starts after fLaC + 4-byte block header +
        # 34-byte STREAMINFO; its byte 3 is [ch_code(4)|bps(3)|res(1)]
        fh = 4 + 4 + 34
        data[fh + 3] = (0b0001 << 4) | (data[fh + 3] & 0x0F)  # say 2ch
        # re-sign the 7-byte header's CRC-8 so the mismatch we hit is
        # the CHANNEL check, not the checksum
        data[fh + 7] = _crc8_flac(bytes(data[fh : fh + 7]))
        with pytest.raises(ValueError, match="channel"):
            _parse_flac_multi(bytes(data))

    def test_nine_channels_impossible_by_spec_field_width(self):
        """STREAMINFO's channel field is 3 bits (1..8); the decoder
        gate mirrors the spec bound exactly."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_flac_multi,
            synth_flac_multichannel_bytes,
        )

        # All synthesizable counts decode; the 1-8 guard is the
        # spec's own field range, so nothing >8 can even be encoded.
        for doc_id in (5, 11):
            _parse_flac_multi(synth_flac_multichannel_bytes(doc_id))


class TestDecodeMediaNative:
    """decode_media(deterministic=False) now runs the REAL from-spec
    decoders — the NotImplementedError seam is scoped to unknown
    containers only."""

    def test_native_meta_per_kind(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _decode_media_native,
            synth_flac_bytes,
            synth_jpeg_bytes,
            synth_mp4_bytes,
            synth_png_adam7_bytes,
            synth_png_bytes,
            synth_wav_bytes,
        )

        d = 7
        assert _decode_media_native(synth_png_bytes(d)) == (
            5 + d % 11, 3 + d % 6, 1)
        assert _decode_media_native(synth_png_adam7_bytes(d)) == (
            5 + d % 11, 3 + d % 6, 1)
        assert _decode_media_native(synth_jpeg_bytes(d)) == (
            (1 + d % 4) * 8, (1 + d % 3) * 8, 1)
        assert _decode_media_native(synth_mp4_bytes(d)) == (
            16 * (1 + d % 20), 16 * (1 + d % 12), 2 + d % 29)
        assert _decode_media_native(synth_wav_bytes(d)) == (None, None, 1)
        assert _decode_media_native(synth_flac_bytes(d)) == (None, None, 1)

    def test_unknown_container_still_the_library_seam(self):
        import pytest

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _decode_media_native,
        )

        with pytest.raises(NotImplementedError, match="unrecognized"):
            _decode_media_native(b"\x00\x00\x00\x18moof" + b"\x00" * 64)

    def test_spark_non_deterministic_path(self, spark):
        """The operator itself, non-deterministic, over a mixed
        corpus: real dims for image/video kinds, NULL dims for
        audio, one row per input."""
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            decode_media,
            synth_payloads,
        )

        docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
        rows = decode_media(
            synth_payloads(docs, "mixed"), deterministic=False
        ).collect()
        assert len(rows) == 20
        for r in rows:
            if r["doc_id"] % 6 in (2, 3):  # flac, wav
                assert r["width"] is None and r["height"] is None
                assert r["n_frames"] == 1
            else:
                assert r["width"] > 0 and r["height"] > 0

    def test_deterministic_default_unchanged(self, spark):
        """The md5-derived path (the oracle-gated one) is untouched:
        same values as the driver-side digest helper."""
        import hashlib

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _meta_from_digest,
            decode_media,
            synth_payloads,
        )
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            synth_mixed_bytes,
        )

        docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        rows = {
            r["doc_id"]: r
            for r in decode_media(synth_payloads(docs, "mixed")).collect()
        }
        for d in range(10):
            w, h, nf = _meta_from_digest(
                hashlib.md5(synth_mixed_bytes(d)).hexdigest()
            )
            assert (rows[d]["width"], rows[d]["height"],
                    rows[d]["n_frames"]) == (w, h, nf)


class TestPpmTruncationSurface:
    """Regression: a truncated PPM header used to spin the byte scan
    forever (reachable since the sniffer routes P6 payloads) — the
    worst failure mode inside a Spark task. It must raise."""

    def test_bare_magic_not_sniffed_as_ppm(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            sniff_payload_kind,
        )

        with pytest.raises(ValueError, match="magic"):
            sniff_payload_kind(b"P6")

    def test_header_truncations_raise(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_ppm,
        )

        for blob in (b"P6 ", b"P6 4", b"P6 4 3", b"P6 4 3 255",
                     b"P6 #no newline ever"):
            with pytest.raises(ValueError):
                _parse_ppm(blob)

    def test_short_raster_raises(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_ppm,
        )

        with pytest.raises(ValueError):
            _parse_ppm(b"P6 4 3 255\n" + b"\x00" * 5)  # needs 36

    def test_comment_and_valid_header_still_parse(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_ppm,
        )

        w, h, img = _parse_ppm(
            b"P6 # a comment\n2 1 255\n" + bytes([1, 2, 3, 4, 5, 6])
        )
        assert (w, h) == (2, 1)
        assert img[0, 0].tolist() == [1, 2, 3]
        assert img[0, 1].tolist() == [4, 5, 6]


class TestPngCorruptionSurface:
    """Corrupt PNG byte streams must all surface as clean ValueError
    from the task (never zlib.error / struct.error)."""

    def test_corrupt_idat_stream_is_value_error(self):
        import struct
        import zlib

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
            _png_chunk,
        )

        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", b"\xff\xfe definitely not deflate")
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="IDAT"):
            _parse_png(blob)

    def test_chunk_length_overrun_is_value_error(self):
        import struct

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
            _png_chunk,
        )

        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
        good = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        # a chunk whose declared length runs past the end of the file
        bad = good + struct.pack(">I", 4096) + b"IDAT" + b"\x00" * 8
        with pytest.raises(ValueError, match="truncated|CRC"):
            _parse_png(bad)

    def test_short_ihdr_with_valid_crc_is_value_error(self):
        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            _parse_png,
            _png_chunk,
        )

        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", b"\x00" * 10)  # CRC valid, length not
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="IHDR"):
            _parse_png(blob)


class TestIngestWavSurface:
    def test_corrupt_riff_is_value_error(self, spark):
        """A payload that sniffs as WAV but has a mangled fmt chunk
        must fail its task with the family's ValueError, not
        wave.Error."""
        import pandas as pd

        from mwa_uvdata_pipeline_spark.operators.multimodal import (
            ingest_dispatch,
            synth_wav_bytes,
        )

        blob = bytearray(synth_wav_bytes(3))
        blob[12:16] = b"junk"  # clobber the fmt chunk id
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "payload": [bytes(blob)]})
        )
        with pytest.raises(Exception, match="corrupt WAV payload"):
            ingest_dispatch(df).collect()
