"""Round-14 pinned behaviors.

Part 1 — the r13 ADVICE fixes plus the verdict's decode_wav contract
item:
  * TIFF sample layouts other than gray (spp=1) / RGB (spp=3) are
    rejected up front (gray+alpha used to reach the reshape and die
    with IndexError).
  * A tiny GIF declaring an enormous logical screen fails as a clean
    ValueError BEFORE the canvas allocation (used to MemoryError).
  * The BMP sniffer no longer claims OS/2 core-header (size 12)
    files that the parser rejects — the two lists agree.
  * decode_wav's DIRECT path wraps stdlib wave.Error into the codec
    family's ValueError contract (ingest_dispatch already did).

Part 2 — animated-GIF compositing (r13 verdict #5): disposal
methods 0-3, per-frame local color tables, per-frame transparency.

Part 3 — IMA ADPCM WAV (r13 verdict #3): from-spec RIFF walk (no
stdlib wave), per-block predictor/step-index state, fact-chunk
truncation, dispatch routing.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from mwa_uvdata_pipeline_spark.operators import multimodal as M


def _tiff_gray_alpha_2x2() -> bytes:
    """Hand-built 2x2 little-endian TIFF with photo=1 (BlackIsZero),
    spp=2, bps=[8,8] — the gray+alpha layout the parser must reject
    (ADVICE r13, medium)."""
    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == 3 and count == 1:
            return struct.pack("<HHI", tag, typ, count) + struct.pack(
                "<HH", value, 0
            )
        return struct.pack("<HHII", tag, typ, count, value)

    # layout: header(8) | bps array(4) | pixel data(8) | IFD
    bps_off, data_off = 8, 12
    ifd_off = data_off + 8
    entries = [
        entry(256, 3, 1, 2),            # ImageWidth
        entry(257, 3, 1, 2),            # ImageLength
        entry(258, 3, 2, bps_off),      # BitsPerSample -> [8, 8]
        entry(259, 3, 1, 1),            # Compression: none
        entry(262, 3, 1, 1),            # Photometric: BlackIsZero
        entry(273, 4, 1, data_off),     # StripOffsets
        entry(277, 3, 1, 2),            # SamplesPerPixel: gray+alpha
        entry(278, 3, 1, 2),            # RowsPerStrip
        entry(279, 4, 1, 8),            # StripByteCounts
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries)
    ifd += struct.pack("<I", 0)
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + struct.pack("<HH", 8, 8)
        + bytes(range(8))
        + ifd
    )


class TestAdviceFixes:
    def test_tiff_gray_alpha_rejects_cleanly(self):
        with pytest.raises(ValueError, match="sample layout"):
            M._parse_tiff(_tiff_gray_alpha_2x2())

    def test_tiff_spp_zero_rejects_cleanly(self):
        blob = bytearray(_tiff_gray_alpha_2x2())
        # SamplesPerPixel is the 7th IFD entry (entries start after
        # the 2-byte count at ifd_off=20); patch its inline value
        ent = 20 + 2 + 6 * 12
        assert struct.unpack_from("<H", blob, ent)[0] == 277
        struct.pack_into("<H", blob, ent + 8, 0)
        with pytest.raises(ValueError, match="sample layout"):
            M._parse_tiff(bytes(blob))

    def test_gif_bogus_huge_canvas_fails_before_alloc(self):
        # ~30-byte file declaring a 65535x65535 screen: must be a
        # clean ValueError, never a multi-GB allocation
        blob = (
            b"GIF89a"
            + (65535).to_bytes(2, "little") * 2
            + bytes([0, 0, 0])
            + b"\x2c" + bytes(4)
            + (1).to_bytes(2, "little") * 2
            + bytes([0, 2, 0])
            + b"\x3b"
        )
        with pytest.raises(ValueError, match="implausibly large"):
            M._parse_gif(blob)

    def test_gif_canvas_bound_spares_real_files(self):
        # every synthesizable doc still parses (the bound's floor)
        for doc in (0, 1, 5, 17):
            M._parse_gif(M.synth_gif_bytes(doc))

    def test_bmp_core_header_not_sniffed_as_bmp(self):
        # OS/2 BITMAPCOREHEADER (size 12): parser rejects it, so the
        # sniffer must too — one consistent failure, not two
        blob = b"BM" + bytes(12) + struct.pack("<I", 12) + bytes(40)
        with pytest.raises(ValueError, match="unrecognized payload"):
            M.sniff_payload_kind(blob)
        with pytest.raises(ValueError, match="header size"):
            M._parse_bmp(blob)

    def test_png_deflate_bomb_fails_before_inflate(self):
        """Self-review finding, same class as the GIF canvas bound: a
        ~4 KB PNG with valid CRCs declaring 60000x60000 and carrying
        a deflate bomb must fail as a clean ValueError BEFORE the
        unbounded inflate hands it the whole allocation (deflate
        legally expands ~1032x in one C call)."""
        import time
        import zlib

        def chunk(typ, body):
            return (
                struct.pack(">I", len(body)) + typ + body
                + struct.pack(
                    ">I", zlib.crc32(typ + body) & 0xFFFFFFFF
                )
            )

        ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(1 << 22), 9))
            + chunk(b"IEND", b"")
        )
        t0 = time.time()
        # 3.6 Gpx trips the MAX_DECODE_PIXELS cap; the payload-ratio
        # bound backs it up for sub-cap dims
        with pytest.raises(
            ValueError, match="MAX_DECODE_PIXELS|implausibly large"
        ):
            M._parse_png(blob)
        assert time.time() - t0 < 0.5  # fails on the header, not
        # after a giant allocation

    def test_png_ratio_bound_below_pixel_cap(self):
        """A 4000x4000 declaration (under the pixel cap) with a tiny
        payload still rejects via the deflate-ratio bound."""
        import zlib

        def chunk(typ, body):
            return (
                struct.pack(">I", len(body)) + typ + body
                + struct.pack(
                    ">I", zlib.crc32(typ + body) & 0xFFFFFFFF
                )
            )

        ihdr = struct.pack(">IIBBBBB", 4000, 4000, 8, 2, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(100)))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="implausibly large"):
            M._parse_png(blob)

    def test_jpeg_huge_dims_fail_before_block_alloc(self):
        """A ~300-byte JPEG declaring 65535x65535 would request
        ~34 GB of per-component coefficient arrays; the
        MAX_DECODE_PIXELS cap (PIL prior art) rejects at the SOF."""
        import time

        blob = bytearray(M.synth_jpeg_bytes(3))
        at = blob.find(b"\xff\xc0")
        struct.pack_into(">HH", blob, at + 5, 65535, 65535)
        t0 = time.time()
        with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
            M._jpeg_decode(bytes(blob))
        assert time.time() - t0 < 0.5

    def test_png_overlong_stream_still_rejects(self):
        """A stream inflating past the IHDR-derived size is capped at
        expected+1 bytes and rejected — the lying-stream arm of the
        bounded inflate."""
        import zlib

        def chunk(typ, body):
            return (
                struct.pack(">I", len(body)) + typ + body
                + struct.pack(
                    ">I", zlib.crc32(typ + body) & 0xFFFFFFFF
                )
            )

        # 1x1 gray 8-bit: expected = 1*(1 + 1) = 2 bytes
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
        blob = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(1000)))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="length mismatch"):
            M._parse_png(blob)

    def test_tiff_bogus_huge_dims_fail_before_strips(self):
        blob = bytearray(M.synth_tiff_bytes(2))  # little-endian doc
        (ifd_off,) = struct.unpack("<I", blob[4:8])
        for i in range(struct.unpack_from("<H", blob, ifd_off)[0]):
            at = ifd_off + 2 + 12 * i
            if struct.unpack_from("<H", blob, at)[0] in (256, 257):
                struct.pack_into("<H", blob, at + 8, 60000)
        with pytest.raises(ValueError, match="implausibly large"):
            M._parse_tiff(bytes(blob))

    def test_decode_wav_wraps_wave_error(self, spark):
        # fmt tag 0x11 (IMA ADPCM): stdlib wave raises wave.Error;
        # the DIRECT decode_wav path must surface the family's
        # ValueError (r13 verdict #4)
        fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, 256, 4)
        blob = (
            b"RIFF" + struct.pack("<I", 28 + len(fmt)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + bytes(4)
        )
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "payload": [blob]})
        )
        with pytest.raises(Exception, match="corrupt WAV payload"):
            M.decode_wav(df).collect()


def _animated_expected(doc_id: int):
    """Independent composition of synth_gif_animated_bytes' three
    frames — the same closed form the SQL oracle restates."""
    w, h = 8 + doc_id % 8, 6 + doc_id % 5
    gct = np.array(
        [[(doc_id * 5 + i * 17) % 256, (doc_id * 3 + i * 29) % 256,
          (doc_id * 7 + i * 13) % 256] for i in range(8)]
    )
    lct = np.array(
        [[(doc_id * 7 + i * 11) % 256, (doc_id + i * 23) % 256,
          (doc_id * 3 + i * 19) % 256] for i in range(8)]
    )
    img = np.zeros((h, w, 3), dtype="i8")
    for y in range(h):
        for x in range(w):
            img[y, x] = gct[(doc_id + x * 3 + y * 5) % 8]
    l2, t2 = doc_id % 3, doc_id % 2
    w2, h2 = 3 + doc_id % 3, 2 + doc_id % 2
    if doc_id % 2 == 0:  # disposal 2: frame-2 rect -> background
        img[t2 : t2 + h2, l2 : l2 + w2] = gct[doc_id % 8]
    # odd doc_ids: disposal 3 restores frame-1 content — no net change
    l3, t3 = 2 + doc_id % 2, 1 + doc_id % 2
    w3, h3 = 3 + doc_id % 2, 2 + doc_id % 3
    for y in range(h3):
        for x in range(w3):
            p3 = (doc_id + x * 2 + y * 3) % 8
            if p3 != 7:  # index 7 is transparent
                img[t3 + y, l3 + x] = lct[p3]
    return w, h, img


class TestGifAnimatedCompositing:
    @pytest.mark.parametrize("doc", list(range(16)))
    def test_composite_round_trip_exact(self, doc):
        w, h, img = M._parse_gif(M.synth_gif_animated_bytes(doc))
        ew, eh, eimg = _animated_expected(doc)
        assert (w, h) == (ew, eh)
        assert (img == eimg).all()

    @pytest.mark.parametrize("doc", [0, 1])
    def test_disposal_actually_matters(self, doc):
        """A decoder that LEFT frame 2 in place would disagree with
        the composite inside frame 2's rect (outside frame 3's):
        prove such pixels exist and carry frame-2 colors there."""
        _, _, img = M._parse_gif(M.synth_gif_animated_bytes(doc))
        _, _, exp = _animated_expected(doc)
        gct = np.array(
            [[(doc * 5 + i * 17) % 256, (doc * 3 + i * 29) % 256,
              (doc * 7 + i * 13) % 256] for i in range(8)]
        )
        l2, t2 = doc % 3, doc % 2
        w2, h2 = 3 + doc % 3, 2 + doc % 2
        l3, t3 = 2 + doc % 2, 1 + doc % 2
        w3, h3 = 3 + doc % 2, 2 + doc % 3
        checked = 0
        for y in range(t2, t2 + h2):
            for x in range(l2, l2 + w2):
                if l3 <= x < l3 + w3 and t3 <= y < t3 + h3:
                    continue  # frame 3 may overdraw here
                p2 = (doc * 2 + (x - l2) + (y - t2)) % 8
                if (gct[p2] == exp[y, x]).all():
                    continue  # frame-2 color happens to coincide
                assert (img[y, x] == exp[y, x]).all()
                checked += 1
        assert checked > 0, "no pixel distinguishes the disposals"

    def test_disposal_2_vs_3_differ(self):
        """Adjacent docs flip method 2/3; sanity-check that for an
        even doc, treating disposal 2 as 3 would change the canvas
        (bg color != frame-1 color somewhere in the rect)."""
        doc = 2
        _, _, img = M._parse_gif(M.synth_gif_animated_bytes(doc))
        gct = np.array(
            [[(doc * 5 + i * 17) % 256, (doc * 3 + i * 29) % 256,
              (doc * 7 + i * 13) % 256] for i in range(8)]
        )
        l2, t2 = doc % 3, doc % 2
        w2, h2 = 3 + doc % 3, 2 + doc % 2
        l3, t3 = 2 + doc % 2, 1 + doc % 2
        w3, h3 = 3 + doc % 2, 2 + doc % 3
        wrong = 0
        for y in range(t2, t2 + h2):
            for x in range(l2, l2 + w2):
                if l3 <= x < l3 + w3 and t3 <= y < t3 + h3:
                    continue
                p1 = (doc + x * 3 + y * 5) % 8
                if (gct[p1] != gct[doc % 8]).any():
                    assert (img[y, x] == gct[doc % 8]).all()
                    wrong += 1
        assert wrong > 0

    def test_reserved_disposal_rejects(self):
        blob = bytearray(M.synth_gif_animated_bytes(3))
        at = blob.index(b"\x21\xf9")
        blob[at + 3] = 4 << 2  # disposal method 4: reserved
        with pytest.raises(ValueError, match="reserved GIF disposal"):
            M._parse_gif(bytes(blob))

    def test_gce_resets_between_frames(self):
        """Frame 3 carries the only transparency GCE; frame 1's
        disposal-1 GCE must not leak forward. Pin by checking frame 3
        region transparency behaves (already in round trip) AND that
        a GIF whose LAST frame has no GCE composes opaquely."""
        doc = 4
        base = M.synth_gif_animated_bytes(doc)
        # strip frame 3's GCE (8 bytes before its 0x2C descriptor):
        # find the THIRD GCE
        at = -1
        for _ in range(3):
            at = base.index(b"\x21\xf9", at + 1)
        blob = base[:at] + base[at + 8:]
        _, _, img = M._parse_gif(blob)
        _, _, exp = _animated_expected(doc)
        lct = np.array(
            [[(doc * 7 + i * 11) % 256, (doc + i * 23) % 256,
              (doc * 3 + i * 19) % 256] for i in range(8)]
        )
        l3, t3 = 2 + doc % 2, 1 + doc % 2
        w3, h3 = 3 + doc % 2, 2 + doc % 3
        exp2 = exp.copy()
        for y in range(h3):
            for x in range(w3):
                p3 = (doc + x * 2 + y * 3) % 8
                exp2[t3 + y, l3 + x] = lct[p3]  # 7 now opaque
        assert (img == exp2).all()

    def test_dispatch_routes_animated_gif(self, spark):
        blob = M.synth_gif_animated_bytes(5)
        assert M.sniff_payload_kind(blob) == "gif"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [5], "payload": [blob]})
        )
        row = M.ingest_dispatch(df).collect()[0]
        ew, eh, eimg = _animated_expected(5)
        assert row["kind"] == "gif"
        assert (row["width"], row["height"]) == (ew, eh)
        assert row["value_sum"] == int(eimg.sum())


def _adpcm_stereo_blob() -> bytes:
    """Hand-built one-block STEREO IMA ADPCM WAV: blockAlign 16 ->
    9 samples per block per channel (header + one 4-byte word per
    channel), fact total 9. Left starts (pred 0, idx 0) with data
    word 0x3B 0x00 0x00 0x00 — LOW nibble first, so codes 11, 3,
    then six zeros; right starts (pred 100, idx 5) with an all-zero
    word."""
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 16, 4, 2, 9)
    left_hdr = struct.pack("<hBB", 0, 0, 0)
    right_hdr = struct.pack("<hBB", 100, 5, 0)
    left_word = bytes([0x3B, 0, 0, 0])   # nibbles: 3, 11(0xB? no —
    # 0x3B -> low 0xB=11 first, then high 0x3=3), then six zeros
    right_word = bytes(4)
    block = left_hdr + right_hdr + left_word + right_word
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, 9)
        + b"data" + struct.pack("<I", len(block)) + block
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestWavAdpcm:
    def test_ima_step_hand_vector(self):
        """IMA spec arithmetic by hand from step_table[0] = 7:
        nibble 3 -> diff = 0+1+3 = 4, index -1 clamps to 0;
        nibble 11 (sign bit + 3) -> same magnitude, subtracted."""
        assert M._ima_step(0, 0, 3) == (4, 0)
        assert M._ima_step(4, 0, 11) == (0, 0)

    def test_clamps(self):
        # predictor clamp at int16, index clamp at 88
        p, i = M._ima_step(32700, 88, 7)  # +step 32767 -> clamp
        assert (p, i) == (32767, 88)
        p, i = M._ima_step(-32700, 88, 15)
        assert (p, i) == (-32768, 88)

    @pytest.mark.parametrize("doc", list(range(12)))
    def test_mono_round_trip_matches_recurrence(self, doc):
        rate, nch, s = M._parse_wav_adpcm(M.synth_wav_adpcm_bytes(doc))
        assert (rate, nch) == (8000, 1)
        spb, n = 33, 40 + doc % 50
        exp = []
        for b in range((n + spb - 1) // spb):
            pred = (doc * 7 + b * 11) % 2048 - 1024
            idx = (doc + b * 5) % 89
            exp.append(pred)
            for k in range(32):
                pred, idx = M._ima_step(
                    pred, idx, (doc * 3 + b * 7 + k * 5) % 16
                )
                exp.append(pred)
        assert list(s) == exp[:n]
        assert len(s) == n  # fact truncation applied

    def test_fact_truncation_is_load_bearing(self):
        """Doc 7 has n = 47: two blocks decode 66 samples, fact says
        47 — the tail must be dropped."""
        _, _, s = M._parse_wav_adpcm(M.synth_wav_adpcm_bytes(7))
        assert len(s) == 47

    def test_stereo_deinterleave_hand_vector(self):
        rate, nch, s = M._parse_wav_adpcm(_adpcm_stereo_blob())
        assert (rate, nch) == (8000, 2)
        assert len(s) == 18  # 9 per channel, interleaved
        # left channel: header 0, then nibbles 11, 3, 0 x6
        lp, li = 0, 0
        lexp = [0]
        for nib in (0xB, 0x3, 0, 0, 0, 0, 0, 0):
            lp, li = M._ima_step(lp, li, nib)
            lexp.append(lp)
        rp, ri = 100, 5
        rexp = [100]
        for nib in (0,) * 8:
            rp, ri = M._ima_step(rp, ri, nib)
            rexp.append(rp)
        assert list(s[0::2]) == lexp
        assert list(s[1::2]) == rexp

    def test_validation_errors(self):
        good = M.synth_wav_adpcm_bytes(5)

        def patched(offset: int, value: bytes) -> bytes:
            b = bytearray(good)
            b[offset : offset + len(value)] = value
            return bytes(b)

        # PCM tag through the ADPCM parser
        with pytest.raises(ValueError, match="not IMA ADPCM"):
            M._parse_wav_adpcm(patched(20, struct.pack("<H", 1)))
        # 3 channels
        with pytest.raises(ValueError, match="channel count"):
            M._parse_wav_adpcm(patched(22, struct.pack("<H", 3)))
        # samplesPerBlock inconsistent with blockAlign
        with pytest.raises(ValueError, match="samplesPerBlock"):
            M._parse_wav_adpcm(patched(38, struct.pack("<H", 40)))
        # header step index 89
        data_at = good.index(b"data") + 8
        with pytest.raises(ValueError, match="step index"):
            M._parse_wav_adpcm(patched(data_at + 2, bytes([89])))
        # fact total beyond what the blocks carry
        fact_at = good.index(b"fact") + 8
        with pytest.raises(ValueError, match="fact total"):
            M._parse_wav_adpcm(patched(fact_at, struct.pack("<I", 999)))
        # missing fact chunk entirely
        b = bytearray(good)
        fa = good.index(b"fact")
        del b[fa : fa + 12]
        struct.pack_into("<I", b, 4, len(b) - 8)
        with pytest.raises(ValueError, match="fact chunk"):
            M._parse_wav_adpcm(bytes(b))

    def test_zero_sample_stream_decodes_empty(self):
        """fact total 0 with an empty data chunk is the one legal
        degenerate (self-review finding, the FLAC total=0 lesson):
        it must decode to zero samples, not reject."""
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 20, 4, 2,
                          33)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, 0)
            + b"data" + struct.pack("<I", 0)
        )
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, nch, s = M._parse_wav_adpcm(blob)
        assert (rate, nch, len(s)) == (8000, 1, 0)
        # but a zero fact total with blocks PRESENT still rejects
        with pytest.raises(ValueError, match="fact total"):
            M._parse_wav_adpcm(
                bytes(M.synth_wav_adpcm_bytes(5)).replace(
                    b"fact" + struct.pack("<II", 4, 45),
                    b"fact" + struct.pack("<II", 4, 0),
                )
            )

    def test_dispatch_keeps_quirky_pcm_acceptance(self, spark):
        """Self-review pin: a PCM WAV with a truncated trailing
        metadata chunk AFTER the data chunk decodes in stdlib wave,
        so the dispatcher's fmt-tag triage must not reject it — the
        peek is lenient; only the ADPCM decoder walks strictly."""
        quirky = M.synth_wav_bytes(9) + b"LIST" + struct.pack(
            "<I", 100
        )  # declares 100 bytes, carries none
        with pytest.raises(ValueError):
            M._riff_chunks(quirky)  # the strict walk rejects it
        assert M._riff_fmt_tag(quirky) == 1  # the lenient peek works
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [9], "payload": [quirky]})
        )
        row = M.ingest_dispatch(df).collect()[0]
        assert row["kind"] == "wav"
        assert row["n_units"] == 64 + 9 % 64

    def test_dispatch_routes_adpcm_separately_from_pcm(self, spark):
        adpcm, pcm = M.synth_wav_adpcm_bytes(3), M.synth_wav_bytes(3)
        assert M.sniff_payload_kind(adpcm) == "wav"
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "payload": [adpcm, pcm]})
        )
        rows = {r["doc_id"]: r for r in M.ingest_dispatch(df).collect()}
        assert rows[0]["kind"] == "wav-adpcm"
        assert rows[1]["kind"] == "wav"
        _, _, s = M._parse_wav_adpcm(adpcm)
        assert rows[0]["n_units"] == len(s)
        assert rows[0]["value_sum"] == int(s.sum())

    @pytest.mark.parametrize("doc", [5, 8])
    def test_every_prefix_fails_clean(self, doc):
        data = bytes(M.synth_wav_adpcm_bytes(doc))
        for cut in range(len(data)):
            try:
                M._parse_wav_adpcm(data[:cut])
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"prefix {cut} leaked {type(exc).__name__}: {exc}"
                ) from exc

    @pytest.mark.parametrize("doc", [5, 8])
    def test_every_bit_flip_fails_clean_or_decodes(self, doc):
        """ADPCM has no checksum, so most data-region flips decode to
        a DIFFERENT valid signal — the contract is only that nothing
        escapes except ValueError."""
        data = bytes(M.synth_wav_adpcm_bytes(doc))
        for bit in range(0, len(data) * 8, 3):
            blob = bytearray(data)
            blob[bit // 8] ^= 1 << (7 - bit % 8)
            try:
                M._parse_wav_adpcm(bytes(blob))
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"bit {bit} leaked {type(exc).__name__}: {exc}"
                ) from exc


class TestDispatchAllFormatsOnePass:
    def test_ten_formats_in_one_spark_job(self, spark):
        """END-TO-END: one binary column carrying ONE payload of
        every format the dispatcher routes — including the four
        kinds outside the %6 mixed corpus (gif/tiff/bmp/adpcm) —
        decoded in a single mapInPandas pass with per-row kinds and
        checksums all correct."""
        import numpy as np

        makers = [
            ("png", M.synth_png_bytes),
            ("gif", M.synth_gif_bytes),
            ("tiff", M.synth_tiff_bytes),
            ("bmp", M.synth_bmp_bytes),
            ("jpeg", M.synth_jpeg_bytes),
            ("flac", M.synth_flac_bytes),
            ("wav", M.synth_wav_bytes),
            ("wav-adpcm", M.synth_wav_adpcm_bytes),
            ("mp4", M.synth_mp4_bytes),
            ("ppm", M.synth_ppm_bytes),
        ]
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": list(range(len(makers))),
            "payload": [mk(7) for _, mk in makers],
        }))
        rows = {r["doc_id"]: r
                for r in M.ingest_dispatch(df).collect()}
        assert len(rows) == len(makers)
        parsers = {
            "png": M._parse_png, "gif": M._parse_gif,
            "tiff": M._parse_tiff, "bmp": M._parse_bmp,
            "jpeg": M._parse_jpeg, "ppm": M._parse_ppm,
        }
        for i, (kind, mk) in enumerate(makers):
            row = rows[i]
            assert row["kind"] == kind, (kind, row["kind"])
            blob = mk(7)
            if kind in parsers:
                w, h, img = parsers[kind](blob)
                assert (row["width"], row["height"]) == (w, h)
                assert row["value_sum"] == int(img.sum())
            elif kind == "flac":
                _, s = M._parse_flac(blob)
                assert row["value_sum"] == int(s.sum())
            elif kind == "wav-adpcm":
                _, _, s = M._parse_wav_adpcm(blob)
                assert row["n_units"] == len(s)
                assert row["value_sum"] == int(s.sum())
            elif kind == "wav":
                import io
                import wave

                with wave.open(io.BytesIO(blob), "rb") as wv:
                    s = M._pcm_samples(
                        wv.readframes(wv.getnframes()),
                        wv.getsampwidth(),
                    )
                assert row["value_sum"] == int(np.asarray(s).sum())
            else:  # mp4
                meta = M._parse_mp4(blob)
                assert row["n_units"] == meta["n_samples"]


class TestGifAnimatedFuzzSurface:
    """Clean-failure contract for the multi-frame GIF path."""

    @pytest.mark.parametrize("doc", [6, 11])
    def test_every_prefix_fails_clean(self, doc):
        data = bytes(M.synth_gif_animated_bytes(doc))
        for cut in range(len(data)):
            try:
                M._parse_gif(data[:cut])
            except ValueError:
                continue
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"prefix {cut} leaked {type(exc).__name__}: {exc}"
                ) from exc

    @pytest.mark.parametrize("doc", [6, 11])
    def test_every_nth_bit_flip_fails_clean(self, doc):
        data = bytes(M.synth_gif_animated_bytes(doc))
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
