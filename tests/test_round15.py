"""Round 15 pins.

ADVICE r14 fix: the bounded PNG inflate (decompressobj capped at
expected+1) must still require end-of-stream — a deflate stream cut
off after yielding all pixel bytes but before its adler32 trailer was
silently accepted at r14 HEAD (zlib only verifies the checksum at
stream end, so truncation also skipped adler32 entirely).
"""

import struct
import zlib

import pytest

from mwa_uvdata_pipeline_spark.operators import multimodal as M


def _chunk(typ, body):
    return (
        struct.pack(">I", len(body)) + typ + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _png_1x1_gray(idat_body):
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat_body)
        + _chunk(b"IEND", b"")
    )


class TestPngTruncatedTrailer:
    def test_trailerless_idat_rejects(self):
        """ADVICE repro: 1x1 PNG whose zlib stream has the 4-byte
        adler32 trailer removed parsed successfully at r14 HEAD; it
        must raise the family's clean ValueError."""
        comp = zlib.compress(bytes(2))  # filter byte + 1 gray px
        # deflate data is complete; only the adler32 trailer is cut
        blob = _png_1x1_gray(comp[:-4])
        with pytest.raises(ValueError, match="truncated PNG IDAT"):
            M._parse_png(blob)

    def test_wrong_adler32_rejects(self):
        """With end-of-stream required, adler32 always runs — a
        corrupted trailer is zlib's 'incorrect data check', surfaced
        as the corrupt-IDAT ValueError."""
        comp = bytearray(zlib.compress(bytes(2)))
        comp[-1] ^= 0xFF
        blob = _png_1x1_gray(bytes(comp))
        with pytest.raises(ValueError, match="corrupt PNG IDAT"):
            M._parse_png(blob)

    def test_intact_stream_still_parses(self):
        blob = _png_1x1_gray(zlib.compress(bytes(2)))
        w, h, px = M._parse_png(blob)
        assert (w, h) == (1, 1)

    def test_synth_corpus_unaffected(self):
        # the synthesized corpus always ships complete streams; the
        # new strictness must not reject any of it
        for doc in (0, 1, 7, 23):
            M._parse_png(M.synth_png_bytes(doc))


# ---------------------------------------------------------------------
# Lossless WebP (VP8L) — round-15 codec. Hand-derived bitstream pins
# below are built with a TEST-LOCAL bit writer (independent of the
# module's _LsbWriter) so the LSB-first stream convention and the
# deflate-style canonical code assignment are pinned against a second
# implementation, not just encode/decode symmetry.

import numpy as np
import struct as _struct


class _W:
    """Independent LSB-first bit packer for hand-built streams."""

    def __init__(self):
        self.bits = []

    def write(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, c, n):  # prefix-code bits, MSB first
        for i in range(n - 1, -1, -1):
            self.bits.append((c >> i) & 1)

    def payload(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _riff(payload):
    chunk = b"VP8L" + _struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return (
        b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    )


class TestVp8lHandVectors:
    def test_simple_code_file_decodes(self):
        """Full hand-built 2x1 file: simple 2-symbol green code,
        single-symbol red/blue/alpha/distance codes (the 8-bit and
        1-bit symbol arms both exercised)."""
        w = _W()
        w.write(0x2F, 8)
        w.write(1, 14)   # width-1
        w.write(0, 14)   # height-1
        w.write(0, 1)    # alpha hint
        w.write(0, 3)    # version
        w.write(0, 1)    # no transforms
        w.write(0, 1)    # no color cache
        w.write(0, 1)    # no meta prefix codes
        # green: simple, two symbols 5 and 200
        w.write(1, 1); w.write(1, 1); w.write(1, 1); w.write(5, 8)
        w.write(200, 8)
        # red 10, blue 20, alpha 255: simple single-symbol, 8-bit arm
        for s in (10, 20, 255):
            w.write(1, 1); w.write(0, 1); w.write(1, 1); w.write(s, 8)
        # distance: single symbol 0 via the 1-bit arm
        w.write(1, 1); w.write(0, 1); w.write(0, 1); w.write(0, 1)
        # pixel data: green code bits only (other codes are 0-bit)
        w.write_code(0, 1)  # symbol 5
        w.write_code(1, 1)  # symbol 200
        ww, hh, img = M._parse_webp(_riff(w.payload()))
        assert (ww, hh) == (2, 1)
        assert img[0, 0].tolist() == [10, 5, 20]
        assert img[0, 1].tolist() == [10, 200, 20]

    def test_normal_code_canonical_order(self):
        """Hand-built NORMAL prefix code (alphabet 256, lengths
        sym5->1, sym9->2, sym200->2) transmitted through the
        code-length code with 17/18 zero runs; pins _VP8L_ORDER, the
        3-bit length fields, RLE extra-bit widths, and canonical
        (shorter-first, symbol-order tiebreak) code assignment."""
        w = _W()
        w.write(0, 1)  # normal form
        # cl lengths: sym17->3, sym18->1, sym1->3, sym2->2, rest 0.
        # ORDER positions: [17,18,0,1,2] -> num_code_lengths = 5
        w.write(1, 4)  # 5 - 4
        for l in (3, 1, 0, 3, 2):
            w.write(l, 3)
        w.write(0, 1)  # no max-symbol arm
        # canonical cl codes: 18:'0', 2:'10', 1:'110', 17:'111'
        w.write_code(0b111, 3); w.write(2, 3)    # 17: 5 zeros
        w.write_code(0b110, 3)                   # literal 1 (sym 5)
        w.write_code(0b111, 3); w.write(0, 3)    # 17: 3 zeros
        w.write_code(0b10, 2)                    # literal 2 (sym 9)
        w.write_code(0, 1); w.write(127, 7)      # 18: 138 zeros
        w.write_code(0, 1); w.write(41, 7)       # 18: 52 zeros
        w.write_code(0b10, 2)                    # literal 2 (sym 200)
        w.write_code(0, 1); w.write(44, 7)       # 18: 55 zeros
        # then three coded symbols: '0'->5, '10'->9, '11'->200
        w.write_code(0b0, 1)
        w.write_code(0b10, 2)
        w.write_code(0b11, 2)
        br = M._LsbBits(w.payload())
        table = M._vp8l_read_code(br, 256)
        assert [M._vp8l_read_sym(br, table) for _ in range(3)] == \
            [5, 9, 200]

    def test_lz_value_mapping(self):
        """Length/distance value scheme pinned at the range edges on
        both directions."""
        for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 4096, 120, 121):
            code, extra, ebits = M._vp8l_lz_code(v)
            w = _W()
            w.write(extra, ebits)
            assert M._vp8l_lz_read(M._LsbBits(w.payload()), code) == v
        assert M._vp8l_lz_code(4096) == (23, 1023, 10)


class TestVp8lRejections:
    def test_pixel_cap_fails_fast(self):
        import time

        w = _W()
        w.write(0x2F, 8)
        w.write(16383, 14)
        w.write(16383, 14)
        w.write(0, 4)
        t0 = time.time()
        with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
            M._parse_webp(_riff(w.payload()))
        assert time.time() - t0 < 0.5

    def test_plane_distance_codes_rejected(self):
        """The documented subset boundary: a backward reference whose
        distance value is <= 120 (the spec's short-range neighborhood
        table, unverifiable offline) must reject cleanly, never
        decode wrong."""
        bw = M._LsbWriter()
        bw.write(0x2F, 8)
        bw.write(3, 14); bw.write(0, 14); bw.write(0, 1); bw.write(0, 3)
        bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        g = M._vp8l_write_code(bw, {0: 3, 256: 1}, 280)
        r = M._vp8l_write_code(bw, {0: 1}, 256)
        b = M._vp8l_write_code(bw, {0: 1}, 256)
        a = M._vp8l_write_code(bw, {255: 1}, 256)
        M._vp8l_write_code(bw, {0: 1}, 40)
        bw.write_code(*g[0])
        bw.write_code(*r[0])
        bw.write_code(*b[0])
        bw.write_code(*a[255])
        bw.write_code(*g[256])  # length code 0 -> length 1, no extras
        # distance code: single-symbol 0 -> value 1 <= 120
        with pytest.raises(ValueError, match="plane distance"):
            M._parse_webp(M._riff_webp(bw.done()))

    def test_meta_prefix_rejected(self):
        w = _W()
        w.write(0x2F, 8)
        w.write(1, 14); w.write(0, 14); w.write(0, 1); w.write(0, 3)
        w.write(0, 1)  # no transforms
        w.write(0, 1)  # no cache
        w.write(1, 1)  # meta prefix codes present
        with pytest.raises(ValueError, match="meta prefix"):
            M._parse_webp(_riff(w.payload()))

    def test_duplicate_transform_rejected(self):
        w = _W()
        w.write(0x2F, 8)
        w.write(1, 14); w.write(0, 14); w.write(0, 1); w.write(0, 3)
        w.write(1, 1); w.write(2, 2)  # subtract-green
        w.write(1, 1); w.write(2, 2)  # ... again
        with pytest.raises(ValueError, match="duplicate VP8L"):
            M._parse_webp(_riff(w.payload()))

    def test_lossy_and_extended_rejected(self):
        for fourcc in (b"VP8 ", b"VP8X"):
            chunk = fourcc + _struct.pack("<I", 10) + bytes(10)
            blob = (
                b"RIFF" + _struct.pack("<I", 4 + len(chunk))
                + b"WEBP" + chunk
            )
            with pytest.raises(ValueError, match="unsupported"):
                M._parse_webp(blob)

    def test_incomplete_prefix_code_rejected(self):
        # lengths {5:1, 9:2} leave a quarter of the code space
        # unassigned — Kraft completeness must be enforced
        with pytest.raises(ValueError, match="not complete"):
            M._vp8l_decode_table([0] * 5 + [1] + [0] * 3 + [2])


class TestVp8lRoundTrip:
    def test_all_variants_bit_exact(self):
        """60 docs cover every (transform x cache x max-symbol x
        content) combination; VP8L is lossless so decode must equal
        the closed-form pixels exactly."""
        for doc in range(60):
            w, h, img = M._parse_webp(M.synth_webp_bytes(doc))
            ew, eh, px = M._webp_pixels(doc)
            exp = np.array(
                [[(p >> 16) & 255, (p >> 8) & 255, p & 255]
                 for p in px]
            ).reshape(eh, ew, 3)
            assert (w, h) == (ew, eh)
            assert (img == exp).all(), doc

    def test_palette_all_bundling_widths(self):
        # doc 0 -> npal 2 (8 px/byte), doc 2 -> npal 4 (4 px/byte),
        # doc 14 -> npal 16 (2 px/byte), doc 15 -> npal 17 (unbundled)
        for doc in range(40):
            w, h, img = M._parse_webp(M.synth_webp_palette_bytes(doc))
            ew, eh, npal, pal, idx = M._webp_palette_pixels(doc)
            exp = np.array(
                [[(pal[k] >> 16) & 255, (pal[k] >> 8) & 255,
                  pal[k] & 255] for k in idx]
            ).reshape(eh, ew, 3)
            assert (w, h) == (ew, eh)
            assert (img == exp).all(), doc

    def test_decoder_paths_actually_taken(self):
        """Coverage is load-bearing: the row-repeat cohort must emit
        LZ77 references and the quantized+cache cohort must emit
        cache HITS (a written-but-never-taken path would pin
        nothing)."""
        saw_ref = saw_cache = False
        for doc in range(60):
            _, _, px = M._webp_pixels(doc)
            cb = 1 + doc % 6 if doc % 3 == 0 else 0
            toks = M._vp8l_lz77(list(px), cb)
            kinds = {t[0] for t in toks}
            if doc % 4 == 2:
                assert "ref" in kinds, doc
                saw_ref = True
            if doc % 4 == 3 and cb:
                assert "cache" in kinds, doc
                saw_cache = True
        assert saw_ref and saw_cache

    def test_decode_media_native_returns_webp_dims(self):
        """Self-review catch: after the sniffer learned RIFF+WEBP,
        _decode_media_native would have fallen through to the audio
        arm and reported (None, None, 1) for an image format — it
        must return real pixel dims."""
        for doc in (1, 4, 9):
            ew, eh, _ = M._webp_pixels(doc)
            assert M._decode_media_native(
                M.synth_webp_bytes(doc)
            ) == (ew, eh, 1)

    def test_sniff_and_dispatch_route_webp(self):
        assert M.sniff_payload_kind(M.synth_webp_bytes(1)) == "webp"
        assert M.sniff_payload_kind(
            M.synth_webp_palette_bytes(1)
        ) == "webp"
        # the WAVE arm is untouched by the new RIFF branch
        assert M.sniff_payload_kind(M.synth_wav_bytes(1)) == "wav"


class TestWebpTranscode:
    def test_chain_matches_closed_form(self):
        """decode -> 2x2 box downscale -> encode_webp_rgb -> decode
        equals the floor-mean of the synthesis formulas exactly, for
        every encoder variant in the corpus."""
        for doc in range(40):
            w, h, img = M._parse_webp(M.synth_webp_bytes(doc))
            w2, h2 = w // 2, h // 2
            blk = img[:2 * h2, :2 * w2].reshape(h2, 2, w2, 2, 3)
            small = blk.sum(axis=(1, 3)) // 4
            packed = [
                int(0xFF000000 | (r << 16) | (g << 8) | b)
                for r, g, b in small.reshape(-1, 3)
            ]
            rw, rh, rimg = M._parse_webp(
                M.encode_webp_rgb(packed, w2, h2)
            )
            assert (rw, rh) == (w2, h2)
            assert (rimg == small).all(), doc

    def test_encode_webp_rgb_arbitrary_content(self):
        """The public encoder entry point is lossless on content with
        no structure at all (every pixel distinct)."""
        px = [
            int(0xFF000000 | ((i * 2654435761) & 0xFFFFFF))
            for i in range(7 * 5)
        ]
        w, h, img = M._parse_webp(M.encode_webp_rgb(px, 7, 5))
        assert (w, h) == (7, 5)
        for i, p in enumerate(px):
            assert img[i // 7, i % 7].tolist() == [
                (p >> 16) & 255, (p >> 8) & 255, p & 255
            ]

    def test_too_small_to_downscale_rejects(self, spark=None):
        # a 1-pixel-tall image cannot survive the 2x2 box filter;
        # the operator surfaces it as the family's clean ValueError
        px = [0xFF000000] * 3
        blob = M.encode_webp_rgb(px, 3, 1)
        w, h, img = M._parse_webp(blob)
        assert (w, h) == (3, 1)
        # the guard itself lives in the mapInPandas body; replicate
        # the arithmetic it guards
        assert h // 2 == 0


class TestG711:
    def test_published_extremes_pinned(self):
        """The ITU curves' well-known anchor values — these pin the
        formulas against independent public knowledge, not just
        encoder/decoder symmetry."""
        assert M._ulaw_decode_byte(0x00) == -32124
        assert M._ulaw_decode_byte(0x80) == 32124
        assert M._ulaw_decode_byte(0xFF) == 0   # mu-law silence
        assert M._ulaw_decode_byte(0x7F) == 0   # "negative zero"
        assert M._alaw_decode_byte(0xAA) == 32256
        assert M._alaw_decode_byte(0x2A) == -32256
        assert M._alaw_decode_byte(0xD5) == 8
        assert M._alaw_decode_byte(0x55) == -8

    def test_sign_conventions_opposite(self):
        # mu-law: sign bit (after complement) set -> negative;
        # A-law: sign bit (after XOR 0x55) set -> POSITIVE
        for b in range(256):
            u = ~b & 0xFF
            assert (M._ulaw_decode_byte(b) <= 0) == bool(u & 0x80) \
                or M._ulaw_decode_byte(b) == 0
            a = b ^ 0x55
            assert (M._alaw_decode_byte(b) >= 0) == bool(a & 0x80)

    def test_tables_match_formula(self):
        assert M._ULAW_TABLE == [
            M._ulaw_decode_byte(b) for b in range(256)
        ]
        assert M._ALAW_TABLE == [
            M._alaw_decode_byte(b) for b in range(256)
        ]

    def test_roundtrip_both_laws_and_channel_counts(self):
        for doc in range(30):
            rate, nch, s = M._parse_wav_g711(
                M.synth_wav_g711_bytes(doc)
            )
            n = 50 + doc % 40
            dec = (M._ulaw_decode_byte if doc % 2 == 0
                   else M._alaw_decode_byte)
            exp = [
                dec((doc * 3 + i * 7 + c * 11) % 256)
                for i in range(n) for c in range(nch)
            ]
            assert rate == 8000
            assert nch == (2 if doc % 3 == 0 else 1)
            assert list(s) == exp, doc

    def test_dispatch_routes_g711_by_fmt_tag(self):
        blob = M.synth_wav_g711_bytes(2)  # mu-law
        assert M.sniff_payload_kind(blob) == "wav"
        assert M._riff_fmt_tag(blob) == 0x0007
        blob = M.synth_wav_g711_bytes(3)  # A-law
        assert M._riff_fmt_tag(blob) == 0x0006
        # PCM and ADPCM routing untouched
        assert M._riff_fmt_tag(M.synth_wav_bytes(1)) == 0x0001
        assert M._riff_fmt_tag(M.synth_wav_adpcm_bytes(1)) == 0x0011

    def test_pcm_tag_rejected_by_g711_parser(self):
        with pytest.raises(ValueError, match="not G.711"):
            M._parse_wav_g711(M.synth_wav_bytes(1))

    def test_fact_truncation_applies(self):
        import struct

        blob = bytearray(M.synth_wav_g711_bytes(4))  # mono mu-law
        at = blob.find(b"fact") + 8
        (n,) = struct.unpack_from("<I", blob, at)
        struct.pack_into("<I", blob, at, n - 5)
        _, _, s = M._parse_wav_g711(bytes(blob))
        assert len(s) == n - 5

    def test_fact_beyond_data_rejects(self):
        import struct

        blob = bytearray(M.synth_wav_g711_bytes(4))
        at = blob.find(b"fact") + 8
        struct.pack_into("<I", blob, at, 10_000)
        with pytest.raises(ValueError, match="fact total exceeds"):
            M._parse_wav_g711(bytes(blob))
