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
