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
