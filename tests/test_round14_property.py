"""Property tests for the round-14 surfaces: ARBITRARY content (not
the formula-bound corpus) through encode → decode — IMA ADPCM blocks
with random headers and nibble streams against a naive pure-Python
reference recurrence (mono and stereo, random block counts, random
fact truncation), and animated GIFs with random frame stacks /
disposal methods / transparency against a naive frame-by-frame
compositor."""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mwa_uvdata_pipeline_spark.operators.multimodal import (
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    _gif_interlace_rows,
    _gif_lzw_encode,
    _ima_step,
    _parse_gif,
    _parse_wav_adpcm,
)


def _naive_ima(pred: int, idx: int, nibbles):
    """IMA recurrence re-written independently of _ima_step with //
    division instead of shifts. NOTE: the often-quoted closed form
    ((2*mag + 1) * step) >> 3 is NOT bit-identical to the spec's
    shift-accumulate form — each term truncates separately (step 7,
    nibble 1: 0 + 1 = 1 vs 21 >> 3 = 2); the spec, every real
    decoder, and the SQL oracle all use per-term truncation. This
    reference pins the container mapping (block layout, channel
    interleave, fact truncation) plus a truncation-faithful
    transcription of the scalar step."""
    out = [pred]
    for nib in nibbles:
        step = _IMA_STEP_TABLE[idx]
        diff = (
            step // 8
            + (step // 4 if nib & 1 else 0)
            + (step // 2 if nib & 2 else 0)
            + (step if nib & 4 else 0)
        )
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
        out.append(pred)
    return out


def _build_adpcm(nch: int, balign: int, blocks, total: int) -> bytes:
    """Assemble an IMA ADPCM WAV from explicit per-block
    (per-channel headers, per-channel nibble lists)."""
    spb = (balign - 4 * nch) * 8 // (4 * nch) + 1
    body = bytearray()
    for headers, nibs in blocks:
        for pred0, idx0 in headers:
            body += struct.pack("<hBB", pred0, idx0, 0)
        # channel-alternating 4-byte words, low nibble first
        nword = (spb - 1) // 8
        for wi in range(nword):
            for c in range(nch):
                chunk = nibs[c][wi * 8 : wi * 8 + 8]
                for k in range(4):
                    body.append(chunk[2 * k] | (chunk[2 * k + 1] << 4))
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, nch, 8000, 8000, balign, 4, 2, spb
    )
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, total)
        + b"data" + struct.pack("<I", len(body)) + bytes(body)
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_adpcm_matches_naive_reference(data):
    nch = data.draw(st.integers(1, 2), label="nch")
    nword = data.draw(st.integers(1, 4), label="words_per_block")
    balign = 4 * nch + nword * 4 * nch
    spb = nword * 8 + 1
    nblocks = data.draw(st.integers(1, 3), label="nblocks")
    blocks = []
    for _ in range(nblocks):
        headers = [
            (data.draw(st.integers(-32768, 32767)),
             data.draw(st.integers(0, 88)))
            for _ in range(nch)
        ]
        nibs = [
            [data.draw(st.integers(0, 15)) for _ in range(nword * 8)]
            for _ in range(nch)
        ]
        blocks.append((headers, nibs))
    total = data.draw(
        st.integers((nblocks - 1) * spb + 1, nblocks * spb),
        label="fact_total",
    )
    rate, got_nch, s = _parse_wav_adpcm(
        _build_adpcm(nch, balign, blocks, total)
    )
    assert (rate, got_nch) == (8000, nch)
    assert len(s) == total * nch
    for c in range(nch):
        exp: list[int] = []
        for headers, nibs in blocks:
            exp.extend(_naive_ima(*headers[c], nibs[c]))
        assert list(s[c::nch]) == exp[:total]


@settings(max_examples=50, deadline=None)
@given(
    pred=st.integers(-32768, 32767),
    idx=st.integers(0, 88),
    nib=st.integers(0, 15),
)
def test_ima_step_properties(pred, idx, nib):
    """Single-step invariants: matches the //-division transcription,
    the index update follows the table, the predictor stays in int16,
    and the sign bit mirrors the magnitude-only step."""
    p1, i1 = _ima_step(pred, idx, nib)
    assert p1 == _naive_ima(pred, idx, [nib])[1]
    assert i1 == max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
    assert -32768 <= p1 <= 32767
    # sign bit mirrors: same magnitude applied downward (up to clamp)
    p_up, _ = _ima_step(0, idx, nib & 7)
    p_dn, _ = _ima_step(0, idx, (nib & 7) | 8)
    assert p_up == -p_dn or 32767 in (p_up, -p_dn)


def _gif_frame_bytes(left, top, fw, fh, indices, lct, interlace,
                     m=3) -> bytes:
    """One image descriptor + optional LCT + LZW data."""
    rows = _gif_interlace_rows(fh) if interlace else range(fh)
    flat = [indices[y][x] for y in rows for x in range(fw)]
    lzw = _gif_lzw_encode(flat, m)
    subs = bytearray([m])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        subs += bytes([len(chunk)]) + chunk
    subs += b"\x00"
    ipacked = (0x40 if interlace else 0) | (
        0x80 | 2 if lct is not None else 0
    )
    out = (
        b"\x2c"
        + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        + fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        + bytes([ipacked])
    )
    if lct is not None:
        out += bytes(v for rgb in lct for v in rgb)
    return out + bytes(subs)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_animated_gif_matches_naive_compositor(data):
    w = data.draw(st.integers(4, 12), label="w")
    h = data.draw(st.integers(4, 12), label="h")
    gct = [
        tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        for _ in range(8)
    ]
    bg = data.draw(st.integers(0, 7), label="bg")
    nframes = data.draw(st.integers(2, 4), label="nframes")

    frames = []
    for fi in range(nframes):
        if fi == 0:
            left = top = 0
            fw, fh = w, h  # opaque full first frame: bg never shows
            t_idx = None
        else:
            fw = data.draw(st.integers(1, w), label=f"fw{fi}")
            fh = data.draw(st.integers(1, h), label=f"fh{fi}")
            left = data.draw(st.integers(0, w - fw), label=f"l{fi}")
            top = data.draw(st.integers(0, h - fh), label=f"t{fi}")
            t_idx = data.draw(
                st.one_of(st.none(), st.integers(0, 7)),
                label=f"tidx{fi}",
            )
        indices = [
            [data.draw(st.integers(0, 7)) for _ in range(fw)]
            for _ in range(fh)
        ]
        use_lct = fi > 0 and data.draw(st.booleans(),
                                       label=f"lct{fi}")
        lct = (
            [tuple(data.draw(st.integers(0, 255)) for _ in range(3))
             for _ in range(8)]
            if use_lct else None
        )
        interlace = data.draw(st.booleans(), label=f"il{fi}")
        disposal = data.draw(st.integers(0, 3), label=f"disp{fi}")
        frames.append(
            (left, top, fw, fh, indices, lct, interlace, disposal,
             t_idx)
        )

    blob = bytearray(
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | 2, bg, 0])
        + bytes(v for rgb in gct for v in rgb)
    )
    for left, top, fw, fh, idxs, lct, il, disp, t_idx in frames:
        packed = (disp << 2) | (1 if t_idx is not None else 0)
        blob += bytes([0x21, 0xF9, 4, packed, 0, 0,
                       t_idx if t_idx is not None else 0, 0])
        blob += _gif_frame_bytes(left, top, fw, fh, idxs, lct, il)
    blob += b"\x3b"

    w2, h2, img = _parse_gif(bytes(blob))
    assert (w2, h2) == (w, h)

    # naive compositor, written frame-at-a-time
    canvas = np.zeros((h, w, 3), dtype="i8")
    garr = np.array(gct, dtype="i8")
    pending = None
    for left, top, fw, fh, idxs, lct, il, disp, t_idx in frames:
        if pending is not None:
            method, (pl, pt, pw_, ph_), saved = pending
            if method == 2:
                canvas[pt : pt + ph_, pl : pl + pw_] = garr[bg]
            else:
                canvas[pt : pt + ph_, pl : pl + pw_] = saved
        pending = None
        table = np.array(lct, dtype="i8") if lct is not None else garr
        saved = canvas[top : top + fh, left : left + fw].copy()
        for y in range(fh):
            for x in range(fw):
                if t_idx is not None and idxs[y][x] == t_idx:
                    continue
                canvas[top + y, left + x] = table[idxs[y][x]]
        if disp in (2, 3):
            pending = (disp, (left, top, fw, fh), saved)
    assert (img == canvas).all()
