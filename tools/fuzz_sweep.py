"""One-command reproduction of the codec family's clean-failure
contract: for every (synthesizer, parser) pair the repo ships, feed
EVERY PREFIX of a valid payload and EVERY BIT FLIP of it through the
parser and assert that nothing escapes except ValueError (a flip that
still decodes is fine — formats without checksums legally decode
corrupted payloads to different values; the contract is only that
corrupt objects surface as clean per-task errors, never as crashes,
hangs, or giant allocations).

Per-round SCALE.md entries have recorded these sweeps as development
evidence since round 11; this tool makes the claim reproducible in
one command instead of ad-hoc snippets.

Beyond prefixes and single-bit flips, ``--random=N`` adds N seeded
multi-error corruptions per doc (random.Random(doc*1000003+i): 2-16
byte overwrites at random offsets, plus truncate-and-extend shapes) —
the corruption class single-bit flips cannot reach (e.g. a length
field AND its payload corrupted together).

Usage:
    python tools/fuzz_sweep.py                # every pair, 2 docs, all bits
    python tools/fuzz_sweep.py --stride=7     # every 7th bit (quick)
    python tools/fuzz_sweep.py --docs=5 gif adpcm
    python tools/fuzz_sweep.py --random=500   # + seeded multi-error cases
Prints one JSON line: {"pairs": N, "parses": M, "leaks": [...]}.
"""

from __future__ import annotations

import io
import json
import sys
import time
import wave
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mwa_uvdata_pipeline_spark.operators import multimodal as M  # noqa: E402


def _wav_stdlib(data: bytes):
    """The dispatcher's PCM path: stdlib wave with the family's
    error wrap."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            return M._pcm_samples(
                w.readframes(w.getnframes()), w.getsampwidth()
            )
    except (wave.Error, EOFError, RuntimeError) as exc:
        raise ValueError("corrupt WAV payload") from exc


def _dispatch_one(data: bytes):
    """Pure-Python mirror of ingest_dispatch's per-payload routing
    (sniff -> fmt-tag triage -> parser), so the mixed corpus fuzzes
    the REAL end-to-end path without a Spark session per flip."""
    kind = M.sniff_payload_kind(data)
    if kind == "wav":
        tag = M._riff_fmt_tag(data)
        if tag == 0x11:
            return M._parse_wav_adpcm(data)
        if tag in (0x06, 0x07):
            return M._parse_wav_g711(data)
        return _wav_stdlib(data)
    return {
        "png": M._parse_png,
        "gif": M._parse_gif,
        "tiff": M._parse_tiff,
        "bmp": M._parse_bmp,
        "jpeg": M._parse_jpeg,
        "flac": M._parse_flac,
        "ppm": M._parse_ppm,
        "mp4": M._parse_mp4,
        "webp": M._parse_webp,
    }[kind](data)


#: name -> (synthesizer, parser). Parsers are the same entry points
#: the registered operators and the dispatcher call.
PAIRS = {
    "wav": (M.synth_wav_bytes, _wav_stdlib),
    "wav_adpcm": (M.synth_wav_adpcm_bytes, M._parse_wav_adpcm),
    "wav_g711": (M.synth_wav_g711_bytes, M._parse_wav_g711),
    "flac": (M.synth_flac_bytes, M._parse_flac),
    "flac_stereo": (M.synth_flac_stereo_bytes, M._parse_flac),
    "flac_multi": (M.synth_flac_multichannel_bytes, M._parse_flac_multi),
    "flac_wasted": (M.synth_flac_wasted_bytes, M._parse_flac),
    "ppm": (M.synth_ppm_bytes, M._parse_ppm),
    "png": (M.synth_png_bytes, M._parse_png),
    "png_adam7": (M.synth_png_adam7_bytes, M._parse_png),
    "png_types": (M.synth_png_types_bytes, M._parse_png),
    "gif": (M.synth_gif_bytes, M._parse_gif),
    "gif_animated": (M.synth_gif_animated_bytes, M._parse_gif),
    "tiff": (M.synth_tiff_bytes, M._parse_tiff),
    "bmp": (M.synth_bmp_bytes, M._parse_bmp),
    "jpeg": (M.synth_jpeg_bytes, M._parse_jpeg),
    "jpeg_rst": (M.synth_jpeg_rst_bytes, M._parse_jpeg),
    "jpeg_color": (M.synth_jpeg_color_bytes, M._parse_jpeg),
    "jpeg_422": (M.synth_jpeg_422_bytes, M._parse_jpeg),
    "jpeg_progressive": (M.synth_jpeg_progressive_bytes, M._parse_jpeg),
    "mp4": (M.synth_mp4_bytes, M._parse_mp4),
    "mjpeg_mp4": (M.synth_mjpeg_mp4_bytes, M._parse_mp4),
    "webp": (M.synth_webp_bytes, M._parse_webp),
    "webp_palette": (M.synth_webp_palette_bytes, M._parse_webp),
    "dispatch_mixed": (M.synth_mixed_bytes, _dispatch_one),
}


def _sweep_random(parse, data: bytes, n: int,
                  doc: int) -> tuple[int, list[str]]:
    """Seeded multi-error corruption: deterministic (no wall-clock
    randomness), reproducible from (doc, i) alone."""
    import random

    parses = 0
    leaks: list[str] = []
    for i in range(n):
        rng = random.Random(doc * 1000003 + i)
        blob = bytearray(data)
        shape = rng.randrange(3)
        if shape == 0 and len(blob) > 1:  # k random byte overwrites
            for _ in range(rng.randint(2, 16)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        elif shape == 1 and len(blob) > 4:  # truncate + garbage tail
            blob = blob[: rng.randrange(4, len(blob))]
            blob += bytes(
                rng.randrange(256) for _ in range(rng.randint(0, 24))
            )
        else:  # splice a window from elsewhere in the same payload
            if len(blob) > 8:
                k = rng.randint(2, min(12, len(blob) - 1))
                src = rng.randrange(len(blob) - k)
                dst = rng.randrange(len(blob) - k)
                blob[dst:dst + k] = blob[src:src + k]
        parses += 1
        try:
            parse(bytes(blob))
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001
            leaks.append(f"rand {i}: {type(exc).__name__}: {exc}")
    return parses, leaks


def _sweep(parse, data: bytes, stride: int) -> tuple[int, list[str]]:
    parses = 0
    leaks: list[str] = []
    for cut in range(len(data)):
        parses += 1
        try:
            parse(data[:cut])
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001
            leaks.append(f"prefix {cut}: {type(exc).__name__}: {exc}")
    for bit in range(0, len(data) * 8, stride):
        blob = bytearray(data)
        blob[bit // 8] ^= 1 << (7 - bit % 8)
        parses += 1
        try:
            parse(bytes(blob))
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001
            leaks.append(f"bit {bit}: {type(exc).__name__}: {exc}")
    return parses, leaks


def main() -> int:
    stride, docs, n_random = 1, 2, 0
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--stride"):
            stride = int(a.split("=", 1)[1])
        elif a.startswith("--docs"):
            docs = int(a.split("=", 1)[1])
        elif a.startswith("--random"):
            n_random = int(a.split("=", 1)[1])
        else:
            names.append(a)
    pairs = {
        k: v for k, v in PAIRS.items()
        if not names or any(n in k for n in names)
    }
    total = 0
    all_leaks: list[str] = []
    t0 = time.time()
    for name, (synth, parse) in sorted(pairs.items()):
        t1 = time.time()
        parses = 0
        if name == "dispatch_mixed":
            # synth_mixed_bytes picks the container by doc_id % 6 —
            # sweep one doc of EVERY residue so all six magics fuzz
            # through the routing, regardless of the --docs setting
            doc_ids = range(max(docs, 6))
        else:
            # spread docs so formats with doc_id-dependent shape
            # (interlace, compression cycling) hit both arms
            doc_ids = [5 + i * 7 for i in range(docs)]
        for doc in doc_ids:
            blob = bytes(synth(doc))
            p, leaks = _sweep(parse, blob, stride)
            parses += p
            all_leaks.extend(f"{name}: {x}" for x in leaks)
            if n_random:
                p, leaks = _sweep_random(parse, blob, n_random, doc)
                parses += p
                all_leaks.extend(f"{name}: {x}" for x in leaks)
        total += parses
        print(
            f"{name}: {parses} parses in {time.time() - t1:.1f}s"
            + (" LEAKS!" if any(x.startswith(name + ":")
                                for x in all_leaks) else ""),
            file=sys.stderr,
        )
    print(json.dumps({
        "pairs": len(pairs), "docs_per_pair": docs, "stride": stride,
        "parses": total, "seconds": round(time.time() - t0, 1),
        "leaks": all_leaks[:20],
    }))
    return 1 if all_leaks else 0


if __name__ == "__main__":
    raise SystemExit(main())
