"""CI guard over tools/fuzz_sweep.py — the consolidated clean-failure
contract: every (synthesizer, parser) pair, including the pure-Python
mirror of ingest_dispatch's routing (the only fuzz coverage the
sniff→fmt-triage→decode COMPOSITION gets; the per-codec test files
fuzz the parsers individually). Runs at a coarse stride for speed;
the exhaustive stride-1 run is a one-command tool
(`python tools/fuzz_sweep.py`) recorded per round in SCALE.md."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import fuzz_sweep  # noqa: E402


def test_every_pair_fails_clean_at_stride():
    leaks = []
    parses = 0
    for name, (synth, parse) in sorted(fuzz_sweep.PAIRS.items()):
        # dispatch_mixed routes by doc_id % 6 — cover all six magics
        docs = range(6) if name == "dispatch_mixed" else (5, 12)
        for doc in docs:
            p, ls = fuzz_sweep._sweep(parse, bytes(synth(doc)), 17)
            parses += p
            leaks.extend(f"{name}: {x}" for x in ls)
    assert parses > 5000
    assert leaks == [], leaks[:5]


def test_dispatch_mirror_covers_all_ten_formats():
    """The mirror must actually ROUTE (not reject) one valid payload
    of every format the dispatcher claims, adpcm included."""
    import mwa_uvdata_pipeline_spark.operators.multimodal as M

    payloads = {
        "png": M.synth_png_bytes(3),
        "gif": M.synth_gif_bytes(3),
        "tiff": M.synth_tiff_bytes(3),
        "bmp": M.synth_bmp_bytes(3),
        "jpeg": M.synth_jpeg_bytes(3),
        "flac": M.synth_flac_bytes(3),
        "wav": M.synth_wav_bytes(3),
        "wav_adpcm": M.synth_wav_adpcm_bytes(3),
        "mp4": M.synth_mp4_bytes(3),
        "ppm": M.synth_ppm_bytes(3),
        "webp": M.synth_webp_bytes(3),
        "webp_palette": M.synth_webp_palette_bytes(3),
    }
    for name, blob in payloads.items():
        fuzz_sweep._dispatch_one(bytes(blob))  # must not raise


def test_random_multi_error_corruptions_fail_clean():
    """Seeded multi-error corruption (byte overwrites, truncate+
    extend, same-payload splices) — the class single-bit flips can't
    reach. Deterministic: seeds derive from (doc, i) only."""
    leaks = []
    parses = 0
    for name, (synth, parse) in sorted(fuzz_sweep.PAIRS.items()):
        for doc in (5, 12):
            p, ls = fuzz_sweep._sweep_random(
                parse, bytes(synth(doc)), 40, doc
            )
            parses += p
            leaks.extend(f"{name}: {x}" for x in ls)
    assert parses == len(fuzz_sweep.PAIRS) * 2 * 40
    assert leaks == [], leaks[:5]
