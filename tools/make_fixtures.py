"""Generate the deterministic MWA domain fixtures (FIXTURES.md §B) into
``fixtures/``. Pure numpy/pyarrow — no Spark, no randomness beyond a
fixed integer recurrence, no wall-clock. Safe to re-run: output is
byte-stable.

Signal model (FIXTURES.md §B4, plus a deterministic noise floor so the
z-score match filter has a finite noise scale to threshold against —
the planted anomalies are orders of magnitude above it):

- base sky: re = 10 + ant1 + ant2 (constant in time → diff cancels);
- noise: re += 0.25 * (((7t + 3c + 5a1 + 11a2 + p) % 8) - 3.5)
  (deterministic, zero-mean-ish, |.| <= 0.875);
- narrow RFI: +100 re at chan=5, pol=XX, t in {3,4}, cross baselines;
- streak: +50 re at t=7, all chans, pol=YY, cross baselines;
- occupancy: pre-flag chans 0-9 at t=9 (10/16 = 0.625 > tb_aggro 0.6)
  and chans 0-8 at t=8 (9/16 = 0.5625 < 0.6).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parents[1] / "fixtures"

OBSID = 1234567890
N_TIMES, N_ANTS, N_CHANS = 10, 8, 16
POLS = ["XX", "YY"]
FREQ0_HZ = 138_880_000
FINE_HZ = 10_000
JD0 = 2460000.0


def make_antennas() -> pa.Table:
    """FIXTURES.md B1: 128 tiles, ants 10/20/30/40 flagged."""
    ant = np.arange(128, dtype=np.int32)
    return pa.table(
        {
            "ant": ant,
            "tile_id": (ant + 1000).astype(np.int32),
            "tile_name": pa.array([f"Tile{int(a):03d}" for a in ant]),
            "electrical_length_m": (90.0 + (ant % 16) * 0.5).astype(np.float64),
            "east_m": ((ant % 16) * 10.0 - 75.0).astype(np.float64),
            "north_m": ((ant // 16) * 10.0 - 35.0).astype(np.float64),
            "height_m": np.full(128, 377.0),
            "flagged": pa.array([int(a) in (10, 20, 30, 40) for a in ant]),
            "rec_number": (ant // 8 + 1).astype(np.int32),
            "flavour": pa.array(["RG6_90" if a % 2 == 0 else "LMR400_320" for a in ant]),
            "has_whitening_filter": pa.array([bool(a % 2 == 0) for a in ant]),
            "rec_type": pa.array(["RRI" if a % 4 < 2 else "NI" for a in ant]),
        }
    )


def make_channels() -> pa.Table:
    """FIXTURES.md B2: 24 coarse channels, 1.28 MHz contiguous."""
    g = np.arange(1, 25, dtype=np.int32)
    start = FREQ0_HZ + (g.astype(np.int64) - 1) * 1_280_000
    return pa.table(
        {
            "gpubox_number": g,
            "rec_chan_number": (g + 108).astype(np.int32),
            "chan_start_hz": start,
            "chan_centre_hz": start + 640_000,
            "chan_end_hz": start + 1_280_000,
        }
    )


def make_file_catalog() -> pa.Table:
    """FIXTURES.md B3: 2 obsids x 24 gpubox fits + metafits; both regex
    branches of channel_from_filename; one malformed name (V8), one
    obsid lacking metafits (V3)."""
    rows = []
    for i, obsid in enumerate((OBSID, OBSID + 296)):
        ts = "20130808T100000"
        for g in range(1, 25):
            if i == 0:
                name = f"{obsid}_{ts}_gpubox{g:02d}_00.fits"
            else:
                name = f"{obsid}_{ts}_ch{g + 108:03d}.fits"
            rows.append((str(obsid), f"/data/{obsid}/{name}", "fits", 24_000_000 + g))
        rows.append((str(obsid), f"/data/{obsid}/{obsid}.metafits", "metafits", 80_000))
    # V8 offender: fits file with no channel token
    rows.append((str(OBSID), f"/data/{OBSID}/{OBSID}_nochan.fits", "fits", 1000))
    # V3 offender: obsid with fits but no metafits
    orphan = OBSID + 600
    rows.append((str(orphan), f"/data/{orphan}/{orphan}_20130808T101000_gpubox01_00.fits", "fits", 24_000_000))
    obsid, path, ftype, size = zip(*rows)
    return pa.table(
        {
            "obsid": pa.array(obsid),
            "file_path": pa.array(path),
            "file_type": pa.array(ftype),
            "size_bytes": pa.array(size, type=pa.int64()),
        }
    )


def make_visibilities() -> pa.Table:
    """FIXTURES.md B4 grid with planted anomalies (module docstring)."""
    a1, a2 = np.triu_indices(N_ANTS)  # ant1 <= ant2, autos included: 36 baselines
    n_bl = len(a1)
    t, bl, c, p = np.meshgrid(
        np.arange(N_TIMES), np.arange(n_bl), np.arange(N_CHANS), np.arange(2),
        indexing="ij",
    )
    t, bl, c, p = (x.ravel() for x in (t, bl, c, p))
    ant1, ant2 = a1[bl], a2[bl]
    cross = ant1 != ant2

    re = 10.0 + ant1 + ant2
    re = re + 0.25 * (((7 * t + 3 * c + 5 * ant1 + 11 * ant2 + p) % 8) - 3.5)
    im = np.where(cross, 1.0, 0.0)

    narrow = cross & (c == 5) & (p == 0) & ((t == 3) | (t == 4))
    re = re + np.where(narrow, 100.0, 0.0)
    streak = cross & (t == 7) & (p == 1)
    re = re + np.where(streak, 50.0, 0.0)

    flag = ((t == 9) & (c <= 9)) | ((t == 8) & (c <= 8))

    vis = pa.StructArray.from_arrays(
        [pa.array(re, type=pa.float64()), pa.array(im, type=pa.float64())],
        names=["re", "im"],
    )
    return pa.table(
        {
            "obsid": pa.array(np.full(len(t), OBSID), type=pa.int64()),
            "time_idx": pa.array(t, type=pa.int32()),
            "time_jd": pa.array(JD0 + t * (2.0 / 86400.0), type=pa.float64()),
            "ant1": pa.array(ant1, type=pa.int32()),
            "ant2": pa.array(ant2, type=pa.int32()),
            "chan": pa.array(c, type=pa.int32()),
            "freq_hz": pa.array(FREQ0_HZ + c * float(FINE_HZ), type=pa.float64()),
            "pol": pa.array(np.where(p == 0, "XX", "YY")),
            "vis": vis,
            "flag": pa.array(flag),
            "nsample": pa.array(np.ones(len(t)), type=pa.float32()),
        }
    )


def main() -> None:
    OUT.mkdir(exist_ok=True)
    for name, tbl in {
        "antennas": make_antennas(),
        "channels": make_channels(),
        "file_catalog": make_file_catalog(),
        "visibilities": make_visibilities(),
    }.items():
        pq.write_table(tbl, OUT / f"{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows -> {OUT / f'{name}.parquet'}")


if __name__ == "__main__":
    main()
