"""Round-11 failure-surface contract for the NATIVE radio readers
(uvfits / gpubox / metafits in sources_fits.py, UVH5/HDF5 in
sources_hdf5.py): corrupt or truncated objects must fail their Spark
task with ValueError — never leak KeyError / struct.error /
TypeError / OverflowError / zlib.error from header or structure
parsing. Exhaustive per-bit sweeps ran during development; the
committed tests sample for speed."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from mwa_uvdata_pipeline_spark import sources_fits as sf
from mwa_uvdata_pipeline_spark import sources_hdf5 as sh


def _vis_raw():
    return pq.read_table("fixtures/visibilities.parquet").to_pandas()


@pytest.fixture(scope="module")
def uvfits_bytes(tmp_path_factory):
    raw = _vis_raw()
    pdf = pd.DataFrame(
        {
            "time_jd": raw["time_jd"], "ant1": raw["ant1"],
            "ant2": raw["ant2"], "chan": raw["chan"], "pol": raw["pol"],
            "freq_hz": raw["freq_hz"],
            "re": raw["vis"].map(lambda v: v["re"]),
            "im": raw["vis"].map(lambda v: v["im"]),
            "nsample": raw["nsample"].astype("f8"), "flag": raw["flag"],
            "uu": 0.25 * raw["ant1"], "vv": 0.5 * raw["ant2"],
            "ww": 0.125 * (raw["ant1"] + raw["ant2"]),
        }
    )
    p = str(tmp_path_factory.mktemp("r11") / "o.uvfits")
    sf.write_uvfits(pdf, p, jd_zero=2460000.0)
    with open(p, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def gpubox_bytes(tmp_path_factory):
    raw = _vis_raw()
    src = pd.DataFrame(
        {
            "time_idx": raw["time_idx"], "ant1": raw["ant1"],
            "ant2": raw["ant2"], "chan": raw["chan"], "pol": raw["pol"],
            "re": raw["vis"].map(lambda v: v["re"]),
            "im": raw["vis"].map(lambda v: v["im"]),
        }
    )
    tu = {int(i): 1.7e9 + 2.0 * int(i) for i in src["time_idx"].unique()}
    p = str(tmp_path_factory.mktemp("r11") / "g.fits")
    sf.write_gpubox(src, p, tu)
    with open(p, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def uvh5_bytes(tmp_path_factory, uvfits_bytes):
    raw = _vis_raw()
    pdf = pd.DataFrame(
        {
            "time_jd": raw["time_jd"], "ant1": raw["ant1"],
            "ant2": raw["ant2"], "chan": raw["chan"], "pol": raw["pol"],
            "freq_hz": raw["freq_hz"],
            "re": raw["vis"].map(lambda v: v["re"]),
            "im": raw["vis"].map(lambda v: v["im"]),
            "nsample": raw["nsample"].astype("f8"), "flag": raw["flag"],
            "uu": 0.25 * raw["ant1"], "vv": 0.5 * raw["ant2"],
            "ww": 0.125 * (raw["ant1"] + raw["ant2"]),
        }
    )
    p = str(tmp_path_factory.mktemp("r11") / "o.uvh5")
    sh.write_uvh5(pdf, p)
    with open(p, "rb") as f:
        return f.read()


def _sweep(parse, data, dense_bytes, step_bits):
    """Bit flips (dense over headers, sampled over data) plus
    truncation prefixes: anything but a successful parse must be
    ValueError."""
    bits = list(range(0, dense_bytes * 8, 4)) + list(
        range(dense_bytes * 8, len(data) * 8, step_bits)
    )
    for bit in bits:
        blob = bytearray(data)
        blob[bit // 8] ^= 1 << (7 - bit % 8)
        try:
            parse(bytes(blob))
        except ValueError:
            continue
        except Exception as exc:  # noqa: BLE001 - the assertion
            raise AssertionError(
                f"bit {bit} leaked {type(exc).__name__}: {exc}"
            ) from exc
    for cut in range(0, len(data), max(1, len(data) // 120)):
        try:
            parse(data[:cut])
        except ValueError:
            continue
        except Exception as exc:  # noqa: BLE001 - the assertion
            raise AssertionError(
                f"prefix {cut} leaked {type(exc).__name__}: {exc}"
            ) from exc


def test_uvfits_corruption_surface(uvfits_bytes):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # NaN casts from corrupt data
        _sweep(
            lambda b: sf.parse_uvfits("o.uvfits", b), uvfits_bytes,
            dense_bytes=3 * 2880, step_bits=max(1, len(uvfits_bytes) // 150),
        )


def test_gpubox_corruption_surface(gpubox_bytes):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _sweep(
            lambda b: sf.parse_gpubox("g.fits", b), gpubox_bytes,
            dense_bytes=2880, step_bits=max(1, len(gpubox_bytes) // 150),
        )


def test_uvh5_corruption_surface(uvh5_bytes):
    _sweep(
        lambda b: sh.parse_uvh5("o.uvh5", b), uvh5_bytes,
        dense_bytes=4096, step_bits=max(1, len(uvh5_bytes) // 150),
    )


def test_metafits_corruption_surface(tmp_path):
    p = str(tmp_path / "m.metafits")
    sf.write_metafits(
        p, {"OBSID": 1234567890, "GPSTIME": 1234567890,
            "NINPUTS": 256, "NCHANS": 768, "INTTIME": 2.0,
            "FREQCENT": 154.24},
    )
    with open(p, "rb") as f:
        data = f.read()
    _sweep(
        lambda b: sf.parse_metafits("m", b), data,
        dense_bytes=min(len(data), 2880), step_bits=8,
    )
