"""Native FITS reader tests (sources_fits.py): full-column uvfits
round-trip through the Spark dispatch path, metafits header parsing,
multi-file union, and header-parser edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from mwa_uvdata_pipeline_spark import sources_fits as sf
from mwa_uvdata_pipeline_spark.sources import read_visibilities


def _vis_pdf() -> pd.DataFrame:
    raw = pq.read_table("fixtures/visibilities.parquet").to_pandas()
    return pd.DataFrame(
        {
            "time_jd": raw["time_jd"],
            "ant1": raw["ant1"],
            "ant2": raw["ant2"],
            "chan": raw["chan"],
            "pol": raw["pol"],
            "freq_hz": raw["freq_hz"],
            "re": raw["vis"].map(lambda v: v["re"]),
            "im": raw["vis"].map(lambda v: v["im"]),
            "nsample": raw["nsample"].astype("f8"),
            "flag": raw["flag"],
            "uu": 0.25 * raw["ant1"],
            "vv": 0.5 * raw["ant2"],
            "ww": 0.125 * (raw["ant1"] + raw["ant2"]),
        }
    )


def test_uvfits_roundtrip_via_spark(spark, tmp_path):
    src = _vis_pdf()
    path = str(tmp_path / "obs_1234567890.uvfits")
    sf.write_uvfits(src, path, jd_zero=2460000.0)

    back = (
        read_visibilities(spark, [path])
        .toPandas()
        .sort_values(["time_jd", "ant1", "ant2", "chan", "pol"])
        .reset_index(drop=True)
    )
    assert len(back) == len(src)
    # quantize the source through float32 the way the file stores it;
    # every fixture value is dyadic so the round-trip is bit-exact
    exp = src.copy()
    exp["time_jd"] = 2460000.0 + np.float64(
        np.float32(exp["time_jd"] - 2460000.0)
    )
    for c in ["re", "im", "nsample", "uu", "vv", "ww"]:
        exp[c] = np.float64(np.float32(exp[c]))
    exp = exp.sort_values(["time_jd", "ant1", "ant2", "chan", "pol"]).reset_index(
        drop=True
    )
    for c in ["time_jd", "re", "im", "nsample", "uu", "vv", "ww"]:
        assert (back[c].to_numpy() == exp[c].to_numpy()).all(), c
    for c in ["ant1", "ant2", "chan", "pol", "flag"]:
        assert (back[c].to_numpy() == exp[c].to_numpy()).all(), c
    # freqs rebuild from CRVAL/CDELT in exact double arithmetic
    assert (back["freq_hz"].to_numpy() == exp["freq_hz"].to_numpy()).all()


def test_uvfits_multi_file_union(spark, tmp_path):
    src = _vis_pdf()
    lo = src[src["chan"] < 8]
    hi = src[src["chan"] >= 8]
    p1 = str(tmp_path / "obs_1234567890_ch00.uvfits")
    p2 = str(tmp_path / "obs_1234567890_ch08.uvfits")
    sf.write_uvfits(lo, p1, jd_zero=2460000.0)
    # per-coarse-channel files have their own freq zero point
    hi2 = hi.copy()
    hi2["chan"] = hi2["chan"] - 8
    sf.write_uvfits(hi2, p2, jd_zero=2460000.0)

    vis = read_visibilities(spark, [p1, p2])
    assert vis.count() == len(src)
    # each file parsed independently: two distinct file names
    assert vis.select("file").distinct().count() == 2


def test_metafits_header_reader(spark, tmp_path):
    path = str(tmp_path / "1234567890.metafits")
    sf.write_metafits(
        path,
        {
            "GPSTIME": 1234567890,
            "NINPUTS": 256,
            "NCHANS": 24,
            "INTTIME": 2.0,
            "FREQCENT": 154.24,
            "PROJECT": "G0009",
        },
    )
    rows = sf.read_metafits(spark, [path]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.gpstime == 1234567890
    assert r.n_inputs == 256
    assert r.n_chans == 24
    assert r.inttime == 2.0
    assert r.cards["PROJECT"] == "G0009"
    assert r.cards["SIMPLE"] == "True"


def test_header_parser_edges():
    # quoted string containing '/' must not be cut at the comment char
    hdr = sf.write_header(
        [("SIMPLE", True), ("NAXIS", 0), ("PROJ", "a/b"), ("X", 1.5)]
    )
    cards, off = sf.parse_header(hdr)
    assert cards["PROJ"] == "a/b"
    assert cards["X"] == 1.5
    assert cards["SIMPLE"] is True
    assert off == len(hdr)
    with pytest.raises(ValueError):
        sf.parse_header(b" " * sf.BLOCK)  # no END card


def test_header_fortran_d_exponent():
    # FITS 4.0 §4.2.4: real values may use the Fortran 'D' exponent
    # marker (legacy double-precision writers); Python float() only
    # accepts 'E', so the parser must normalize. A string value that
    # merely contains a 'D' must stay a string.
    card = "OBSFREQ = 1.23D+05".ljust(sf.CARD)
    card += "SCALE   = -4.5d-02".ljust(sf.CARD)
    card += "NAME    = 'D5      '".ljust(sf.CARD)
    card += "END".ljust(sf.CARD)
    hdr = card.encode("ascii")
    hdr += b" " * sf._pad(len(hdr))
    cards, _ = sf.parse_header(hdr)
    assert cards["OBSFREQ"] == 1.23e5
    assert cards["SCALE"] == -4.5e-2
    assert cards["NAME"] == "D5"


def test_uvfits_rejects_non_group_files():
    hdr = sf.write_header(
        [("SIMPLE", True), ("BITPIX", 8), ("NAXIS", 0)]
    )
    with pytest.raises(ValueError):
        sf.parse_uvfits("x.uvfits", hdr)


def test_gpubox_roundtrip_via_spark(spark, tmp_path):
    raw = pq.read_table("fixtures/visibilities.parquet").to_pandas()
    src = pd.DataFrame(
        {
            "time_idx": raw["time_idx"],
            "ant1": raw["ant1"],
            "ant2": raw["ant2"],
            "chan": raw["chan"],
            "pol": raw["pol"],
            "re": raw["vis"].map(lambda v: v["re"]),
            "im": raw["vis"].map(lambda v: v["im"]),
        }
    )
    tu = {int(i): 1.7e9 + 2.0 * int(i) for i in src["time_idx"].unique()}
    path = str(tmp_path / "1234567890_gpubox01_00.fits")
    sf.write_gpubox(src, path, tu)

    back = (
        read_visibilities(spark, [path])
        .toPandas()
        .sort_values(["time_idx", "ant1", "ant2", "chan", "pol"])
        .reset_index(drop=True)
    )
    assert len(back) == len(src)
    exp = src.sort_values(["time_idx", "ant1", "ant2", "chan", "pol"]).reset_index(
        drop=True
    )
    for c in ["time_idx", "ant1", "ant2", "chan", "pol", "re", "im"]:
        assert (back[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (
        back["time_unix"].to_numpy()
        == back["time_idx"].map(lambda i: tu[int(i)]).to_numpy()
    ).all()


def test_gpubox_rejects_wrong_bitpix():
    prim = sf.write_header(
        [("SIMPLE", True), ("BITPIX", 8), ("NAXIS", 0), ("EXTEND", True),
         ("NANT", 2), ("NPOL", 1), ("POLS", "XX"), ("NCHAN", 1)]
    )
    ext = sf.write_header(
        [("XTENSION", "IMAGE"), ("BITPIX", -32), ("NAXIS", 2),
         ("NAXIS1", 2), ("NAXIS2", 3)]
    )
    with pytest.raises(ValueError):
        sf.parse_gpubox("x.fits", prim + ext + b"\x00" * sf.BLOCK)


def test_header_string_escaping_roundtrip():
    # quotes escape by doubling per the FITS standard; '/' never splits
    # inside a string; trailing-pad spaces strip, embedded spaces stay
    cases = ["o'brien", "a/b'c", "''", "x  y", "don't / do"]
    cards = [("SIMPLE", True)] + [(f"K{i}", v) for i, v in enumerate(cases)]
    parsed, _ = sf.parse_header(sf.write_header(cards))
    for i, v in enumerate(cases):
        assert parsed[f"K{i}"] == v.rstrip(), v


def test_header_writer_limits():
    with pytest.raises(ValueError, match="keyword too long"):
        sf.write_header([("TOOLONGKEY", 1)])
    with pytest.raises(ValueError, match="overflows 80"):
        sf.write_header([("K", "x" * 100)])


def test_header_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    printable = st.text(
        alphabet=st.characters(
            min_codepoint=32, max_codepoint=126, exclude_characters=""
        ),
        max_size=30,
    )
    values = st.one_of(
        st.booleans(),
        st.integers(min_value=-(10**15), max_value=10**15),
        printable,
    )

    @settings(max_examples=200, deadline=None)
    @given(values)
    def roundtrip(v):
        parsed, _ = sf.parse_header(
            sf.write_header([("SIMPLE", True), ("V", v)])
        )
        expected = v.rstrip() if isinstance(v, str) else v
        # empty / whitespace-only strings parse back as '' and integer
        # strings like '7' stay strings because of the quotes
        assert parsed["V"] == expected

    roundtrip()


def test_uvfits_grouped_sink_roundtrip(spark, tmp_path):
    from mwa_uvdata_pipeline_spark.sinks import write_uvfits_grouped

    src = _vis_pdf()
    src["obsid"] = 1234567890
    vis = spark.createDataFrame(src)
    out = str(tmp_path / "export")
    manifest = write_uvfits_grouped(vis, out).collect()
    assert len(manifest) == 1
    m = manifest[0]
    assert m.group == 1234567890
    assert m.n_rows == len(src)
    assert m.n_bytes > 0

    # the exported file reads back through the registry reader with
    # every value intact (dyadic grid -> float32 lossless)
    back = read_visibilities(spark, [m.path])
    assert back.count() == len(src)
    import pyspark.sql.functions as F

    got = back.agg(
        F.sum(F.round(F.col("re") * 8).cast("long")).alias("s")
    ).collect()[0].s
    exp = int(round(src["re"].sum() * 8))
    assert got == exp


def test_uvfits_time_varying_uvw_roundtrip(tmp_path):
    """uvw varies with time for any tracking observation; the writer
    must fill params per (time, baseline) from the actual rows, not
    broadcast the first integration's uvw (ADVICE r5)."""
    src = _vis_pdf()
    t_ix = {t: i for i, t in enumerate(np.sort(src["time_jd"].unique()))}
    drift = src["time_jd"].map(t_ix).to_numpy().astype("f8")
    src["uu"] = 0.25 * src["ant1"].to_numpy() + 0.0625 * drift
    src["vv"] = 0.5 * src["ant2"].to_numpy() - 0.125 * drift
    src["ww"] = 0.125 * (src["ant1"] + src["ant2"]).to_numpy() + 0.5 * drift
    path = str(tmp_path / "drift.uvfits")
    sf.write_uvfits(src, path, jd_zero=2460000.0)
    with open(path, "rb") as f:
        back = sf.parse_uvfits("drift.uvfits", f.read())
    key = ["time_jd", "ant1", "ant2", "chan", "pol"]
    exp = src.copy()
    exp["time_jd"] = 2460000.0 + np.float64(
        np.float32(exp["time_jd"] - 2460000.0)
    )
    exp = exp.sort_values(key).reset_index(drop=True)
    got = back.sort_values(key).reset_index(drop=True)
    for c in ["uu", "vv", "ww"]:
        assert (
            got[c].to_numpy() == np.float64(np.float32(exp[c]))
        ).all(), c


def test_uvfits_two_part_date_and_suffixed_ptypes():
    """Real AIPS files (cotter/Birli, pyuvdata) use suffixed PTYPE
    names ('UU---SIN') and split DATE across two params (day +
    fraction). The reader must prefix-match names and SUM duplicate
    DATE slots after PSCAL/PZERO calibration (ADVICE r5)."""
    jd_day, jd_frac = 2460123.0, 0.25
    header = sf.write_header(
        [
            ("SIMPLE", True),
            ("BITPIX", -32),
            ("NAXIS", 6),
            ("NAXIS1", 0),
            ("NAXIS2", 3),
            ("NAXIS3", 1),
            ("NAXIS4", 1),
            ("NAXIS5", 1),
            ("NAXIS6", 1),
            ("GROUPS", True),
            ("PCOUNT", 6),
            ("GCOUNT", 1),
            ("CTYPE2", "COMPLEX"),
            ("CTYPE3", "STOKES"),
            ("CRVAL3", -5.0),
            ("CRPIX3", 1.0),
            ("CDELT3", -1.0),
            ("CTYPE4", "FREQ"),
            ("CRVAL4", 150e6),
            ("CRPIX4", 1.0),
            ("CDELT4", 40e3),
            ("PTYPE1", "UU---SIN"),
            ("PTYPE2", "VV---SIN"),
            ("PTYPE3", "WW---SIN"),
            ("PTYPE4", "BASELINE"),
            ("PTYPE5", "DATE"),
            ("PZERO5", 2460000.0),  # day part: PZERO carries epoch
            ("PTYPE6", "DATE"),  # fraction part
        ]
    )
    params = np.array(
        [[1.5, -2.5, 0.5, 256 * 2 + 3, jd_day - 2460000.0, jd_frac]],
        dtype=">f4",
    )
    data = np.array([[4.0, -1.0, 2.0]], dtype=">f4")  # re, im, weight
    buf = header + params.tobytes() + data.tobytes()
    buf += b"\x00" * sf._pad(len(params.tobytes()) + len(data.tobytes()))
    out = sf.parse_uvfits("aips.uvfits", buf)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["time_jd"] == jd_day + jd_frac  # both DATE parts summed
    assert (r["uu"], r["vv"], r["ww"]) == (1.5, -2.5, 0.5)  # suffix match
    assert (r["ant1"], r["ant2"]) == (1, 2)
    assert (r["re"], r["im"], r["nsample"]) == (4.0, -1.0, 2.0)
    assert not r["flag"]


def test_uvfits_2048_baseline_convention_roundtrip(tmp_path):
    """Arrays with >255 antennas can't use the 256 convention (codes
    collide); writer switches to 2048*(a1+1)+(a2+1)+65536 and the
    reader auto-detects it from bl > 65536 (ADVICE r5)."""
    rows = []
    for t in (2460000.125, 2460000.25):
        for a1, a2 in ((0, 300), (10, 260), (299, 2000)):
            rows.append(
                {
                    "time_jd": t,
                    "ant1": a1,
                    "ant2": a2,
                    "chan": 0,
                    "pol": "XX",
                    "freq_hz": 150e6,
                    "re": 1.0 + a1,
                    "im": -0.5 * a2,
                    "nsample": 2.0,
                    "flag": False,
                    "uu": 0.25 * a1,
                    "vv": 0.5 * a2,
                    "ww": 0.125,
                }
            )
    src = pd.DataFrame(rows)
    path = str(tmp_path / "big_array.uvfits")
    sf.write_uvfits(src, path, jd_zero=2460000.0)
    with open(path, "rb") as f:
        back = sf.parse_uvfits("big_array.uvfits", f.read())
    key = ["time_jd", "ant1", "ant2"]
    got = back.sort_values(key).reset_index(drop=True)
    exp = src.sort_values(key).reset_index(drop=True)
    assert (got["ant1"].to_numpy() == exp["ant1"].to_numpy()).all()
    assert (got["ant2"].to_numpy() == exp["ant2"].to_numpy()).all()
    assert (got["re"].to_numpy() == exp["re"].to_numpy()).all()


def test_uvfits_writer_rejects_gapped_grids(tmp_path):
    """Gapped channel selections and non-uniform freq grids must raise
    explicitly (not assert, not silent mis-scatter) (ADVICE r5)."""
    src = _vis_pdf()
    gapped = src[src["chan"] != 5]
    with pytest.raises(ValueError, match="contiguous channel grid"):
        sf.write_uvfits(gapped, str(tmp_path / "gap.uvfits"), 2460000.0)
    warped = src.copy()
    warped["freq_hz"] = np.where(
        warped["chan"] == 3, warped["freq_hz"] + 1000.0, warped["freq_hz"]
    )
    with pytest.raises(ValueError):
        sf.write_uvfits(warped, str(tmp_path / "warp.uvfits"), 2460000.0)
