"""Native FITS readers — no astropy, no container-library seam.

The reference delegates every FITS-family read to pyuvdata/astropy
(reference processors.py:70-76,154-198). This module implements the
subset those delegates actually exercise, from the FITS standard
directly (NASA FITS 4.0: 2880-byte blocks of 36 x 80-char ASCII cards;
random-groups primary HDU for interferometer visibilities), so the
`uvfits` and `metafits` formats registered in :mod:`sources` are REAL
readers in this container rather than astropy-gated stubs:

- **metafits** is a header-only primary HDU: parse the card blocks into
  one row per file (typed common keywords + the full card map).
- **uvfits** is a random-groups primary HDU (GROUPS=T, NAXIS1=0):
  GCOUNT groups, each PCOUNT big-endian float32 parameters (UU, VV,
  WW — matched by PREFIX so suffixed AIPS names like 'UU---SIN'
  resolve; BASELINE in the AIPS 256*ant1+ant2 convention, or the
  2048-convention + 65536 offset for >255-antenna arrays, detected
  per group; DATE with the JD epoch carried in PZERO, or split
  across TWO DATE params that SUM after calibration — the real-file
  convention cotter/Birli/pyuvdata write) followed by the data array
  (COMPLEX re/im/weight x STOKES x FREQ, C-order with FITS axis 2
  fastest). Flags ride the weight sign (negative = flagged), the
  AIPS/uvfits convention.

Scale design: `spark.read.format("binaryFile")` lists and distributes
the files across executors; `mapInPandas` runs the numpy parse per
file and emits the long-format visibility schema (SURVEY.md §1.4) —
one task per file, linear in file count, no driver-side loop. MWA
splits an observation into per-coarse-channel files, so per-task
memory is one coarse channel, the same unit the reference's batching
arithmetic targets. The writer is a driver-side fixture/test tool
(small files); a distributed writer would be a foreachPartition sink.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BLOCK = 2880
CARD = 80

#: AIPS stokes codes for linear polarizations (negative per convention)
POL_CODES = {-5: "XX", -6: "YY", -7: "XY", -8: "YX"}
POL_NAMES = {v: k for k, v in POL_CODES.items()}


def _string_end(s: str, start: int) -> int:
    """Index just past the closing quote of a FITS string starting at
    ``start`` (which must point at the opening quote). Doubled quotes
    ('') inside the string are literal-quote escapes per the standard.
    """
    i = start + 1
    while i < len(s):
        if s[i] == "'":
            if i + 1 < len(s) and s[i + 1] == "'":
                i += 2  # escaped literal quote
                continue
            return i + 1
        i += 1
    raise ValueError(f"unterminated FITS string in card: {s!r}")


def _parse_value(raw: str):
    v = raw.strip()
    if v.startswith("'"):
        end = _string_end(v, 0)
        return v[1 : end - 1].replace("''", "'").rstrip()
    if v == "T":
        return True
    if v == "F":
        return False
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    # FITS 4.0 §4.2.4 permits the Fortran 'D' exponent marker for real
    # values (e.g. 1.23D+05, the double-precision form legacy writers
    # emit); Python's float() only accepts 'E', so normalize and retry.
    if "D" in v.upper():
        try:
            return float(v.upper().replace("D", "E", 1))
        except ValueError:
            pass
    return v


def parse_header(buf: bytes, off: int = 0) -> tuple[dict, int]:
    """Parse one FITS header starting at ``off``: 2880-byte blocks of
    80-char cards until the END card. Returns (cards, data_offset)
    where data_offset is the first byte after the header's last block.
    """
    cards: dict = {}
    while off < len(buf):
        block = buf[off : off + BLOCK].decode("ascii", errors="replace")
        off += BLOCK
        for i in range(BLOCK // CARD):
            card = block[i * CARD : (i + 1) * CARD]
            key = card[:8].strip()
            if key == "END":
                return cards, off
            if not key or card[8:10] != "= ":
                continue  # COMMENT / HISTORY / blank / CONTINUE
            body = card[10:]
            # a '/' inside a quoted string is not a comment separator
            stripped = body.lstrip()
            if stripped.startswith("'"):
                val = stripped[: _string_end(stripped, 0)]
            else:
                val = body.split("/")[0]
            cards[key] = _parse_value(val)
    raise ValueError("FITS header missing END card")


def _pad(n: int) -> int:
    return (BLOCK - n % BLOCK) % BLOCK


def _format_card(key: str, val) -> bytes:
    if len(key) > 8:
        raise ValueError(f"FITS keyword too long (max 8): {key!r}")
    if isinstance(val, bool):
        s = f"{key:<8}= {'T' if val else 'F':>20}"
    elif isinstance(val, str):
        s = f"{key:<8}= '{val.replace(chr(39), chr(39) * 2):<8}'"
    elif isinstance(val, int):
        s = f"{key:<8}= {val:>20}"
    else:
        s = f"{key:<8}= {val!r:>20}"
    if len(s) > CARD:
        raise ValueError(
            f"FITS card overflows 80 chars (CONTINUE not supported): "
            f"{key}={val!r}"
        )
    return s.ljust(CARD).encode("ascii")


def write_header(cards: list[tuple[str, object]]) -> bytes:
    out = b"".join(_format_card(k, v) for k, v in cards)
    out += b"END".ljust(CARD)
    return out + b" " * _pad(len(out))


# ---------------------------------------------------------------- uvfits

#: long-format schema the uvfits reader emits (SURVEY.md §1.4 hypercube)
UVFITS_SCHEMA = (
    "file string, time_jd double, ant1 int, ant2 int, chan int, "
    "freq_hz double, pol string, re double, im double, "
    "nsample double, flag boolean, uu double, vv double, ww double"
)


def write_uvfits(pdf: pd.DataFrame, path: str, jd_zero: float) -> None:
    """Write a random-groups uvfits file from long-format rows
    (columns: time_jd, ant1, ant2, chan, pol, freq_hz, re, im,
    nsample, flag, uu, vv, ww). Grids must be dense and uniform (the
    interferometer data model); one group per (time, baseline).
    """
    times = np.sort(pdf["time_jd"].unique())
    chans = np.sort(pdf["chan"].unique())
    freqs = np.sort(pdf["freq_hz"].unique())
    pols = sorted(pdf["pol"].unique(), key=lambda p: -POL_NAMES[p])
    bls = sorted(set(zip(pdf["ant1"], pdf["ant2"])))
    nt, nc, npol, nbl = len(times), len(chans), len(pols), len(bls)
    # Explicit raises (not assert — stripped under python -O): a gapped
    # channel selection would otherwise IndexError or silently scatter
    # values into wrong cube slots via the chan - chans[0] offset.
    if not np.array_equal(chans, np.arange(chans[0], chans[0] + nc)):
        raise ValueError(
            f"uvfits writer requires a dense contiguous channel grid; "
            f"got gapped selection {chans.tolist()[:8]}..."
        )
    if len(freqs) != nc:
        raise ValueError(
            f"channel/frequency grids disagree ({nc} chans, "
            f"{len(freqs)} distinct freqs)"
        )
    if len(freqs) > 1:
        cdelt = freqs[1] - freqs[0]
        if not np.allclose(np.diff(freqs), cdelt):
            raise ValueError("uvfits writer requires a uniform freq grid")
    else:
        cdelt = 1.0

    t_ix = {t: i for i, t in enumerate(times)}
    b_ix = {b: i for i, b in enumerate(bls)}
    p_ix = {p: i for i, p in enumerate(pols)}

    data = np.zeros((nt, nbl, nc, npol, 3), dtype=">f4")
    rows = pdf
    gi = (
        rows["time_jd"].map(t_ix).to_numpy(),
        rows[["ant1", "ant2"]].apply(tuple, axis=1).map(b_ix).to_numpy(),
        rows["chan"].to_numpy() - chans[0],
        rows["pol"].map(p_ix).to_numpy(),
    )
    data[gi[0], gi[1], gi[2], gi[3], 0] = rows["re"].to_numpy()
    data[gi[0], gi[1], gi[2], gi[3], 1] = rows["im"].to_numpy()
    wt = np.where(rows["flag"].to_numpy(), -1.0, 1.0) * rows[
        "nsample"
    ].to_numpy()
    data[gi[0], gi[1], gi[2], gi[3], 2] = wt

    # Params filled per (time, baseline) from the ACTUAL rows (same
    # fancy indexing as the data cube) — uvw varies with time for any
    # tracking observation, so broadcasting one baseline's first-row
    # uvw across all integrations would export wrong coordinates for
    # every time but the first.
    params = np.zeros((nt, nbl, 5), dtype=">f4")
    params[gi[0], gi[1], 0] = rows["uu"].to_numpy()
    params[gi[0], gi[1], 1] = rows["vv"].to_numpy()
    params[gi[0], gi[1], 2] = rows["ww"].to_numpy()
    # Baseline codes: AIPS 256-convention up to 255 antennas; beyond
    # that the 256 encoding silently collides (ant2+1 wraps), so
    # switch to the standard 2048*(a1+1)+(a2+1)+65536 extension (max
    # code ~4.3e6, exact in float32's 24-bit mantissa).
    nant_hi = max(max(a1, a2) for a1, a2 in bls)
    use2048 = nant_hi > 254
    for (a1, a2), bi in b_ix.items():
        if use2048:
            params[:, bi, 3] = 2048 * (a1 + 1) + (a2 + 1) + 65536
        else:
            params[:, bi, 3] = 256 * (a1 + 1) + (a2 + 1)
    for t, ti in t_ix.items():
        params[ti, :, 4] = t - jd_zero  # PZERO5 carries the epoch

    gcount = nt * nbl
    header = write_header(
        [
            ("SIMPLE", True),
            ("BITPIX", -32),
            ("NAXIS", 6),
            ("NAXIS1", 0),  # random-groups signature
            ("NAXIS2", 3),  # COMPLEX: re, im, weight
            ("NAXIS3", npol),
            ("NAXIS4", nc),
            ("NAXIS5", 1),  # degenerate RA
            ("NAXIS6", 1),  # degenerate DEC
            ("EXTEND", True),
            ("GROUPS", True),
            ("PCOUNT", 5),
            ("GCOUNT", gcount),
            ("CTYPE2", "COMPLEX"),
            ("CRVAL2", 1.0),
            ("CRPIX2", 1.0),
            ("CDELT2", 1.0),
            ("CTYPE3", "STOKES"),
            ("CRVAL3", float(POL_NAMES[pols[0]])),
            ("CRPIX3", 1.0),
            ("CDELT3", -1.0),
            ("CTYPE4", "FREQ"),
            ("CRVAL4", float(freqs[0])),
            ("CRPIX4", 1.0),
            ("CDELT4", float(cdelt)),
            ("CTYPE5", "RA"),
            ("CTYPE6", "DEC"),
            ("PTYPE1", "UU"),
            ("PTYPE2", "VV"),
            ("PTYPE3", "WW"),
            ("PTYPE4", "BASELINE"),
            ("PTYPE5", "DATE"),
            ("PZERO5", jd_zero),
        ]
    )
    # interleave params and data per group
    flat = np.concatenate(
        [
            params.reshape(gcount, 5),
            data.reshape(gcount, nc * npol * 3),
        ],
        axis=1,
    ).astype(">f4")
    body = flat.tobytes()
    with open(path, "wb") as f:
        f.write(header)
        f.write(body)
        f.write(b"\x00" * _pad(len(body)))


def _hcard(h: dict, key: str, name: str, cast=int):
    """Required numeric header card with a clean error surface — in a
    100-TB scan a missing or mangled card is FILE corruption and must
    fail the task as ValueError, not leak KeyError/TypeError from the
    arithmetic that consumes it."""
    if key not in h:
        raise ValueError(f"{name}: missing header card {key}")
    try:
        return cast(h[key])
    except (TypeError, ValueError) as exc:
        raise ValueError(
            f"{name}: non-numeric header card {key}"
        ) from exc


def parse_uvfits(name: str, buf: bytes) -> pd.DataFrame:
    """Parse one random-groups uvfits byte string to long-format rows."""
    h, off = parse_header(buf)
    if not (h.get("GROUPS") and h.get("NAXIS1") == 0):
        raise ValueError(f"{name}: not a random-groups uvfits file")
    if _hcard(h, "BITPIX", name) != -32:
        raise ValueError(f"{name}: only BITPIX=-32 supported")
    pcount = _hcard(h, "PCOUNT", name)
    gcount = _hcard(h, "GCOUNT", name)
    axes = [
        _hcard(h, f"NAXIS{i}", name)
        for i in range(2, _hcard(h, "NAXIS", name) + 1)
    ]
    nelem = int(np.prod(axes))
    total = gcount * (pcount + nelem)
    a = np.frombuffer(buf, dtype=">f4", count=total, offset=off).reshape(
        gcount, pcount + nelem
    )
    params = a[:, :pcount].astype("f8")
    # PSCAL/PZERO calibration per param, PTYPE names the slot.
    # Real AIPS-convention files (cotter/Birli, pyuvdata's writer) use
    # suffixed names like 'UU---SIN' and split DATE across TWO params
    # (integer day + day fraction, so float32 holds full JD precision)
    # — so slots resolve by PREFIX against the canonical names, and
    # duplicate slots SUM after calibration (pyuvdata behavior: the
    # two DATE parts add to the full JD).
    names = []
    for i in range(1, pcount + 1):
        names.append(str(h.get(f"PTYPE{i}", f"P{i}")).strip().upper())
        scal = float(h.get(f"PSCAL{i}", 1.0))
        zero = float(h.get(f"PZERO{i}", 0.0))
        params[:, i - 1] = zero + scal * params[:, i - 1]
    canon_prefixes = ("UU", "VV", "WW", "BASELINE", "DATE")
    p: dict = {}
    for i, n in enumerate(names):
        canon = next((c for c in canon_prefixes if n.startswith(c)), n)
        p[canon] = params[:, i] if canon not in p else p[canon] + params[:, i]
    for req in ("BASELINE", "DATE", "UU", "VV", "WW"):
        if req not in p:
            raise ValueError(
                f"{name}: no group parameter matching {req}* "
                f"(PTYPEs present: {names})"
            )

    # FITS axis 2 varies fastest -> C-order is reversed axis list
    npol = _hcard(h, "NAXIS3", name)
    nchan = _hcard(h, "NAXIS4", name)
    data = a[:, pcount:].reshape([gcount] + axes[::-1])
    data = data.reshape(gcount, nchan, npol, 3)  # degenerate RA/DEC drop

    # Baseline decode: the AIPS 256*ant1+ant2 convention caps at 255
    # antennas; larger arrays write 2048*(a1+1)+(a2+1)+65536. Standard
    # heuristic (pyuvdata baseline_to_antnums): codes > 65536 are the
    # 2048 convention — decide per group so the reader handles both.
    bl = np.rint(p["BASELINE"]).astype("i8")
    large = bl > 65536
    blo = np.where(large, bl - 65536, bl)
    div = np.where(large, 2048, 256)
    ant1 = blo // div - 1
    ant2 = blo % div - 1
    pol0 = _hcard(h, "CRVAL3", name)
    pold = _hcard(h, "CDELT3", name)
    try:
        pol_names = [POL_CODES[pol0 + i * pold] for i in range(npol)]
    except KeyError as exc:
        raise ValueError(
            f"{name}: unknown polarization code {exc}"
        ) from exc
    f0 = _hcard(h, "CRVAL4", name, float)
    fd = _hcard(h, "CDELT4", name, float)
    fpix = _hcard(h, "CRPIX4", name, float)
    freqs = f0 + (np.arange(nchan) + 1 - fpix) * fd

    g = np.repeat(np.arange(gcount), nchan * npol)
    c = np.tile(np.repeat(np.arange(nchan), npol), gcount)
    s = np.tile(np.arange(npol), gcount * nchan)
    flat = data.reshape(gcount * nchan * npol, 3).astype("f8")
    wt = flat[:, 2]
    return pd.DataFrame(
        {
            "file": name,
            "time_jd": p["DATE"][g],
            "ant1": ant1[g].astype("i4"),
            "ant2": ant2[g].astype("i4"),
            "chan": c.astype("i4"),
            "freq_hz": freqs[c],
            "pol": np.array(pol_names, dtype=object)[s],
            "re": flat[:, 0],
            "im": flat[:, 1],
            "nsample": np.abs(wt),
            "flag": wt < 0,
            "uu": p["UU"][g],
            "vv": p["VV"][g],
            "ww": p["WW"][g],
        }
    )


def read_uvfits(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed uvfits scan: binaryFile listing + per-file numpy
    parse in mapInPandas — one executor task per file, linear scale-out
    in file count (MWA ships one file per coarse channel)."""
    import os

    files = spark.read.format("binaryFile").load(paths)

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield parse_uvfits(
                    os.path.basename(row["path"]), row["content"]
                )

    return files.select("path", "content").mapInPandas(
        parse, UVFITS_SCHEMA
    )


# --------------------------------------------------------------- metafits

METAFITS_SCHEMA = (
    "file string, obsid long, gpstime long, n_inputs int, n_chans int, "
    "inttime double, freqcent double, cards map<string,string>"
)


def write_metafits(path: str, cards: dict) -> None:
    """Header-only primary HDU (NAXIS=0) — the metafits shape."""
    base: list[tuple[str, object]] = [
        ("SIMPLE", True),
        ("BITPIX", 8),
        ("NAXIS", 0),
        ("EXTEND", True),
    ]
    with open(path, "wb") as f:
        f.write(write_header(base + list(cards.items())))


def parse_metafits(name: str, buf: bytes) -> pd.DataFrame:
    h, _ = parse_header(buf)

    def num(key, cast):
        v = h.get(key)
        return cast(v) if v is not None else None

    return pd.DataFrame(
        [
            {
                "file": name,
                "obsid": num("OBSID", int) or num("GPSTIME", int),
                "gpstime": num("GPSTIME", int),
                "n_inputs": num("NINPUTS", int),
                "n_chans": num("NCHANS", int),
                "inttime": num("INTTIME", float),
                "freqcent": num("FREQCENT", float),
                "cards": {k: str(v) for k, v in h.items()},
            }
        ]
    )


def read_metafits(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Metadata-only scan (S3): the read transfers each file once and
    parses headers executor-side; one row per observation."""
    import os

    files = spark.read.format("binaryFile").load(paths)

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield parse_metafits(
                    os.path.basename(row["path"]), row["content"]
                )

    return files.select("path", "content").mapInPandas(
        parse, METAFITS_SCHEMA
    )


# ---------------------------------------------------------------- gpubox

#: schema for the raw correlator dump reader ('fits' format): one row
#: per (time, baseline, chan, pol) sample, no flags (raw data has none)
GPUBOX_SCHEMA = (
    "file string, time_unix double, time_idx int, ant1 int, ant2 int, "
    "chan int, pol string, re double, im double"
)


def _bl_table(nant: int) -> np.ndarray:
    """Row -> (ant1, ant2) for the ant1 <= ant2 lexicographic baseline
    ordering (autos included)."""
    a1, a2 = np.triu_indices(nant)
    return np.stack([a1, a2], axis=1)


def write_gpubox(
    pdf: pd.DataFrame, path: str, time_unix: dict[int, float]
) -> None:
    """Write a gpubox-style raw correlator FITS dump: header-only
    primary HDU, then one IMAGE extension per integration. Each HDU is
    a (nbl, nchan*npol*2) int32 array ([chan][pol][re, im] fastest),
    BSCALE-scaled so the dyadic visibility values store losslessly as
    integers, with TIME/MILLITIM cards per integration — the layout
    family mwalib handles for the reference (processors.py fits path),
    reduced to its FITS-standard mechanics."""
    chans = np.sort(pdf["chan"].unique())
    pols = sorted(pdf["pol"].unique(), key=lambda p: -POL_NAMES[p])
    nant = int(max(pdf["ant1"].max(), pdf["ant2"].max())) + 1
    bls = _bl_table(nant)
    b_ix = {(a1, a2): i for i, (a1, a2) in enumerate(bls)}
    nbl, nc, npol = len(bls), len(chans), len(pols)
    scale = 0.125  # dyadic fixture grid: value = BSCALE * int

    with open(path, "wb") as f:
        f.write(
            write_header(
                [
                    ("SIMPLE", True),
                    ("BITPIX", 8),
                    ("NAXIS", 0),
                    ("EXTEND", True),
                    ("NANT", nant),
                    ("NPOL", npol),
                    ("POLS", ",".join(pols)),
                    ("NCHAN", nc),
                ]
            )
        )
        for ti, t in enumerate(sorted(time_unix)):
            sub = pdf[pdf["time_idx"] == t]
            data = np.zeros((nbl, nc, npol, 2), dtype=">i4")
            bi = sub[["ant1", "ant2"]].apply(tuple, axis=1).map(b_ix)
            ci = sub["chan"].to_numpy() - chans[0]
            pi = sub["pol"].map({p: i for i, p in enumerate(pols)})
            data[bi, ci, pi, 0] = np.round(
                sub["re"].to_numpy() / scale
            ).astype("i8")
            data[bi, ci, pi, 1] = np.round(
                sub["im"].to_numpy() / scale
            ).astype("i8")
            secs = time_unix[t]
            f.write(
                write_header(
                    [
                        ("XTENSION", "IMAGE"),
                        ("BITPIX", 32),
                        ("NAXIS", 2),
                        ("NAXIS1", nc * npol * 2),
                        ("NAXIS2", nbl),
                        ("PCOUNT", 0),
                        ("GCOUNT", 1),
                        ("BSCALE", scale),
                        ("BZERO", 0.0),
                        ("TIME", int(secs)),
                        ("MILLITIM", int(round((secs % 1) * 1000))),
                    ]
                )
            )
            raw = data.tobytes()
            f.write(raw + b"\x00" * _pad(len(raw)))


def parse_gpubox(name: str, buf: bytes) -> pd.DataFrame:
    """Parse a gpubox-style dump: iterate IMAGE HDUs to EOF, apply
    BSCALE/BZERO, decode the triangular baseline ordering."""
    prim, off = parse_header(buf)
    nant = _hcard(prim, "NANT", name)
    npol = _hcard(prim, "NPOL", name)
    nc = _hcard(prim, "NCHAN", name)
    if "POLS" not in prim:
        raise ValueError(f"{name}: missing header card POLS")
    pols = np.array(str(prim["POLS"]).split(","), dtype=object)
    if len(pols) != npol:
        raise ValueError(
            f"{name}: POLS lists {len(pols)} names but NPOL={npol}"
        )
    bls = _bl_table(nant)
    nbl = len(bls)
    frames = []
    ti = 0
    while off < len(buf):
        h, off = parse_header(buf, off)
        if str(h.get("XTENSION", "")).strip() != "IMAGE":
            raise ValueError(f"{name}: unexpected extension at HDU {ti + 1}")
        if _hcard(h, "BITPIX", name) != 32:
            raise ValueError(f"{name}: only BITPIX=32 gpubox supported")
        n1 = _hcard(h, "NAXIS1", name)
        n2 = _hcard(h, "NAXIS2", name)
        count = n1 * n2
        data = np.frombuffer(buf, dtype=">i4", count=count, offset=off)
        off += count * 4 + _pad(count * 4)
        phys = float(h.get("BZERO", 0.0)) + float(
            h.get("BSCALE", 1.0)
        ) * data.astype("f8")
        phys = phys.reshape(nbl, nc, npol, 2)
        t = float(h.get("TIME", 0)) + float(h.get("MILLITIM", 0)) / 1000.0
        b = np.repeat(np.arange(nbl), nc * npol)
        c = np.tile(np.repeat(np.arange(nc), npol), nbl)
        s = np.tile(np.arange(npol), nbl * nc)
        flat = phys.reshape(nbl * nc * npol, 2)
        frames.append(
            pd.DataFrame(
                {
                    "file": name,
                    "time_unix": t,
                    "time_idx": ti,
                    "ant1": bls[b, 0].astype("i4"),
                    "ant2": bls[b, 1].astype("i4"),
                    "chan": c.astype("i4"),
                    "pol": pols[s],
                    "re": flat[:, 0],
                    "im": flat[:, 1],
                }
            )
        )
        ti += 1
    return pd.concat(frames, ignore_index=True)


def read_gpubox(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed gpubox scan: binaryFile + per-file numpy parse."""
    import os

    files = spark.read.format("binaryFile").load(paths)

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield parse_gpubox(
                    os.path.basename(row["path"]), row["content"]
                )

    return files.select("path", "content").mapInPandas(
        parse, GPUBOX_SCHEMA
    )
