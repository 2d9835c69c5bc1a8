"""Property tests for the round-15 VP8L codec: ARBITRARY content (not
the formula-bound corpus) through encode → decode at two levels — the
core entropy-coded-image writer/reader pair under random cache and
max-symbol settings, and full RIFF files with random transform chains
— plus algebraic pins on the prefix-code machinery (package-merge
Kraft equality and limit, canonical prefix-freedom, the LZ77 value
mapping as an exhaustive bijection)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from mwa_uvdata_pipeline_spark.operators import multimodal as M


def _rand_pixels(draw, max_side=9, colors=None):
    w = draw(st.integers(1, max_side))
    h = draw(st.integers(1, max_side))
    if colors:
        pal = draw(
            st.lists(
                st.integers(0, 0xFFFFFFFF),
                min_size=1, max_size=colors, unique=True,
            )
        )
        px = [
            pal[draw(st.integers(0, len(pal) - 1))]
            for _ in range(w * h)
        ]
    else:
        px = [
            draw(st.integers(0, 0xFFFFFFFF)) for _ in range(w * h)
        ]
    return w, h, px


@st.composite
def _image_case(draw):
    # low-cardinality palettes make LZ77 matches and cache hits
    # frequent; full-range pixels stress wide literal alphabets
    colors = draw(st.sampled_from([None, 2, 3, 6]))
    w, h, px = _rand_pixels(draw, colors=colors)
    cache_bits = draw(st.integers(0, 8))
    use_max = draw(st.booleans())
    return w, h, px, cache_bits, use_max


@given(_image_case())
@settings(max_examples=200, deadline=None)
def test_entropy_image_roundtrip(case):
    """Core invariant: ANY packed-ARGB array survives
    _vp8l_write_image -> _vp8l_decode_pixels bit-exactly under any
    cache size and either code-length transmission mode."""
    w, h, px, cache_bits, use_max = case
    bw = M._LsbWriter()
    M._vp8l_write_image(bw, px, w, h, cache_bits, use_max=use_max)
    br = M._LsbBits(bw.done())
    out = M._vp8l_decode_pixels(br, w, h)
    assert list(out) == px


@st.composite
def _file_case(draw):
    # ARGB with alpha pinned opaque: _parse_webp's gate row drops
    # alpha, so random alpha would round-trip invisibly anyway
    w = draw(st.integers(1, 8))
    h = draw(st.integers(1, 8))
    px = [
        0xFF000000 | draw(st.integers(0, 0xFFFFFF))
        for _ in range(w * h)
    ]
    variant = draw(st.integers(0, 3))  # none/subgreen/pred/color
    mode = draw(st.integers(0, 13))
    cache_bits = draw(st.integers(0, 4))
    return w, h, px, variant, mode, cache_bits


@given(_file_case())
@settings(max_examples=150, deadline=None)
def test_full_file_roundtrip_random_transforms(case):
    """Full-file invariant with a hand-rolled single-tile transform
    chain: random pixels + any predictor mode (or cross-color
    elements derived from the mode) decode back exactly through
    _parse_webp."""
    w, h, px, variant, mode, cache_bits = case
    bw = M._LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    coded = list(px)
    if variant == 1:  # subtract green
        bw.write(1, 1)
        bw.write(2, 2)
        coded = [
            (p & 0xFF00FF00)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
               << 16)
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in coded
        ]
    elif variant == 2:  # single-tile predictor, random mode
        sb = 5  # 32x32 block covers any 8x8 image -> one tile
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(sb - 2, 3)
        M._vp8l_write_image(bw, [0xFF000000 | (mode << 8)], 1, 1)
        coded = [
            M._sub_px(
                coded[y * w + x],
                M._vp8l_pred_at(coded, y * w + x, x, y, w, mode),
            )
            for y in range(h) for x in range(w)
        ]
    elif variant == 3:  # single-tile cross-color
        sb = 5
        g2r = (mode * 37) % 256
        g2b = (mode * 91 + 13) % 256
        r2b = (mode * 53 + 200) % 256
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(sb - 2, 3)
        M._vp8l_write_image(
            bw, [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r], 1, 1
        )
        out = []
        for p in coded:
            r = (p >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            b = p & 0xFF
            nr = (r - M._ctd(g2r, g)) & 0xFF
            nb = (b - M._ctd(g2b, g) - M._ctd(r2b, r)) & 0xFF
            out.append((p & 0xFF00FF00) | (nr << 16) | nb)
        coded = out
    bw.write(0, 1)
    M._vp8l_write_image(bw, coded, w, h, cache_bits, main=True)
    ww, hh, img = M._parse_webp(M._riff_webp(bw.done()))
    assert (ww, hh) == (w, h)
    for y in range(h):
        for x in range(w):
            p = px[y * w + x]
            assert img[y, x].tolist() == [
                (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
            ]


def test_lz_mapping_bijective_exhaustive():
    """Every legal length value maps through code+extras and back;
    codes stay inside the 24-symbol length alphabet."""
    for v in range(1, 4097):
        code, extra, ebits = M._vp8l_lz_code(v)
        assert 0 <= code < 24
        assert 0 <= extra < (1 << ebits) if ebits else extra == 0
        w = M._LsbWriter()
        if ebits:
            w.write(extra, ebits)
        w.write(0, 1)  # padding so done() emits at least one byte
        assert M._vp8l_lz_read(M._LsbBits(w.done()), code) == v


@given(
    st.dictionaries(
        st.integers(0, 300), st.integers(1, 1000),
        min_size=2, max_size=60,
    ),
    st.sampled_from([7, 15]),
)
@settings(max_examples=200, deadline=None)
def test_package_merge_kraft_and_limit(freqs, limit):
    lens = M._pm_lengths(freqs, limit)
    assert set(lens) == set(freqs)
    assert all(1 <= l <= limit for l in lens.values())
    assert sum(1 << (limit - l) for l in lens.values()) == 1 << limit


@given(
    st.dictionaries(
        st.integers(0, 300), st.integers(1, 1000),
        min_size=2, max_size=60,
    )
)
@settings(max_examples=100, deadline=None)
def test_canonical_codes_prefix_free(freqs):
    lens_map = M._pm_lengths(freqs, 15)
    lens = [0] * 301
    for s, l in lens_map.items():
        lens[s] = l
    codes = M._vp8l_canon_codes(lens)
    bits = sorted(
        format(c, f"0{l}b") for c, l in codes.values()
    )
    for a, b in zip(bits, bits[1:]):
        assert not b.startswith(a)
