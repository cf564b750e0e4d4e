"""Property-based tests (hypothesis) for the VP8L codec and the langid
frozen model: random images through random transform/cache/LZ77
compositions must round-trip bit-exactly (the parametric cases in
test_webp_codec.py pin each path once; this fuzzes the COMPOSITIONS —
encoder and decoder share no table-building code, so agreement on
random inputs is evidence, not tautology), and the langid scorer must
be total and deterministic over arbitrary unicode (the gate only ever
sees corpus text; a crawl sees everything)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedvectordatabase_spark.operators import webp_codec as W
from distributedvectordatabase_spark.operators.langid import (
    BUCKETS,
    LANGS,
    bucket_py,
    predict_lang_py,
)

# ------------------------------------------------------------ VP8L round-trip

dims = st.integers(min_value=1, max_value=19)
# low-cardinality palettes exercise LZ77 runs and the color cache;
# full-range exercises wide histograms and long prefix codes
pixel_pool = st.sampled_from([4, 256])


@st.composite
def images(draw):
    h, w = draw(dims), draw(dims)
    levels = draw(pixel_pool)
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    chans = draw(st.sampled_from([2, 3, 4]))  # gray / RGB / RGBA
    if chans == 2:
        return (rng.integers(0, levels, (h, w)) * (256 // levels)).astype(np.uint8)
    return (rng.integers(0, levels, (h, w, chans)) * (256 // levels)).astype(
        np.uint8
    )


transform_opts = st.fixed_dictionaries(
    {
        "subtract_green": st.booleans(),
        "predictor_mode": st.one_of(
            st.none(), st.integers(min_value=0, max_value=13)
        ),
        "color_transform": st.one_of(
            st.none(),
            st.tuples(*[st.integers(min_value=0, max_value=255)] * 3),
        ),
        "cache_bits": st.sampled_from([0, 1, 3, 6]),
        "use_lz77": st.booleans(),
    }
)


def _expected_rgb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return np.stack([img] * 3, axis=-1)
    return img[..., :3]


@settings(max_examples=60, deadline=None)
@given(img=images(), opts=transform_opts)
def test_roundtrip_random_transform_compositions(img, opts):
    payload = W.encode_webp_lossless(img, **opts)
    out = W.decode_webp(payload)
    if img.ndim == 3 and img.shape[2] == 4 and bool(np.any(img[..., 3] != 255)):
        assert out.shape == img.shape
        np.testing.assert_array_equal(out, img)
    else:
        assert out.shape == _expected_rgb(img).shape
        np.testing.assert_array_equal(out, _expected_rgb(img))


@settings(max_examples=40, deadline=None)
@given(img=images(), seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_roundtrip_random_palette(img, seed):
    # palette path excludes the other transforms by encoder design;
    # sub-byte bundling widths are chosen by distinct-color count, so
    # the low-cardinality image pool hits 1/2/4/8-bit packing. The
    # encoder requires <= 256 distinct colors: a levels=256 draw with
    # >256 pixels can exceed that, so remap those through a seeded
    # 256-color pool (keeps the 8-bit packing branch covered).
    if img.ndim == 3:
        flat = img.reshape(-1, img.shape[2])
        colors = np.unique(flat, axis=0)
        if len(colors) > 256:
            rng = np.random.default_rng(seed)
            pool = colors[rng.choice(len(colors), 256, replace=False)]
            img = pool[rng.integers(0, 256, len(flat))].reshape(img.shape)
    payload = W.encode_webp_lossless(img, palette=True)
    out = W.decode_webp(payload)
    if img.ndim == 3 and img.shape[2] == 4 and bool(np.any(img[..., 3] != 255)):
        np.testing.assert_array_equal(out, img)
    else:
        np.testing.assert_array_equal(out, _expected_rgb(img))


@settings(max_examples=200, deadline=None)
@given(v=st.integers(min_value=1, max_value=1 << 20))
def test_prefix_encode_decode_inverse_wide(v):
    prefix, extra_val, extra_bits = W._prefix_encode(v)
    assert 0 <= prefix < 40
    assert 0 <= extra_val < (1 << extra_bits) if extra_bits else extra_val == 0
    bw = W._BitWriter()
    bw.write(extra_val, extra_bits)
    br = W._BitReader(bw.bytes() or b"\x00")
    assert W._prefix_decode(br, prefix) == v


def test_palette_rejects_over_256_colors():
    # explicit pin of the encoder's documented contract (ADVICE r11):
    # palette=True with more than 256 distinct colors raises rather
    # than silently degrading — the property test above deliberately
    # steers its inputs away from this branch, so cover it directly
    import pytest

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (17, 17, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256 distinct colors"):
        W.encode_webp_lossless(img, palette=True)


# ------------------------------------------------------------ langid totality

anytext = st.text(max_size=200)  # hypothesis text covers astral + controls


@settings(max_examples=150, deadline=None)
@given(t=anytext)
def test_langid_total_and_deterministic(t):
    p1 = predict_lang_py(t)
    assert p1 in LANGS
    assert predict_lang_py(t) == p1


@settings(max_examples=150, deadline=None)
@given(g=st.text(min_size=1, max_size=3))
def test_bucket_in_range(g):
    b = bucket_py(g)
    assert 0 <= b < BUCKETS
