"""Lossless WebP (VP8L) codec: round-trip fidelity across every
transform / cache / LZ77 path, spec-constant pins (distance map prefix,
code-length order, prefix-coding inverse), container robustness, and
the decode_image dispatch including the PIL-free NotImplementedError
narrowing to lossy VP8 only."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from distributedvectordatabase_spark.operators import webp_codec as W
from distributedvectordatabase_spark.operators.multimodal import decode_image


def _rng():
    return np.random.default_rng(42)


# ------------------------------------------------------------ spec constants


def test_distance_map_matches_spec_prefix():
    """First entries of the generated map pinned against the table
    published in the WebP Lossless Bitstream Specification §4.2.2."""
    spec_prefix = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
        (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    ]
    assert W.DISTANCE_MAP[: len(spec_prefix)] == spec_prefix
    assert len(W.DISTANCE_MAP) == 120
    assert len(set(W.DISTANCE_MAP)) == 120


def test_code_length_order():
    assert W.CODE_LENGTH_ORDER == (
        17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15
    )


def test_prefix_coding_exact_inverse():
    for v in range(1, 1 << 14):
        p, x, n = W._prefix_encode(v)
        if p < 4:
            got = p + 1
            assert n == 0
        else:
            extra = (p - 2) >> 1
            offset = (2 + (p & 1)) << extra
            assert n == extra and 0 <= x < (1 << extra)
            got = offset + x + 1
        assert got == v


def test_plane_code_linear_and_mapped():
    assert W._plane_code_to_distance(100, 121) == 1
    assert W._plane_code_to_distance(100, 120 + 500) == 500
    # plane code 1 -> (0,1) -> one row up
    assert W._plane_code_to_distance(64, 1) == 64
    # plane code 2 -> (1,0) -> left neighbor (distance clamps at >= 1)
    assert W._plane_code_to_distance(64, 2) == 1


# ------------------------------------------------------------ round trips


def test_roundtrip_plain_rgb():
    img = _rng().integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    out = W.decode_webp(W.encode_webp_lossless(img))
    assert out.shape == img.shape and np.array_equal(out, img)


def test_roundtrip_rgba_alpha_preserved():
    rgba = _rng().integers(0, 256, size=(9, 11, 4), dtype=np.uint8)
    out = W.decode_webp(W.encode_webp_lossless(rgba))
    assert out.shape == (9, 11, 4) and np.array_equal(out, rgba)


def test_roundtrip_gray_input():
    g = _rng().integers(0, 256, size=(8, 10), dtype=np.uint8)
    out = W.decode_webp(W.encode_webp_lossless(g))
    assert out.shape == (8, 10, 3)
    assert np.array_equal(out[..., 0], g) and np.array_equal(out[..., 2], g)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_all_predictor_modes(mode):
    y, x = np.mgrid[0:40, 0:33]
    grad = np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256], axis=-1).astype(
        np.uint8
    )
    data = W.encode_webp_lossless(grad, predictor_mode=mode)
    assert np.array_equal(W.decode_webp(data), grad)


@pytest.mark.parametrize("n_colors", [2, 3, 7, 16, 17, 200])
def test_roundtrip_palette_all_bundling_widths(n_colors):
    """2 colors -> 8 px/byte, <=4 -> 4, <=16 -> 2, else unbundled."""
    rng = _rng()
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, size=(21, 19))]
    data = W.encode_webp_lossless(img, palette=True)
    assert np.array_equal(W.decode_webp(data), img)


@pytest.mark.parametrize("ct", [(0, 0, 0), (12, -7, 3), (-128, 127, 55)])
def test_roundtrip_color_transform(ct):
    img = _rng().integers(0, 256, size=(23, 18, 3), dtype=np.uint8)
    data = W.encode_webp_lossless(img, color_transform=ct)
    assert np.array_equal(W.decode_webp(data), img)


def test_roundtrip_cache_and_lz77():
    rep = np.tile(_rng().integers(0, 256, size=(4, 5, 3), dtype=np.uint8), (6, 7, 1))
    for kw in (
        {"cache_bits": 6},
        {"use_lz77": True},
        {"cache_bits": 4, "use_lz77": True},
        {"subtract_green": True, "cache_bits": 5, "use_lz77": True},
    ):
        data = W.encode_webp_lossless(rep, **kw)
        assert np.array_equal(W.decode_webp(data), rep), kw


def test_roundtrip_full_compose():
    """predictor + cross-color + subtract-green + cache + LZ77 in one
    stream — the transform chain order a real encoder emits."""
    grad = np.stack(
        [(np.arange(30)[None, :] * 7 + np.arange(20)[:, None] * 3) % 256] * 3, axis=-1
    ).astype(np.uint8)
    data = W.encode_webp_lossless(
        grad,
        predictor_mode=11,
        color_transform=(5, -3, 2),
        subtract_green=True,
        cache_bits=4,
        use_lz77=True,
    )
    assert np.array_equal(W.decode_webp(data), grad)


@pytest.mark.parametrize("shape", [(1, 1, 3), (1, 9, 3), (9, 1, 3)])
def test_roundtrip_edge_shapes(shape):
    img = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(W.decode_webp(W.encode_webp_lossless(img)), img)


def test_lz77_compresses_repetitive_content():
    # constant horizontal stripes: long equal-pixel runs, the shape the
    # encoder's distance-1 run detector targets
    rep = np.repeat(
        np.arange(8, dtype=np.uint8)[:, None, None] * 30, 64, axis=1
    ).repeat(4, axis=0)
    rep = np.tile(rep, (1, 1, 3))
    plain = W.encode_webp_lossless(rep)
    lz = W.encode_webp_lossless(rep, use_lz77=True)
    assert len(lz) < len(plain)


# ------------------------------------------------------------ rejection paths


def test_rejects_non_webp():
    with pytest.raises(ValueError):
        W.decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        W.decode_webp(b"\x89PNG\r\n\x1a\n")


def test_lossy_vp8_raises_not_implemented():
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="lossy"):
        W.decode_webp(data)
    # decode_image narrows to the PIL fallback raise (PIL absent here)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="lossy VP8"):
            decode_image(data)


def test_container_without_vp8l_chunk():
    body = b"WEBP" + b"JUNK" + struct.pack("<I", 2) + b"ab"
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="no VP8L"):
        W.decode_webp(data)


def test_truncated_stream_raises():
    img = _rng().integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = W.encode_webp_lossless(img)
    # cut the VP8L payload in half (keep the container header intact)
    cut = data[: len(data) // 2]
    with pytest.raises(ValueError):
        W.decode_vp8l(cut[20:])
    with pytest.raises(ValueError, match="signature"):
        W.decode_vp8l(b"\x00\x01\x02")


def test_vp8x_extended_container_with_vp8l():
    """Extended (VP8X) containers wrap the VP8L chunk after metadata
    chunks — the walker must skip to it."""
    img = _rng().integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    plain = W.encode_webp_lossless(img)
    vp8l_chunk = plain[12:]  # the VP8L chunk (incl. fourcc + size)
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(W.decode_webp(data), img)


# ------------------------------------------------------------ integration


def test_decode_image_dispatches_webp():
    img = _rng().integers(0, 256, size=(12, 14, 3), dtype=np.uint8)
    out = decode_image(W.encode_webp_lossless(img, subtract_green=True))
    assert np.array_equal(out, img)


def test_decode_stats_real_path_over_webp(spark):
    """The Spark Arrow-batch real-decode path accepts WebP payloads."""
    from distributedvectordatabase_spark.operators.multimodal import decode_stats
    from distributedvectordatabase_spark.operators.png_codec import luma

    img = _rng().integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = W.encode_webp_lossless(img)
    df = spark.createDataFrame(
        [(1, bytearray(payload), "webp", 16, 16)],
        "item_id long, payload binary, format string, width int, height int",
    )
    row = decode_stats(df, decoder="real").collect()[0]
    assert row["brightness"] == pytest.approx(float(luma(img).mean() / 255.0), abs=1e-9)
