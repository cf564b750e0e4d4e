"""Pure-stdlib PNG codec: round-trips, an INDEPENDENT scalar filter
reference (straight from RFC 2083 §6) so encoder and decoder can't
share a bug, CRC/truncation rejection, and unsupported-feature gates."""

import struct
import zlib

import numpy as np
import pytest

from distributedvectordatabase_spark.operators.png_codec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    luma,
)


def _ref_filter_line(ft: int, cur: list, prev: list, ch: int) -> bytes:
    """Scalar RFC 2083 filter, written independently of the codec
    module (byte-at-a-time, no numpy)."""
    out = []
    for x in range(len(cur)):
        a = cur[x - ch] if x >= ch else 0
        b = prev[x]
        c = prev[x - ch] if x >= ch else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((cur[x] - pred) % 256)
    return bytes(out)


def _ref_encode(arr: np.ndarray, fts) -> bytes:
    """Independent encoder: manual chunks, per-line filter choice."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).tolist()
    prev = [0] * (w * ch)
    raw = b""
    for y in range(h):
        ft = fts[y % len(fts)]
        raw += bytes((ft,)) + _ref_filter_line(ft, flat[y], prev, ch)
        prev = flat[y]

    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_decode_against_independent_reference(ch, ft):
    rng = np.random.default_rng(ch * 10 + ft)
    shape = (7, 5) if ch == 1 else (7, 5, ch)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(_ref_encode(arr, [ft]))
    np.testing.assert_array_equal(got, arr)


def test_decode_mixed_filters_per_line():
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, size=(10, 4, 3), dtype=np.uint8)
    got = decode_png(_ref_encode(arr, [0, 1, 2, 3, 4]))
    np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_encode_decode_roundtrip(ch, ft):
    rng = np.random.default_rng(ch * 100 + ft)
    shape = (6, 9) if ch == 1 else (6, 9, ch)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(arr, filter_type=ft)), arr)


def test_one_pixel_wide_image():
    """w=1: the 'left' neighbour is always zero — the stride==ch edge."""
    arr = np.array([[5], [250], [7]], dtype=np.uint8)
    for ft in range(5):
        np.testing.assert_array_equal(decode_png(encode_png(arr, filter_type=ft)), arr)


def test_encoder_output_matches_reference_encoder():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    for ft in range(5):
        assert encode_png(arr, filter_type=ft) == _ref_encode(arr, [ft])


def test_bad_crc_rejected():
    png = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    png[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_truncated_and_garbage_rejected():
    png = encode_png(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(png[: len(png) // 2])
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")


def test_unsupported_features_raise_not_implemented():
    def with_ihdr(depth, color, interlace):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, interlace)

        def chunk(t, p):
            return (
                struct.pack(">I", len(p)) + t + p + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
            )

        raw = zlib.compress(b"\x00\x00\x00")
        return PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")

    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(with_ihdr(16, 0, 0))
    with pytest.raises(NotImplementedError, match="palette|color"):
        decode_png(with_ihdr(8, 3, 0))
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(with_ihdr(8, 0, 1))


def test_luma_weights_and_alpha_ignored():
    rgb = np.array([[[255, 0, 0]]], dtype=np.uint8)
    assert abs(luma(rgb)[0, 0] - 0.299 * 255) < 1e-9
    rgba = np.array([[[0, 255, 0, 0]]], dtype=np.uint8)  # fully transparent green
    assert abs(luma(rgba)[0, 0] - 0.587 * 255) < 1e-9
    ga = np.array([[[40, 0]]], dtype=np.uint8)
    assert luma(ga)[0, 0] == 40.0
