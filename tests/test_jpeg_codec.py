"""Baseline JPEG codec: DCT orthonormality, constant-block exactness,
round-trip fidelity (PSNR) across sampling modes/qualities/odd sizes,
determinism, Huffman/entropy edge symbols (ZRL, category extremes),
and malformed-stream rejection."""

import struct

import numpy as np
import pytest

from distributedvectordatabase_spark.operators.jpeg_codec import (
    _D,
    _ZZ_FLAT,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_dct_matrix_is_orthonormal():
    np.testing.assert_allclose(_D @ _D.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation_with_spec_prefix():
    assert sorted(_ZZ_FLAT.tolist()) == list(range(64))
    # the first eight entries of the T.81 zigzag, in natural index form
    assert _ZZ_FLAT[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (17, 9), (1, 1), (5, 3)])
def test_constant_gray_roundtrips_exactly(shape):
    """A constant image is DC-only; at quality 95 the DC quant step is
    small enough that reconstruction is bit-exact at every size
    (including non-multiples of 8 exercising edge padding)."""
    for v in (0, 7, 128, 200, 255):
        img = np.full(shape, v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("subsample", [False, True])
def test_constant_color_roundtrips_exactly(subsample):
    img = np.zeros((20, 14, 3), dtype=np.uint8)
    img[...] = (90, 160, 30)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("shape", [(32, 32), (33, 31), (8, 64)])
def test_smooth_image_high_psnr(shape, subsample):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    img = (
        127.5
        + 90 * np.sin(2 * np.pi * xx / shape[1])
        + 30 * np.cos(2 * np.pi * yy / shape[0])
    ).clip(0, 255).astype(np.uint8)
    rgb = np.stack([img, 255 - img, np.roll(img, 3, axis=1)], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=subsample))
    assert out.shape == rgb.shape
    # 4:2:0 halves chroma resolution; the triangular "fancy upsample"
    # in the decoder keeps even strong chroma gradients >= 30 dB.
    assert _psnr(out, rgb) > 30.0


def test_noise_image_roundtrip_quality_ladder():
    """Random noise is JPEG's worst case; error must still be bounded
    and must shrink as quality rises."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    errs = []
    for q in (50, 75, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.mean(np.abs(out.astype(int) - img.astype(int))))
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < 8.0


def test_deterministic_bytes():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_zrl_and_high_category_symbols():
    """A block with one huge DC step and a lone late AC coefficient
    forces ZRL runs (>16 zeros) and large size categories through the
    entropy coder."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[7, 7] = 255  # sharp corner spike -> energy across the spectrum
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (8, 8)
    checker = (255 * ((np.add.outer(np.arange(8), np.arange(8)) % 2))).astype(np.uint8)
    out2 = decode_jpeg(encode_jpeg(checker, quality=100))
    assert _psnr(out2, checker) > 25.0


def test_decode_rejects_malformed():
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 3])
    # flip SOF0 to SOF2: progressive DECODES since r10, but this
    # frankenstream pairs a progressive frame with a baseline
    # full-band scan script — a malformed scan, rejected loudly
    prog = bytearray(good)
    i = prog.find(bytes([0xFF, 0xC0]))
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(bytes(prog))
    # genuinely unsupported processes still refuse by name (SOF3 lossless)
    lossless = bytearray(good)
    lossless[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(lossless))


def test_decodes_foreign_table_layout():
    """The decoder must not depend on THIS encoder's table choices:
    re-emit a stream whose DHT uses a different (per-symbol canonical)
    code-length distribution and confirm identical pixels. Built by
    round-tripping our stream through a re-encode with quality change
    plus a handmade two-table DHT reshuffle is overkill; instead pin
    the generic path: tables parsed from DHT, multiple DQT/DHT
    segments in one marker (as many encoders emit)."""
    img = np.full((10, 10), 55, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=95))
    # merge the two DHT segments into one multi-table DHT segment
    def find_seg(buf, marker, start=2):
        i = start
        while i + 4 <= len(buf):
            if buf[i] == 0xFF and buf[i + 1] == marker:
                (ln,) = struct.unpack(">H", bytes(buf[i + 2 : i + 4]))
                return i, ln
            if buf[i] == 0xFF and buf[i + 1] == 0xDA:
                return None, None
            if buf[i] == 0xFF:
                (ln,) = struct.unpack(">H", bytes(buf[i + 2 : i + 4]))
                i += 2 + ln
            else:
                i += 1
        return None, None

    i1, l1 = find_seg(data, 0xC4)
    p1 = bytes(data[i1 + 4 : i1 + 2 + l1])
    i2, l2 = find_seg(data, 0xC4, i1 + 2 + l1)
    p2 = bytes(data[i2 + 4 : i2 + 2 + l2])
    merged = (
        bytes([0xFF, 0xC4]) + struct.pack(">H", len(p1) + len(p2) + 2) + p1 + p2
    )
    rebuilt = bytes(data[:i1]) + merged + bytes(data[i2 + 2 + l2 :])
    np.testing.assert_array_equal(decode_jpeg(rebuilt), decode_jpeg(bytes(data)))


def test_gray_vs_color_shapes_and_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((4, 4), dtype=np.float64))
    with pytest.raises(ValueError, match="3 channels"):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    g = decode_jpeg(encode_jpeg(np.zeros((9, 5), dtype=np.uint8)))
    assert g.shape == (9, 5) and g.ndim == 2
    c = decode_jpeg(encode_jpeg(np.zeros((9, 5, 3), dtype=np.uint8)))
    assert c.shape == (9, 5, 3)


# ---------------------------------------------------------------------------
# Progressive (SOF2) — r10
# ---------------------------------------------------------------------------
#
# The round-trip oracle: encode_jpeg_progressive shares encode_jpeg's
# _forward_image, so both streams carry IDENTICAL quantized
# coefficients — progressive is a reordering of the same data, and
# decode_jpeg(progressive) must equal decode_jpeg(baseline)
# BIT-FOR-BIT. A mirrored encoder/decoder bug cannot hide behind this
# because the baseline decode path never touches the progressive scan
# machinery (separate scan scripts, EOB runs, refinement algebra).


def _prog_cases():
    rng = np.random.RandomState(7)
    x = np.linspace(0, 255, 48)
    grad = np.clip(np.add.outer(x, x) / 2 + 40 * np.sin(np.arange(48) / 3), 0, 255)
    sparse = np.full((40, 56, 3), 128, dtype=np.uint8)
    sparse.flat[::97] = 255  # isolated spikes -> long cross-block EOB runs
    return [
        ("noise-gray", rng.randint(0, 256, (16, 16), dtype=np.uint8), False),
        ("noise-rgb", rng.randint(0, 256, (24, 17, 3), dtype=np.uint8), True),
        ("gradient", np.stack([grad, grad.T, 255 - grad], -1).astype(np.uint8), True),
        ("flat", np.full((64, 64, 3), 77, dtype=np.uint8), True),
        ("sparse-eobrun", sparse, True),
        ("odd-dims-444", rng.randint(0, 256, (33, 41, 3), dtype=np.uint8), False),
    ]


def test_progressive_decodes_identical_to_baseline():
    for name, img, sub in _prog_cases():
        for q in (30, 75, 95):
            base = encode_jpeg(img, quality=q, subsample=sub)
            prog = encode_jpeg_progressive(img, quality=q, subsample=sub)
            assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
            np.testing.assert_array_equal(
                decode_jpeg(prog), decode_jpeg(base), err_msg=f"{name} q={q}"
            )


def test_progressive_is_multi_scan():
    img = np.full((32, 32, 3), 50, dtype=np.uint8)
    prog = encode_jpeg_progressive(img)
    # DC first + 2 AC bands x 3 comps + DC refine + 3 AC refines = 11 SOS
    assert prog.count(b"\xff\xda") >= 8
    assert encode_jpeg(img).count(b"\xff\xda") == 1


def test_progressive_eob_run_encoding_bit_exact():
    """Spec pin independent of the decoder: a component whose band is
    all-zero in every block must compress its AC-first scan to EOBn
    symbols with n extension bits (T.81 G.1.2.2) — for 16 blocks, one
    EOB16 run = symbol 0x40 + 0 extension value, i.e. a tiny scan."""
    from distributedvectordatabase_spark.operators.jpeg_codec import (
        _SymCollector,
        _encode_scan_ac_first,
    )

    class _Rec:
        def __init__(self):
            self.events = []

        def sym(self, s):
            self.events.append(("sym", s))

        def bits(self, v, n):
            if n:
                self.events.append(("bits", v, n))

    comp = {
        "bh": 4, "bw": 4,
        "zzc": np.zeros((4, 4, 64), dtype=np.int64),
    }
    rec = _Rec()
    _encode_scan_ac_first(rec, comp, 1, 63, 0)
    # 16 all-zero blocks -> single EOB16: symbol (4<<4)=0x40, ext 16-16=0 in 4 bits
    assert rec.events == [("sym", 0x40), ("bits", 0, 4)]
    # one nonzero coefficient in block 5 splits the run: EOB4(0x20,+1ext)
    # ... symbol ... EOB-run for the 10 remaining blocks
    comp["zzc"][1, 1, 3] = 2
    rec = _Rec()
    _encode_scan_ac_first(rec, comp, 1, 63, 0)
    assert rec.events[0] == ("sym", 0x20)            # EOB run of 5 blocks
    assert rec.events[1] == ("bits", 1, 2)           # 5 = 4 + ext 1
    assert rec.events[2] == ("sym", (2 << 4) | 2)    # run 2 zeros, size 2
    assert rec.events[3] == ("bits", 2, 2)           # value +2
    # remaining 10 blocks + this block's tail -> EOB run of 11 = 8 + ext 3
    assert rec.events[4:] == [("sym", 0x30), ("bits", 3, 3)]


def test_dc_successive_approximation_bit_semantics():
    """DC point transform: first scan codes dc >> Al (arithmetic
    shift), refinement appends the dropped bit; the decoder must
    reassemble the exact DC for negative values too (two's-complement
    OR). Construct a gray image whose single block has a negative DC."""
    img = np.full((8, 8), 10, dtype=np.uint8)  # DC well below 128 -> negative coef
    base = encode_jpeg(img, quality=90)
    prog = encode_jpeg_progressive(img, quality=90)
    np.testing.assert_array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_progressive_via_decode_image_dispatch():
    """multimodal.decode_image must route SOF2 through the stdlib
    codec now (no PIL fallback attempt)."""
    from distributedvectordatabase_spark.operators.multimodal import decode_image

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    out = decode_image(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(out, decode_jpeg(encode_jpeg(img)))


def test_restart_intervals_roundtrip_and_reject():
    """DRI restart markers (r10): byte-aligned RSTm every n MCUs with
    DC predictor reset — decoded pixels must equal the marker-free
    stream; a wrong modulo-8 sequence number must fail loudly."""
    rng = np.random.RandomState(5)
    for shape, sub in [((48, 56, 3), True), ((48, 56, 3), False), ((40, 33), False)]:
        img = (rng.randint(0, 256, shape).astype(float) * 0.35 + 100).astype(np.uint8)
        plain = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        for ri in (1, 2, 5):
            withr = decode_jpeg(
                encode_jpeg(img, quality=85, subsample=sub, restart_interval=ri)
            )
            np.testing.assert_array_equal(plain, withr)
    data = bytearray(
        encode_jpeg(np.full((48, 48), 90, dtype=np.uint8), restart_interval=2)
    )
    i = data.find(b"\xff\xd0")
    data[i + 1] = 0xD5
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(data))
