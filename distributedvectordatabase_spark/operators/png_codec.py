"""Pure-stdlib PNG codec (zlib + numpy): the REAL image-decode path.

The reference does its real pixel work through torchvision/PIL
(generate_coco_embeddings.py:17-22); this container ships no codec
libraries and installs are off-limits, so the engine carries its own
baseline PNG implementation — PNG is deflate (stdlib ``zlib``) plus a
per-scanline prediction filter, both fully specified in the PNG spec
(RFC 2083), so a complete 8-bit decoder needs nothing beyond the
stdlib. This makes ``decode_stats(decoder="real")`` genuinely decode
pixels in every environment instead of hiding behind an import-try;
PIL, when present, remains the path for JPEG/WebP (see
``multimodal._real_decode``).

Scope (asserted, not silently wrong): bit depth 8, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. That
covers every PNG this engine writes and the common training-data
case; anything else raises ``NotImplementedError`` with the offending
header field named.

Scale note: decode runs inside Arrow batches on executors (see
``multimodal.decode_stats``); the per-scanline unfilter loop is
O(pixels) with small-constant numpy work for filters 0/2 and a Python
inner loop only for the sequentially-dependent filters 1/3/4 —
acceptable because real 100 TB media pipelines would swap in a codec
library here; the contract (bytes in → ndarray out, per batch) is what
this module pins down.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel.
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array — (H, W) gray or (H, W, {2,3,4}) — as PNG.

    ``filter_type`` applies one PNG prediction filter (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) to every scanline; real encoders pick
    per-line, but a fixed type keeps the encoder tiny while still
    letting tests exercise every decoder unfilter branch.
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_FOR_CHANNELS:
        raise ValueError(f"encode_png wants (H,W) or (H,W,{{2,3,4}}), got {arr.shape}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter_type {filter_type}")
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int64)
    zeros = np.zeros(ch, dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    lines = []
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([zeros, cur[:-ch]]) if stride > ch else np.zeros(stride, np.int64)
        upleft = np.concatenate([zeros, prev[:-ch]]) if stride > ch else np.zeros(stride, np.int64)
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            f = cur - pred
        lines.append(bytes((filter_type,)) + (f % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_FOR_CHANNELS[ch], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to uint8 (H, W) or (H, W, C).

    CRCs are verified (a torn payload raises instead of yielding wrong
    pixels); multiple IDAT chunks concatenate per spec; ancillary
    chunks are skipped.
    """
    data = bytes(data)
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    saw_end = False
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = payload
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            saw_end = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not saw_end:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color} (palette unsupported)")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError(f"bad IHDR compression/filter method {comp}/{filt}")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError(f"PNG pixel data is {len(raw)} bytes, expected {h * (1 + stride)}")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=y * (1 + stride) + 1).astype(
            np.int64
        )
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth depend on the just-reconstructed left
            # neighbour, so the recurrence is inherently sequential.
            cur = line
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (int(a) + int(prev[x])) >> 1
                else:
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = int(a) + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft} on scanline {y}")
        prev = cur
        out[y] = cur.astype(np.uint8)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def luma(img: np.ndarray) -> np.ndarray:
    """Grayscale plane as float64: ITU-R BT.601 luma for color images
    (the same weights PIL's convert("L") uses), channel 0 for
    gray/gray+alpha. Alpha never contributes to brightness."""
    if img.ndim == 2:
        return img.astype(np.float64)
    ch = img.shape[2]
    if ch == 2:  # gray + alpha
        return img[:, :, 0].astype(np.float64)
    rgb = img[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])
