"""Multimodal column operators (north-star surface; absent in the
reference, whose media path is the offline ResNet embedding script,
generate_coco_embeddings.py:27-103).

Design for 100 TB of media: images/audio/video are opaque ``binary``
columns plus a typed metadata struct; all per-item compute (decode,
feature extraction, resize, frame sampling) runs as Arrow-batched
``mapInPandas`` — one Python worker call per batch, zero driver
involvement, embarrassingly parallel per input split. No shuffle
anywhere in the decode path; downstream aggregations shuffle only the
small feature rows, never the payload bytes.

The ``"real"`` decoder does genuine pixel work with no third-party
library: PNG decodes through the engine's own pure-stdlib codec
(``operators/png_codec`` — zlib inflate + scanline unfilter) and
baseline AND progressive JPEG through ``operators/jpeg_codec``
(Huffman entropy decode over SOF0 single scans or SOF2 scan scripts,
dequant, IDCT, chroma upsample, YCbCr→RGB). Only WebP and exotic
processes (lossless, arithmetic) fall back to PIL when installed,
with a clearly-marked NotImplementedError otherwise. The ``"fake"`` decoder
is a deterministic md5-based transform, which keeps the hash-gated
correctness pipeline — schema, batching, UDF signatures —
DuckDB-oracle-checkable (md5 agrees across engines).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMATS = ("jpeg", "png", "webp")

MEDIA_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("brightness", DoubleType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def as_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from a text corpus: payload =
    utf-8 bytes, format/dims derived from the id. This is the fixture
    generator (the driver testdata ships no binary columns); production
    input is any DataFrame matching MEDIA_SCHEMA."""
    return docs.select(
        F.col(id_col).alias("item_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(F.array(*[F.lit(f) for f in FORMATS]), (F.col(id_col) % 3 + 1).cast("int")).alias("format"),
        (64 + (F.col(id_col) % 8) * 16).cast("int").alias("width"),
        (64 + (F.col(id_col) % 5) * 32).cast("int").alias("height"),
    )


def _fake_decode(payload: bytes) -> float:
    """Deterministic stand-in for pixel decoding: md5-derived mean
    'brightness' in [0, 1). Matches the SQL expression
    ('0x' || substr(md5(payload),1,8))::BIGINT / 2^32 in the oracle."""
    return int(hashlib.md5(payload).hexdigest()[:8], 16) / 2**32


def decode_image(payload: bytes):
    """Dispatch real pixel decoding by signature: PNG, JPEG
    (baseline + progressive) and lossless WebP (VP8L) go through the
    engine's own pure-stdlib codecs (``operators/png_codec`` /
    ``operators/jpeg_codec`` / ``operators/webp_codec``, the last added
    r11) — real pixels in every environment, PIL or not, and
    deterministic across environments because the same decoders always
    run. Only LOSSY WebP (VP8) and exotic JPEG processes
    (lossless/arithmetic) fall back to PIL when installed, else raise
    the documented NotImplementedError. Returns a uint8 ndarray,
    (H, W) or (H, W, C)."""
    payload = bytes(payload)
    from .png_codec import PNG_SIGNATURE, decode_png

    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg_codec import decode_jpeg

        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            pass  # non-baseline/progressive process -> PIL below if available
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp_codec import decode_webp

        try:
            return decode_webp(payload)
        except NotImplementedError:
            pass  # lossy VP8 -> PIL below if available
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "this payload needs PIL/pillow (not present): PNG, JPEG "
            "(baseline + progressive) and lossless WebP decode via the "
            "built-in stdlib codecs; lossy VP8 WebP and exotic JPEG "
            "processes do not"
        ) from e
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"))


def _real_decode(payload: bytes) -> float:
    """Real pixel decode (mean luma brightness in [0, 1]) via
    :func:`decode_image` (reference real-model analogue:
    generate_coco_embeddings.py:27-83; the correctness gates use the
    deterministic fake decoder)."""
    from .png_codec import luma

    return float(luma(decode_image(payload)).mean() / 255.0)


_DECODERS = {"fake": _fake_decode, "real": _real_decode}


def decode_stats(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-item decode + feature extraction over Arrow batches.

    The hot loop touches only the payload bytes of one batch at a time
    (bounded memory per task); output rows are tiny feature tuples, so
    the payload column dies with this stage — at scale that means the
    decode is scan-bound, not shuffle-bound.
    """
    fn = _DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "format": pdf["format"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "brightness": payloads.map(fn),
                }
            )

    return media.mapInPandas(batches, schema=DECODE_SCHEMA)


def format_stats(decoded: DataFrame) -> DataFrame:
    """Aggregate decoded features per format (the catalog's checkable
    roll-up: shuffles feature rows only)."""
    return decoded.groupBy("format").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("brightness"), 6).alias("avg_brightness"),
        F.round(F.avg(F.col("width") * F.col("height")), 6).alias("avg_pixels"),
    )


EMBED_DIM = 16


def _fake_model(payloads, dim: int):
    """Deterministic stand-in for a vision model: component i of the
    embedding is md5(payload || '|' || i) → first 8 hex chars → a
    float in [-1, 1). Exact in float64 (division by 2^32, ×2, −1 are
    all exact), so the DuckDB oracle reproduces it bit-for-bit:
    ('0x' || substr(md5(text || '|' || i), 1, 8))::BIGINT
      / 4294967296.0 * 2 - 1."""
    import numpy as np

    out = np.empty((len(payloads), dim), dtype=np.float64)
    for r, payload in enumerate(payloads):
        b = bytes(payload)
        for i in range(dim):
            h = hashlib.md5(b + b"|" + str(i).encode()).hexdigest()[:8]
            out[r, i] = int(h, 16) / 2**32 * 2 - 1
    return out


def infer_embeddings(media: DataFrame, model_fn=None, dim: int = EMBED_DIM) -> DataFrame:
    """Batched media→embedding inference (reference O2: the offline
    ResNet embedding pass, generate_coco_embeddings.py:27-83) as an
    Arrow-batched ``mapInPandas`` skeleton with an injectable model.

    ``model_fn(payloads: pd.Series, dim) -> np.ndarray (n, dim)`` is
    called once per Arrow batch — exactly where a real build would run
    ONNX/torch batch inference (load the model once per worker via a
    module-level cache, feed the whole batch). The default is the
    deterministic fake model, which keeps the operator oracle-checkable
    end-to-end: schema, batching, and the downstream kNN round-trip are
    all real; only the matrix math inside the model is fake. Payload
    bytes die in this stage — only (item_id, embedding) rows continue,
    so at 100 TB the stage is scan-bound with no payload shuffle."""
    fn = model_fn or _fake_model

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            E = fn(pdf["payload"], dim)
            yield pd.DataFrame({"item_id": pdf["item_id"], "embedding": list(E)})

    return media.mapInPandas(batches, schema="item_id long, embedding array<double>")


def resize_bilinear(img, out_h: int, out_w: int):
    """Real bilinear resample of a 2-D float array (align_corners=False
    / half-pixel-centers convention, matching torchvision's default).
    Pure vectorized numpy, deterministic float64 — the resize step the
    reference pays inside torchvision transforms
    (generate_coco_embeddings.py:17-22), no longer a stub."""
    import numpy as np

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def make_pixel_model(dim: int = EMBED_DIM, seed: int = 42, size: int = 16):
    """Deterministic-weights convolutional featurizer over REAL pixels.

    The reference's O2 runs pretrained ResNet50/101 over decoded JPEGs
    (generate_coco_embeddings.py:27-83). Pretrained weights are a
    non-deterministic external dependency this hash-gated engine
    excludes by design (SURVEY O2) — but the *compute shape* of model
    inference need not be faked: this returns a ``model_fn`` for
    :func:`infer_embeddings` that decodes PNG/JPEG payloads with the
    stdlib codecs, bilinear-resizes the luma plane to ``size``², and
    runs a genuine two-layer conv net (3×3 valid convs, ReLU, 2×2
    average pool, global average pool, L2 normalize) whose weights are
    drawn once from a seeded generator. Every step a real vision
    model's batch pass performs — decode, resize, convolve, pool,
    normalize — executes for real inside the Arrow batch; only the
    weight VALUES are synthetic. Swapping in trained weights (e.g. an
    ONNX export) changes nothing structurally.
    """
    import numpy as np

    from .png_codec import luma

    rng = np.random.default_rng(seed)
    n_c1 = 8
    k1 = rng.standard_normal((n_c1, 3, 3)) / 3.0
    k2 = rng.standard_normal((dim, n_c1, 3, 3)) / (3.0 * np.sqrt(n_c1))

    def _forward(gray: "np.ndarray") -> "np.ndarray":
        from numpy.lib.stride_tricks import sliding_window_view

        x = resize_bilinear(gray, size, size) / 255.0
        # conv1: (size-2, size-2, 3, 3) windows → (n_c1, size-2, size-2)
        win = sliding_window_view(x, (3, 3))
        f1 = np.maximum(np.einsum("yxij,kij->kyx", win, k1), 0.0)
        # 2×2 average pool (size-2 == 14 → 7×7 maps)
        ph, pw = f1.shape[1] // 2, f1.shape[2] // 2
        f1 = f1[:, : ph * 2, : pw * 2].reshape(n_c1, ph, 2, pw, 2).mean(axis=(2, 4))
        # conv2 + ReLU + global average pool
        win2 = sliding_window_view(f1, (3, 3), axis=(1, 2))
        f2 = np.maximum(np.einsum("cyxij,dcij->dyx", win2, k2), 0.0)
        v = f2.mean(axis=(1, 2))
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def model_fn(payloads, d: int) -> "np.ndarray":
        assert d == dim, f"model built for dim={dim}, called with {d}"
        out = np.empty((len(payloads), dim), dtype=np.float64)
        for r, payload in enumerate(payloads):
            out[r] = _forward(luma(decode_image(bytes(payload))))
        return out

    return model_fn


def resize_metadata(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: recompute metadata + scale factors Spark-side;
    the pixel resample itself is the stubbed decode path. Keeps the
    schema contract (payload passes through untouched)."""
    return media.withColumns(
        {
            "scale_x": F.round(F.lit(target_w) / F.col("width"), 6),
            "scale_y": F.round(F.lit(target_h) / F.col("height"), 6),
            "width": F.lit(target_w).cast("int"),
            "height": F.lit(target_h).cast("int"),
        }
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("sample_rate", IntegerType()),
    ]
)

AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def as_audio_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic audio table from a text corpus: payload =
    utf-8 bytes reinterpreted as PCM16 (truncated to an even length),
    sample_rate derived from the id. Fixture generator, like
    :func:`as_media_table`; production input is any DataFrame matching
    AUDIO_SCHEMA (item_id, payload: raw little-endian int16 PCM,
    sample_rate)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    even_len = (F.octet_length(payload) - F.octet_length(payload) % 2).cast("int")
    return docs.select(
        F.col(id_col).alias("item_id"),
        F.substring(payload, F.lit(1), even_len).alias("payload"),
        F.element_at(
            F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("sample_rate"),
    )


def audio_window_stats(audio: DataFrame, window: int = 256, max_windows: int = 16) -> DataFrame:
    """Windowed audio feature extraction over Arrow batches.

    Unlike the image/video paths, this decode is REAL, not stubbed:
    raw little-endian int16 PCM needs no codec, so the per-window DSP
    (RMS, peak magnitude, zero-crossing count) runs as actual numpy
    over the payload bytes. One input row fans out to
    ``<= max_windows`` feature rows inside the task; the payload dies
    with this stage, so at 100 TB the stage is scan-bound with no
    payload shuffle — same contract as :func:`decode_stats`.

    A payload with an odd byte count has its trailing byte ignored
    (standard PCM16 framing); an empty payload yields zero rows.
    """
    import numpy as np

    w = max(int(window), 1)
    mw = max(int(max_windows), 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            rms: list[float] = []
            peaks: list[int] = []
            zcs: list[int] = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                b = bytes(payload)
                samples = np.frombuffer(b[: len(b) - len(b) % 2], dtype="<i2")
                n_win = min(mw, (len(samples) + w - 1) // w)
                for i in range(n_win):
                    chunk = samples[i * w : (i + 1) * w].astype(np.float64)
                    ids.append(item_id)
                    idxs.append(i)
                    lens.append(len(chunk))
                    rms.append(float(np.sqrt(np.mean(chunk * chunk))))
                    peaks.append(int(np.max(np.abs(chunk))))
                    zcs.append(int(np.count_nonzero(np.signbit(chunk[:-1]) != np.signbit(chunk[1:]))))
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(lens, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                    "zero_crossings": pd.Series(zcs, dtype="int32"),
                }
            )

    return audio.mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Byte-window frame sampling over Arrow batches: emit up to
    ``max_frames`` fixed-stride byte windows per payload (deterministic
    synthetic frames — the md5-oracle-checkable plumbing gate; real
    container-aware sampling is :func:`sample_video_frames`). One input
    row fans out to ≤ max_frames rows — the expansion happens inside
    the task, never through the driver."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    ids.append(item_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"item_id": ids, "frame_idx": idxs, "frame_payload": frames})

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("brightness", DoubleType()),
    ]
)


def sample_video_frames(media: DataFrame, stride: int = 1, max_frames: int = 8) -> DataFrame:
    """REAL video frame sampling: for RIFF-AVI payloads the container
    is parsed by the engine's own pure-stdlib codec
    (``operators/avi_codec``) and every ``stride``-th frame's JPEG
    payload is emitted, up to ``max_frames`` per video. MJPEG frames
    are all keyframes, so stride sampling here IS the keyframe seek a
    production sampler performs — the former byte-window stub survives
    only as the fallback for non-AVI payloads (it keeps the md5-oracle
    plumbing gate meaningful on text-derived fixtures).

    Same scale contract as :func:`decode_stats`: the fan-out happens
    inside the task over one Arrow batch at a time, the video payload
    dies with this stage, and only the (much smaller) per-frame JPEG
    payloads continue downstream.
    """
    from .avi_codec import avi_frames, is_avi

    st = max(int(stride), 1)
    mf = max(int(max_frames), 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                b = bytes(payload)
                if is_avi(b):
                    for j, fp in enumerate(avi_frames(b)[:: st][:mf]):
                        ids.append(item_id)
                        idxs.append(j * st)
                        frames.append(fp)
                else:  # non-container payload: deterministic byte windows
                    n = min(mf, max(1, len(b) // 64))
                    for i in range(n):
                        ids.append(item_id)
                        idxs.append(i)
                        frames.append(b[i * 64 : (i + 1) * 64])
            yield pd.DataFrame({"item_id": ids, "frame_idx": idxs, "frame_payload": frames})

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def video_frame_stats(media: DataFrame, stride: int = 1, max_frames: int = 8) -> DataFrame:
    """End-to-end real video decode: AVI container walk → per-frame
    baseline-JPEG decode (``decode_image``) → per-frame luma brightness
    + dimensions. Both stages are Arrow-batched ``mapInPandas`` with no
    payload shuffle between them (frame extraction and pixel decode
    pipeline inside the same stage — Catalyst fuses adjacent
    mapInPandas calls into one Python runner pass)."""
    from .png_codec import luma

    frames = sample_video_frames(media, stride=stride, max_frames=max_frames)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import logging

        for pdf in it:
            keep: list[int] = []
            widths: list[int] = []
            heights: list[int] = []
            bright: list[float] = []
            dropped = 0
            for row_i, fp in enumerate(pdf["frame_payload"]):
                b = bytes(fp)
                # per-frame robustness (ADVICE r9): sample_video_frames
                # emits raw byte windows for non-container payloads and
                # the AVI walker admits uncompressed-DIB ('##db')
                # chunks — neither is an image; on mixed or foreign
                # datasets one undecodable frame must not kill the
                # whole stage. Frames without a PNG/JPEG signature (or
                # failing to decode) are dropped, not fatal.
                if b[:8] != b"\x89PNG\r\n\x1a\n" and b[:3] != b"\xff\xd8\xff":
                    dropped += 1
                    continue
                try:
                    img = decode_image(b)
                except (NotImplementedError, ValueError):
                    dropped += 1
                    continue
                g = luma(img)
                keep.append(row_i)
                heights.append(int(g.shape[0]))
                widths.append(int(g.shape[1]))
                bright.append(float(g.mean() / 255.0))
            if dropped:
                # observability (ADVICE r10): a systematically corrupt
                # or misrouted dataset must surface as a detectable
                # condition, not mysteriously fewer rows
                logging.getLogger(__name__).warning(
                    "video_frame_stats: dropped %d/%d undecodable frame(s) "
                    "in batch (no PNG/JPEG signature or decode failure)",
                    dropped,
                    len(pdf),
                )
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"].iloc[keep].reset_index(drop=True),
                    "frame_idx": pdf["frame_idx"].iloc[keep].reset_index(drop=True),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "brightness": pd.Series(bright, dtype="float64"),
                }
            )

    return frames.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)
