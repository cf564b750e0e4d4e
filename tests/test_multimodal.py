"""Multimodal binary-column operators: schema contract, Arrow-batch
decode plumbing, frame fan-out, and the stubbed real-decoder gate."""

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.multimodal import (
    DECODE_SCHEMA,
    MEDIA_SCHEMA,
    as_media_table,
    decode_stats,
    resize_metadata,
    sample_frames,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    return as_media_table(load_table(spark, "documents", SF_SMALL))


def test_media_table_schema(media):
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA.fields
    ]
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.format in ("jpeg", "png", "webp")


def test_decode_stats_deterministic_and_typed(media):
    out = decode_stats(media, decoder="fake")
    assert out.schema == DECODE_SCHEMA
    a = {r.item_id: r.brightness for r in out.collect()}
    b = {r.item_id: r.brightness for r in decode_stats(media, decoder="fake").collect()}
    assert a == b
    assert all(0.0 <= v < 1.0 for v in a.values())


def test_decode_matches_payload_bytes(media):
    """n_bytes from the Python batch loop equals Spark-side byte length
    (proves the payload actually crossed the Arrow boundary intact)."""
    got = decode_stats(media, decoder="fake").select("item_id", "n_bytes")
    want = media.select("item_id", F.length("payload").cast("long").alias("n_bytes"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="PIL present: real non-PNG decode works")
def test_real_decoder_raises_on_non_png_without_pil(spark, media):
    """Non-PNG payloads (the text-derived fixture bytes) still need PIL;
    without it the documented NotImplementedError surfaces. PNG no
    longer depends on PIL at all (stdlib codec)."""
    with pytest.raises(Exception) as ei:
        decode_stats(media.limit(1), decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_real_decoder_decodes_png_stdlib(spark):
    """decoder='real' does true pixel decoding with NO codec library:
    PNG goes through operators/png_codec. Fixture: a 2×1 grayscale PNG
    with pixels (0, 255) → mean 127.5/255 = 0.5."""
    import numpy as np

    from distributedvectordatabase_spark.operators.png_codec import encode_png

    payload = encode_png(np.array([[0, 255]], dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, payload, "png", 2, 1)],
        schema="item_id long, payload binary, format string, width int, height int",
    )
    row = decode_stats(media, decoder="real").first()
    assert abs(row.brightness - 0.5) < 1e-9


def test_real_decoder_png_batch_matches_numpy(spark):
    """End-to-end through the Spark Arrow batch path: a batch of real
    RGB PNGs (every filter type) decodes to exactly the luma mean
    numpy computes on the source arrays."""
    import numpy as np

    from distributedvectordatabase_spark.operators.png_codec import encode_png, luma

    rng = np.random.default_rng(7)
    rows, want = [], {}
    for i, ft in enumerate([0, 1, 2, 3, 4]):
        arr = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
        rows.append((i, encode_png(arr, filter_type=ft), "png", 3, 5))
        want[i] = float(luma(arr).mean() / 255.0)
    media = spark.createDataFrame(
        rows, schema="item_id long, payload binary, format string, width int, height int"
    )
    got = {r.item_id: r.brightness for r in decode_stats(media, decoder="real").collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


def test_resize_metadata(media):
    out = resize_metadata(media, 224, 224)
    row = out.filter(F.col("item_id") == 1).first()
    assert row.width == 224 and row.height == 224
    assert row.scale_x == round(224 / (64 + (1 % 8) * 16), 6)
    # payload untouched
    orig = media.filter(F.col("item_id") == 1).first().payload
    assert row.payload == orig


def test_sample_frames_fanout_bounds(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=8)
    per_item = frames.groupBy("item_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("max_idx")
    )
    bad = per_item.filter((F.col("n") < 1) | (F.col("n") > 8) | (F.col("max_idx") != F.col("n") - 1))
    assert bad.count() == 0
    # frames reassemble to a prefix of the payload
    one = frames.filter(F.col("item_id") == 0).orderBy("frame_idx").collect()
    reassembled = b"".join(bytes(r.frame_payload) for r in one)
    payload = bytes(media.filter(F.col("item_id") == 0).first().payload)
    assert payload.startswith(reassembled) and len(reassembled) >= min(64, len(payload))


def test_infer_embeddings_knn_roundtrip(spark, media):
    """O2 end-to-end: fake-model inference → exact kNN over the inferred
    embeddings — every item's nearest neighbor is itself at distance 0
    (the reference's embed-then-search loop,
    generate_coco_embeddings.py:27-103 feeding the FAISS index)."""
    from distributedvectordatabase_spark.operators.knn import knn
    from distributedvectordatabase_spark.operators.multimodal import infer_embeddings

    emb = infer_embeddings(media).cache()
    queries = (
        emb.orderBy("item_id")
        .limit(10)
        .select(F.col("item_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    top1 = knn(emb, queries, k=1, id_col="item_id", vec_col="embedding").collect()
    assert len(top1) == 10
    assert all(r.neighbor_id == r.qid and r.dist <= 1e-12 for r in top1)
    emb.unpersist()


def test_infer_embeddings_dim_and_range(media):
    from distributedvectordatabase_spark.operators.multimodal import (
        EMBED_DIM,
        infer_embeddings,
    )

    rows = infer_embeddings(media).limit(50).collect()
    assert all(len(r.embedding) == EMBED_DIM for r in rows)
    assert all(-1.0 <= v < 1.0 for r in rows for v in r.embedding)


# -- audio (PCM16 — the one REAL decode path: no codec needed) --------------


@pytest.fixture(scope="module")
def audio(spark):
    from distributedvectordatabase_spark.operators.multimodal import as_audio_table

    return as_audio_table(load_table(spark, "documents", SF_SMALL))


def test_audio_table_schema_and_framing(audio):
    from distributedvectordatabase_spark.operators.multimodal import AUDIO_SCHEMA

    assert [(f.name, f.dataType) for f in audio.schema.fields] == [
        (f.name, f.dataType) for f in AUDIO_SCHEMA.fields
    ]
    rows = audio.select("payload", "sample_rate").collect()
    assert all(len(r.payload) % 2 == 0 for r in rows)  # PCM16 framing
    assert all(r.sample_rate in (8000, 16000, 44100) for r in rows)


def test_audio_window_stats_matches_numpy(audio):
    """Driver-side numpy over the same payload bytes reproduces every
    window row bit-for-bit (RMS/peak/zero-crossings are real DSP, not
    a fake — PCM16 needs no codec)."""
    import numpy as np

    from distributedvectordatabase_spark.operators.multimodal import audio_window_stats

    w, mw = 64, 4
    got = {
        (r.item_id, r.window_idx): (r.n_samples, r.rms, r.peak, r.zero_crossings)
        for r in audio_window_stats(audio, window=w, max_windows=mw).collect()
    }
    payloads = {r.item_id: bytes(r.payload) for r in audio.collect()}
    want = {}
    for item_id, b in payloads.items():
        samples = np.frombuffer(b[: len(b) - len(b) % 2], dtype="<i2")
        n_win = min(mw, (len(samples) + w - 1) // w)
        for i in range(n_win):
            c = samples[i * w : (i + 1) * w].astype(np.float64)
            want[(item_id, i)] = (
                len(c),
                float(np.sqrt(np.mean(c * c))),
                int(np.max(np.abs(c))),
                int(np.count_nonzero(np.signbit(c[:-1]) != np.signbit(c[1:]))),
            )
    assert got == want
    assert max(i for _, i in got) <= mw - 1


def test_audio_window_stats_edge_payloads(spark):
    """Odd byte counts drop the trailing byte; empty payloads emit no
    rows; a sub-window payload emits one short window."""
    from distributedvectordatabase_spark.operators.multimodal import (
        AUDIO_WINDOW_SCHEMA,
        audio_window_stats,
    )

    df = spark.createDataFrame(
        [
            (1, bytes([0, 1, 2]), 8000),      # odd → one 1-sample window
            (2, b"", 8000),                   # empty → no rows
            # max-pos, min-neg, max-pos: two sign flips, peak |−32768|
            (3, bytes([255, 127, 0, 128, 255, 127]), 8000),
        ],
        schema="item_id long, payload binary, sample_rate int",
    )
    out = audio_window_stats(df, window=256, max_windows=2)
    assert out.schema == AUDIO_WINDOW_SCHEMA
    rows = {r.item_id: r for r in out.collect()}
    assert set(rows) == {1, 3}
    assert rows[1].n_samples == 1  # byte 3 dropped by PCM16 framing
    assert rows[3].peak == 32768 and rows[3].zero_crossings == 2


# ---------------------------------------------------------------------------
# r9: real pixel inference path (stdlib PNG decode → bilinear resize →
# seeded conv net) — the O2 compute shape executed for real
# ---------------------------------------------------------------------------


def test_resize_bilinear_identity_and_range():
    import numpy as np

    from distributedvectordatabase_spark.operators.multimodal import resize_bilinear

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (9, 7))
    np.testing.assert_allclose(resize_bilinear(img, 9, 7), img, atol=1e-12)
    up = resize_bilinear(img, 18, 14)
    assert up.shape == (18, 14)
    assert up.min() >= img.min() - 1e-9 and up.max() <= img.max() + 1e-9
    # constant image stays exactly constant at any size
    const = np.full((5, 5), 42.0)
    np.testing.assert_allclose(resize_bilinear(const, 3, 11), 42.0)


def test_pixel_model_deterministic_and_normalized():
    import numpy as np

    from distributedvectordatabase_spark.operators.multimodal import make_pixel_model
    from distributedvectordatabase_spark.operators.png_codec import encode_png

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (12, 10, 3), dtype=np.uint8) for _ in range(3)]
    payloads = [encode_png(a) for a in imgs] + [encode_png(imgs[0])]
    fn = make_pixel_model(dim=16, seed=7)
    E1 = fn(payloads, 16)
    E2 = make_pixel_model(dim=16, seed=7)(payloads, 16)
    np.testing.assert_array_equal(E1, E2)              # fully deterministic
    np.testing.assert_allclose(np.linalg.norm(E1, axis=1), 1.0, atol=1e-12)
    np.testing.assert_array_equal(E1[0], E1[3])        # same pixels → same vec
    assert not np.allclose(E1[0], E1[1])               # different pixels differ
    # a different seed is a different model
    assert not np.allclose(E1, make_pixel_model(dim=16, seed=8)(payloads, 16))


def test_pixel_inference_end_to_end_knn_finds_duplicate(spark):
    """The full real pipeline through Spark: PNG payloads → stdlib
    decode → bilinear resize → conv featurizer → embeddings → exact
    kNN. A near-duplicate image (one pixel changed) must be its
    original's nearest non-self neighbor."""
    import numpy as np
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.knn import knn
    from distributedvectordatabase_spark.operators.multimodal import (
        infer_embeddings,
        make_pixel_model,
    )
    from distributedvectordatabase_spark.operators.png_codec import encode_png

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(6)]
    neardup = imgs[0].copy()
    neardup[3, 3] ^= 1
    rows = [(i, encode_png(a), "png", 16, 16) for i, a in enumerate(imgs)]
    rows.append((99, encode_png(neardup), "png", 16, 16))
    media = spark.createDataFrame(
        rows, "item_id long, payload binary, format string, width int, height int"
    ).repartition(4)
    emb = infer_embeddings(media, model_fn=make_pixel_model(dim=16, seed=3), dim=16)
    corpus = emb.select(F.col("item_id").alias("vec_id"), "embedding")
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    top = knn(corpus, queries, k=2, metric="cosine").orderBy("rnk").collect()
    assert top[0].neighbor_id == 0          # self
    assert top[1].neighbor_id == 99         # the near-duplicate


def test_real_decoder_jpeg_batch(spark):
    """Baseline JPEG through the Spark Arrow path: decoded brightness
    equals the stdlib decoder's luma exactly, and stays within lossy
    tolerance of the pre-encode source image."""
    import numpy as np

    from distributedvectordatabase_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from distributedvectordatabase_spark.operators.png_codec import luma

    rng = np.random.default_rng(21)
    rows, exact, approx = [], {}, {}
    for i, (sub, shape) in enumerate([(False, (16, 16, 3)), (True, (17, 13, 3)), (False, (9, 8))]):
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        payload = encode_jpeg(arr, quality=90, subsample=sub)
        rows.append((i, payload, "jpeg", shape[1], shape[0]))
        exact[i] = float(luma(decode_jpeg(payload)).mean() / 255.0)
        approx[i] = float(luma(arr).mean() / 255.0)
    media = spark.createDataFrame(
        rows, "item_id long, payload binary, format string, width int, height int"
    )
    got = {r.item_id: r.brightness for r in decode_stats(media, decoder="real").collect()}
    assert all(abs(got[k] - exact[k]) < 1e-12 for k in exact)
    assert all(abs(got[k] - approx[k]) < 0.03 for k in approx)  # lossy but close


def test_pixel_model_accepts_jpeg_and_png(spark):
    """make_pixel_model embeds the same underlying image encoded as PNG
    (lossless) and as JPEG q=95 (near-lossless) to nearby vectors —
    the decode dispatch is format-transparent."""
    import numpy as np

    from distributedvectordatabase_spark.operators.multimodal import make_pixel_model
    from distributedvectordatabase_spark.operators.jpeg_codec import encode_jpeg
    from distributedvectordatabase_spark.operators.png_codec import encode_png

    rng = np.random.default_rng(33)
    yy, xx = np.mgrid[:24, :24]
    img = (128 + 60 * np.sin(xx / 4) + 40 * np.cos(yy / 5)).clip(0, 255).astype(np.uint8)
    fn = make_pixel_model(dim=16, seed=9, size=16)
    E = fn([encode_png(img), encode_jpeg(img, quality=95)], 16)
    cos = float(E[0] @ E[1])
    assert cos > 0.999, cos
