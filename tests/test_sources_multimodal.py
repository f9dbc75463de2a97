"""Bulk import (json/csv/parquet/numpy) + multimodal plumbing tests."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from milvus_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    image_features,
    make_media_table,
)
from milvus_spark.sources.bulk_import import (
    read_csv,
    read_json,
    read_numpy,
    read_parquet,
    validate_ingest,
)


@pytest.fixture()
def scratch():
    d = tempfile.mkdtemp(prefix="imp_", dir="/root/repo/_scratch")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ]
)


@pytest.fixture()
def sample(spark):
    rows = [(i, f"n{i}", [float(i), float(i) + 0.5]) for i in range(50)]
    return spark.createDataFrame(rows, SCHEMA)


def _sorted(df):
    return [(r.id, r.name, r.vec) for r in df.orderBy("id").collect()]


def test_json_roundtrip(spark, sample, scratch):
    p = os.path.join(scratch, "j")
    sample.write.json(p)
    assert _sorted(read_json(spark, p, SCHEMA)) == _sorted(sample)


def test_parquet_roundtrip(spark, sample, scratch):
    p = os.path.join(scratch, "p")
    sample.write.parquet(p)
    assert _sorted(read_parquet(spark, p, SCHEMA)) == _sorted(sample)


def test_csv_with_vector_encoding(spark, sample, scratch):
    p = os.path.join(scratch, "c")
    sample.select("id", "name", F.concat_ws(";", F.col("vec")).alias("vec")).write.option(
        "header", "true"
    ).csv(p)
    assert _sorted(read_csv(spark, p, SCHEMA)) == _sorted(sample)


def test_numpy_import(spark, scratch):
    d = os.path.join(scratch, "npy")
    os.makedirs(d)
    np.save(os.path.join(d, "id.npy"), np.arange(20, dtype=np.int64))
    np.save(os.path.join(d, "name.npy"), np.array([f"n{i}" for i in range(20)]))
    np.save(os.path.join(d, "vec.npy"), np.random.RandomState(0).rand(20, 4))
    df = read_numpy(spark, d, SCHEMA)
    assert df.count() == 20
    assert len(df.filter("id = 3").collect()[0].vec) == 4


def test_validate_ingest(spark, sample):
    validate_ingest(sample, vector_field="vec", dim=2, varchar_limits={"name": 10})
    with pytest.raises(ValueError):
        validate_ingest(sample, vector_field="vec", dim=3)
    with pytest.raises(ValueError):
        validate_ingest(sample, vector_field="vec", dim=1)  # dim < 2 invalid
    with pytest.raises(ValueError):
        validate_ingest(sample, varchar_limits={"name": 1})


def test_multimodal_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = make_media_table(docs, "doc_id", "text")
    feats = image_features(media, "media", "doc_id")
    rows = feats.orderBy("doc_id").limit(5).collect()
    assert len(rows) == 5
    assert all(len(r.thumb) == 16 for r in rows)
    assert all(r.phash >= 0 for r in rows)
    # deterministic: same input → same features
    again = image_features(media, "media", "doc_id").orderBy("doc_id").limit(5).collect()
    assert [r.thumb for r in rows] == [r.thumb for r in again]

    frames = frame_sample(media, "media", "doc_id", "media_len")
    f0 = frames.filter("doc_id = 0").collect()
    assert f0 and all(len(r.frame_vec) == 4 for r in f0)

    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has("PIL"), reason="Pillow not installed")
def test_real_image_codec_path(spark):
    """When Pillow IS present, fake=False decodes a real PNG through the
    same mapInPandas plumbing with the same schema/shape."""
    import io

    from PIL import Image

    from milvus_spark.operators.multimodal import THUMB_H, THUMB_W, decode_image, image_features

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    px = decode_image(png, fake=False)
    assert len(px) == THUMB_W * THUMB_H and all(0.0 <= v <= 1.0 for v in px)
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, media binary")
    rows = image_features(df, "media", "doc_id", fake=False).collect()
    assert len(rows) == 1 and len(rows[0].thumb) == THUMB_W * THUMB_H


@pytest.mark.skipif(not _has("soundfile"), reason="soundfile not installed")
def test_real_audio_codec_path(spark):
    import io
    import struct
    import wave

    from milvus_spark.operators.multimodal import AUDIO_FRAMES, audio_features, decode_audio

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(struct.pack("<h", (i % 100) * 300 - 15000) for i in range(800)))
    wav = buf.getvalue()
    fb = decode_audio(wav, fake=False)
    assert len(fb) == AUDIO_FRAMES and all(0.0 <= v <= 1.0 for v in fb)
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, media binary")
    rows = audio_features(df, "media", "doc_id", fake=False).collect()
    assert len(rows) == 1 and len(rows[0].fbank) == AUDIO_FRAMES


@pytest.mark.skipif(_has("PIL") or _has("soundfile"), reason="codec libs present")
def test_codecless_container_raises(spark):
    from milvus_spark.operators.multimodal import decode_audio, decode_image

    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"xx", fake=False)
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"xx", fake=False)
