"""Multimodal plumbing: schemas, batch iteration, determinism (decode is
a documented stub; the Spark-side contract is what's under test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zcurve_spark.sources.interleaved import explode_spans, interleaved_docs
from zcurve_spark.sources.media import FEATURE_DIM, extract_features, frame_sample, synth_media_blobs

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    spans = explode_spans(interleaved_docs(spark, SF_DIR))
    m = synth_media_blobs(spans).cache()
    m.count()
    return m


def test_blob_and_meta_shapes(media):
    r = media.select("media_ref", "blob", "meta").first()
    assert r.media_ref.startswith("m://")
    assert isinstance(r.blob, (bytes, bytearray)) and len(r.blob) == 48
    assert r.meta.media_type in ("image", "audio", "video")
    assert r.meta.width >= 1 and r.meta.height >= 1 and r.meta.duration_ms >= 1


def test_feature_extraction_contract(media):
    out = extract_features(media)
    assert dict(out.dtypes)["features"] == "array<float>"
    pdf = out.limit(50).toPandas()
    assert (pdf.features.map(len) == FEATURE_DIM).all()
    assert (pdf.n_bytes == 48).all()
    assert pdf.features.map(lambda f: all(0.0 <= v <= 1.0 for v in f)).all()


def test_feature_extraction_deterministic_and_partition_invariant(media):
    a = extract_features(media).orderBy("media_ref").limit(20).collect()
    b = extract_features(media.repartition(16)).orderBy("media_ref").limit(20).collect()
    assert [(r.media_ref, r.features) for r in a] == [(r.media_ref, r.features) for r in b]


def test_frame_sample(media):
    f = frame_sample(media, every_ms=10_000)
    pdf = f.limit(200).toPandas()
    assert (pdf.ts_ms % 10_000 == 0).all()
    assert (pdf.frame_idx >= 0).all()
    one = f.groupBy("media_ref").agg(F.max("ts_ms").alias("mx"), F.count(F.lit(1)).alias("n")).first()
    assert one.n == one.mx // 10_000 + 1


class TestRealWavCodec:
    """The audio decode path is REAL (stdlib RIFF/WAV parse + numpy DSP),
    not a hash fake — contract tests against locally computed features."""

    def test_wav_roundtrip_features(self):
        import numpy as np

        from zcurve_spark.sources.media import FEATURE_DIM, decode_wav, synth_wav_blob

        for seed in (0, 7, 123):
            blob = synth_wav_blob(seed)
            assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
            f = decode_wav(blob)
            assert f.shape == (FEATURE_DIM,)
            assert f[0] == 1.0                      # mono
            assert abs(f[1] - 8000 / 48000) < 1e-6  # sample rate
            assert abs(f[2] - 2048 / 8000) < 1e-6   # duration
            assert 0.1 < f[3] < 0.9                 # rms of the sine mix
            # determinism
            assert np.array_equal(f, decode_wav(synth_wav_blob(seed)))

    def test_decode_rejects_garbage(self):
        import pytest as _pytest

        from zcurve_spark.sources.media import decode_wav

        with _pytest.raises(Exception):
            decode_wav(b"not a wav payload at all")

    def test_extract_features_with_real_codec(self, spark):
        import pandas as pd

        from zcurve_spark.sources.media import (
            FEATURES_SCHEMA,
            codec_decode,
            decode_wav,
            extract_features,
            synth_wav_blob,
        )

        rows = [(f"m://{i}", bytearray(synth_wav_blob(i)), ("audio", 0, 0, 256)) for i in range(12)]
        df = spark.createDataFrame(
            rows,
            "media_ref string, blob binary, meta struct<media_type:string,width:int,height:int,duration_ms:int>",
        )
        out = extract_features(df, decode_fn=codec_decode).toPandas()
        assert len(out) == 12
        for r in out.itertuples():
            i = int(r.media_ref.split("/")[-1])
            expect = decode_wav(synth_wav_blob(i))
            assert list(map(float, r.features)) == list(map(float, expect))


class TestRealBmpCodec:
    """The image decode/resize path is REAL for 24-bit uncompressed BMP
    (struct container parse + numpy), not a hash fake."""

    def test_bmp_roundtrip_features(self):
        import numpy as np

        from zcurve_spark.sources.media import FEATURE_DIM, decode_bmp, synth_bmp_blob

        for seed in (0, 7, 123):
            blob = synth_bmp_blob(seed, width=32, height=24)
            assert blob[:2] == b"BM"
            f = decode_bmp(blob)
            assert f.shape == (FEATURE_DIM,)
            assert abs(f[0] - 32 / 4096) < 1e-6   # width
            assert abs(f[1] - 24 / 4096) < 1e-6   # height
            assert abs(f[2] - 0.5) < 0.02         # mean R of a 0..255 gradient
            assert abs(f[3] - 0.5) < 0.02         # mean G of a 0..255 gradient
            assert abs(sum(f[7:]) - 1.0) < 1e-5   # histogram fractions
            assert np.array_equal(f, decode_bmp(synth_bmp_blob(seed, width=32, height=24)))

    def test_bmp_pixel_exactness(self):
        import numpy as np

        from zcurve_spark.sources.media import _bmp_encode, _bmp_pixels

        # odd width forces row padding; encode->decode must be lossless
        pix = (np.arange(5 * 3 * 3, dtype=np.uint8)).reshape(3, 5, 3)
        assert np.array_equal(_bmp_pixels(_bmp_encode(pix)), pix)

    def test_bmp_rejects_garbage(self):
        import pytest as _pytest

        from zcurve_spark.sources.media import decode_bmp

        with _pytest.raises(Exception):
            decode_bmp(b"definitely not a bitmap")

    def test_resize_real(self):
        import numpy as np

        from zcurve_spark.sources.media import _bmp_pixels, resize_bmp, synth_bmp_blob

        blob = synth_bmp_blob(42, width=32, height=24)
        out = resize_bmp(blob, 8, 6)
        pix = _bmp_pixels(out)
        assert pix.shape == (6, 8, 3)
        # nearest-neighbor: every output pixel exists in the source
        src = _bmp_pixels(blob)
        yi = (np.arange(6) * 24) // 6
        xi = (np.arange(8) * 32) // 8
        assert np.array_equal(pix, src[yi][:, xi])

    def test_resize_images_operator(self, spark):
        from zcurve_spark.sources.media import _bmp_pixels, resize_images, synth_bmp_blob

        rows = [(f"m://img{i}", bytearray(synth_bmp_blob(i, width=16 + i, height=12 + i)))
                for i in range(8)]
        rows.append(("m://bad", bytearray(b"not an image")))
        df = spark.createDataFrame(rows, "media_ref string, blob binary")
        out = {r.media_ref: r for r in resize_images(df, 8, 8).collect()}
        assert len(out) == 9
        for i in range(8):
            r = out[f"m://img{i}"]
            assert (r.width, r.height) == (8, 8)
            assert _bmp_pixels(bytes(r.blob)).shape == (8, 8, 3)
        bad = out["m://bad"]
        assert (bad.width, bad.height) == (-1, -1)
        assert bytes(bad.blob) == b"not an image"

    def test_extract_features_dispatch_image(self, spark):
        from zcurve_spark.sources.media import (
            codec_decode,
            decode_bmp,
            extract_features,
            synth_bmp_blob,
        )

        rows = [(f"m://{i}", bytearray(synth_bmp_blob(i)), ("image", 32, 24, 0)) for i in range(6)]
        df = spark.createDataFrame(
            rows,
            "media_ref string, blob binary, meta struct<media_type:string,width:int,height:int,duration_ms:int>",
        )
        out = extract_features(df, decode_fn=codec_decode).toPandas()
        assert len(out) == 6
        for r in out.itertuples():
            i = int(r.media_ref.split("/")[-1])
            expect = decode_bmp(synth_bmp_blob(i))
            assert list(map(float, r.features)) == list(map(float, expect))
