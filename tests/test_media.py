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
