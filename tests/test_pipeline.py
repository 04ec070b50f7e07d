"""End-to-end resumable pipeline: correct results, manifests written,
resume skips completed stages, span invariant preserved through the
sorted checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zcurve_spark.pipeline import run_pipeline
from zcurve_spark.sources.interleaved import explode_spans, interleaved_docs, with_span_geo
from zcurve_spark.sources.manifest import load_manifest

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    wd = str(tmp_path / "work")
    out1 = run_pipeline(spark, SF_DIR, wd, n_partitions=8)
    # ground truth from a direct (non-checkpointed) computation
    spans = with_span_geo(explode_spans(interleaved_docs(spark, SF_DIR)), bits=30)
    n_spans = spans.count()
    assert out1["spans"] == n_spans
    assert out1["tiles"] > 0 and out1["span_files"] == 8
    # box counts vs brute force on qx/qy
    from zcurve_spark.pipeline import _fingerprint  # noqa: F401

    pdf = spans.select("qx", "qy").toPandas()
    n = 1 << 30
    for qid, cnt in out1["box_counts"].items():
        i = int(qid)
        x0 = (i * n // 16) % (n - n // 8)
        y0 = (i * n // 8 + n // 5) % (n - n // 8)
        x1, y1 = x0 + n // 8 - 1, y0 + n // 8 - 1
        exp = int(((pdf.qx >= x0) & (pdf.qx <= x1) & (pdf.qy >= y0) & (pdf.qy <= y1)).sum())
        assert cnt == exp, (qid, cnt, exp)
    m1 = load_manifest(f"{wd}/spans_sorted")
    created1 = m1["created_unix"]

    # resume: same fingerprint -> stages skipped (manifest untouched)
    out2 = run_pipeline(spark, SF_DIR, wd, n_partitions=8)
    m2 = load_manifest(f"{wd}/spans_sorted")
    assert m2["created_unix"] == created1, "stage must not recompute on resume"
    assert out2["spans"] == out1["spans"]
    assert out2["box_counts"] == out1["box_counts"]


def test_pipeline_manifest_has_lineage_and_stats(spark, tmp_path):
    wd = str(tmp_path / "work2")
    run_pipeline(spark, SF_DIR, wd, n_partitions=4)
    m = load_manifest(f"{wd}/spans_sorted")
    assert m["lineage"]["stage"] == "spans_sorted"
    assert m["lineage"]["fingerprint"]
    assert all(f["zkey_min"] is not None for f in m["files"])
    # sorted layout: per-file zkey ranges must not overlap
    spans = sorted((f["zkey_min"], f["zkey_max"]) for f in m["files"])
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0
