"""Cross-modal near-dup over the interleaved document shape: a planted
duplicate document must be caught by BOTH the text path (SimHash over
its text spans) and the image path (pHash over images fetched by its
media_refs) — the production sweep a 10^12-doc multimodal training
pipeline runs, wired end-to-end on the real input_hint schema.

Media blobs here are materialized per DISTINCT media_ref (the object-
store-fetch analog: the span table carries refs, a second table carries
payloads), so duplicate docs referencing the same media dedup through
the ref join without re-decoding anything."""

from __future__ import annotations

from pyspark.sql import functions as F

from zcurve_spark.operators.dedup import banded_hamming_pairs, simhash_fingerprints
from zcurve_spark.operators.imagehash import image_phash, synth_patch_pixels
from zcurve_spark.sources.interleaved import explode_spans, interleaved_docs
from tests.conftest import SF_DIR


def _docs_with_planted_dup(spark):
    """Interleaved docs + every 7th doc re-inserted verbatim (same
    spans, same media_refs) under numeric id + 900000.  doc_id is the
    input_hint's 'docNNNNNNNN' string; `_doc_num` carries the number."""
    docs = interleaved_docs(spark, SF_DIR)
    dups = (
        docs.filter(F.col("_doc_num") % 7 == 0)
        .withColumn("_doc_num", F.col("_doc_num") + 900_000)
        .withColumn(
            "doc_id",
            F.concat(F.lit("doc"), F.lpad(F.col("_doc_num").cast("string"), 8, "0")),
        )
    )
    return docs.unionByName(dups), docs


def _doc_num(col="doc_id"):
    """Numeric id out of the 'docNNNNNNNN' string."""
    return F.substring(F.col(col), 4, 10).cast("long")


def _media_blobs_for(spans):
    """One PNG per DISTINCT media_ref, content seeded by the ref hash —
    the deterministic object-store stand-in."""
    import pandas as pd

    from zcurve_spark.sources.media import png_encode

    refs = (
        spans.filter(F.col("kind") == "media")
        .select("media_ref")
        .distinct()
        .withColumn("ref_seed", F.abs(F.xxhash64("media_ref")) % 1_000_000)
    )

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "blob": [
                        png_encode(synth_patch_pixels(int(s)), filter_type=0)
                        for s in pdf["ref_seed"]
                    ],
                }
            )

    return refs.mapInPandas(op, "media_ref string, blob binary")


def test_planted_dup_caught_by_both_modalities(spark):
    alld, base = _docs_with_planted_dup(spark)
    spans = explode_spans(alld)

    # --- text path: concat a doc's text spans -> SimHash -> hamming-0
    # pairs (exact dup fingerprints are identical) ---
    doc_text = (
        spans.filter(F.col("kind") == "text")
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
    )
    fps = simhash_fingerprints(doc_text, id_col="doc_id", text_col="text")
    # doc_id is a STRING in the input_hint schema; fingerprint ids pass
    # through untouched, so cast for the pair join arithmetic
    text_pairs = {
        (int(r["a_id"]), int(r["b_id"]))
        for r in banded_hamming_pairs(
            fps.select(_doc_num("id").alias("id"), "sh"),
            bits=48,
            max_hamming=0,
            fp_col="sh",
        ).collect()
    }
    planted = {
        int(r["_doc_num"])
        for r in base.filter(F.col("_doc_num") % 7 == 0).select("_doc_num").collect()
    }
    text_planted = {(a, b) for a, b in text_pairs if b == a + 900_000}
    # every planted doc that has at least one text span is caught
    docs_with_text = {
        int(r["_doc_num"])
        for r in spans.filter(F.col("kind") == "text")
        .select("_doc_num")
        .distinct()
        .collect()
    }
    assert {a for a, _ in text_planted} == planted & docs_with_text

    # --- image path: distinct media_refs -> blobs -> pHash; a doc pair
    # sharing a ref shares the hash row itself, so the dup document's
    # media needs NO second decode — the ref join is the dedup ---
    media = spans.filter(F.col("kind") == "media").select("doc_id", "media_ref")
    blobs = _media_blobs_for(spans)
    ph = image_phash(
        blobs.withColumn("img_id", F.abs(F.xxhash64("media_ref"))),
        id_col="img_id",
    )
    assert ph.count() == blobs.count()  # one hash per distinct ref
    # doc pairs sharing >= 1 media_ref (planted dups share ALL refs)
    a = media.select(_doc_num().alias("a_id"), "media_ref")
    b = media.select(_doc_num().alias("b_id"), "media_ref")
    shared = (
        a.join(b, "media_ref")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    img_planted = {
        (r["a_id"], r["b_id"])
        for r in shared.filter(F.col("b_id") == F.col("a_id") + 900_000).collect()
    }
    docs_with_media = {
        int(r["_doc_num"])
        for r in spans.filter(F.col("kind") == "media")
        .select("_doc_num")
        .distinct()
        .collect()
    }
    assert {a for a, _ in img_planted} == planted & docs_with_media

    # --- union verdict: every planted doc is caught by at least one
    # modality (docs have >= 1 span, so one of the two sets covers it) ---
    caught = {a for a, _ in text_planted} | {a for a, _ in img_planted}
    assert caught == planted


def test_span_sequence_invariant_survives_media_join(spark):
    """The (kind, text, media_ref, order) invariant must hold after the
    media join — reassembling from the joined span relation yields the
    original arrays."""
    from zcurve_spark.sources.interleaved import reassemble

    docs = interleaved_docs(spark, SF_DIR)
    spans = explode_spans(docs)
    blobs = _media_blobs_for(spans)
    joined = spans.join(blobs, "media_ref", "left")
    back = reassemble(joined.select(spans.columns))
    orig = {r["doc_id"]: r["spans"] for r in docs.collect()}
    got = {r["doc_id"]: r["spans"] for r in back.collect()}
    assert got == orig
