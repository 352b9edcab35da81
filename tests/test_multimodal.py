"""Multimodal-plumbing tests: the codec is a deterministic fake (the
real libraries are not in this environment — real_decode raises), but
everything Spark-level is asserted for real: schemas, the mapInPandas
batch contract, flat-map fanout, and that the binary payload column is
pruned from scans that don't touch it.
"""

import pytest

from pyspark.sql import functions as F

from covid_engineering_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    real_decode,
    resize_images,
    sample_frames,
    with_media_columns,
)
from covid_engineering_spark.sources import read_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return with_media_columns(read_table(spark, SF_SMOKE, "documents")).cache()


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG", "image/png")


def test_feature_extract_matches_fake_decoder(spark, media):
    rows = extract_features(media).filter(F.col("doc_id") < 5).collect()
    raw = {r.doc_id: (bytes(r.payload), r.media_type) for r in media.filter(F.col("doc_id") < 5).collect()}
    assert len(rows) == len(raw)
    for r in rows:
        payload, mt = raw[r.doc_id]
        want = fake_decode(payload, mt)
        assert (r.n_bytes, r.checksum, r.width, r.height) == (
            want["n_bytes"],
            want["checksum"],
            want["width"],
            want["height"],
        )
        assert r.media_type == mt


def test_resize_respects_target_budget(spark, media):
    out = resize_images(media, width=32, height=32).collect()
    assert out  # images exist in the modality mix
    for r in out:
        assert (r.width, r.height) == (32, 32)
        assert 1 <= len(r.frame_payload if hasattr(r, "frame_payload") else r.payload) <= 32 * 32 // 8


def test_frame_sampling_fans_out(spark, media):
    vids = media.filter(F.col("media_type") == "video/mp4")
    frames = sample_frames(vids, every_n_bytes=64, max_frames=4)
    per_doc = (
        frames.groupBy("doc_id").agg(F.count("*").alias("n"), F.max("frame_idx").alias("mx"))
    ).collect()
    assert per_doc
    for r in per_doc:
        assert 1 <= r.n <= 4
        assert r.mx == r.n - 1  # frame indices are dense from 0


def test_payload_pruned_when_untouched(spark):
    # The scale rule the data model exists for: metadata-only queries
    # must not decode the (huge) binary column. 'text' feeds payload,
    # so a meta-only projection reads neither payload's source nor the
    # binary itself.
    from covid_engineering_spark.plans import read_schemas

    # the cached fixture would substitute an InMemoryRelation for this
    # identical plan subtree, hiding the FileScan under audit
    spark.catalog.clearCache()
    media = with_media_columns(read_table(spark, SF_SMOKE, "documents"))
    meta_only = media.select("doc_id", "media_type", "meta.origin")
    schemas = read_schemas(meta_only)
    assert len(schemas) == 1
    assert "text" not in schemas[0]


def test_corpus_is_ascii_the_oracle_byte_equivalence_precondition(spark):
    # The mm_feature_extract oracle folds the checksum over CHARACTERS
    # (ascii codes); fake_decode folds over UTF-8 BYTES. These agree
    # exactly when the corpus is pure ASCII — assert it, so a future
    # non-ASCII corpus fails loudly here instead of hash-mismatching.
    from pyspark.sql import functions as F

    from covid_engineering_spark.sources import read_table
    from tests.conftest import SF_ORACLE

    docs = read_table(spark, SF_ORACLE, "documents")
    non_ascii = docs.filter(
        F.length(F.col("text")) != F.length(F.encode("text", "UTF-8"))
    ).count()
    assert non_ascii == 0
