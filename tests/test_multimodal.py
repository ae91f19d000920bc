"""X8 multimodal plumbing: binary columns + mapInPandas featurize +
frame-sample plan. Codecs are stubbed (none in this container); the
Spark-side schema/batching/partitioning is real and pinned here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_realtime_edu_spark.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_image,
    demo_media_frame,
    extract_features,
    frame_sample_plan,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    df = demo_media_frame(spark, n=64, partitions=4)
    df.cache().count()
    return df


def test_feature_extraction_schema_and_determinism(media):
    feats = extract_features(media, n_bins=16)
    assert feats.schema == FEATURE_SCHEMA
    rows1 = {r.media_id: r.feature for r in feats.collect()}
    rows2 = {r.media_id: r.feature for r in feats.collect()}
    assert rows1 == rows2  # deterministic across runs
    assert len(rows1) == 64
    for vec in rows1.values():
        assert len(vec) == 16
        assert abs(sum(vec) - 1.0) < 1e-9  # normalized histogram


def test_feature_extraction_repartition_invariant(media):
    a = {r.media_id: r.feature for r in extract_features(media).collect()}
    b = {
        r.media_id: r.feature
        for r in extract_features(media.repartition(13)).collect()
    }
    assert a == b  # partition-local op → partitioning can't change values


def test_metadata_only_query_needs_no_payload(media):
    # Column pruning: a metadata rollup must not touch payload bytes.
    counts = media.groupBy("modality").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in counts) == 64
    plan = media.groupBy("modality").count()._jdf.queryExecution().toString()
    physical = plan.split("Physical Plan")[-1].splitlines()
    # payload may only appear at the leaf scan (an in-memory RDD can't
    # prune at the source; parquet would) — every operator above must
    # project it away before the first exchange.
    leaves = ("Scan ExistingRDD", "InMemoryRelation")
    offenders = [
        ln
        for ln in physical
        if "payload" in ln and not any(leaf in ln for leaf in leaves)
    ]
    assert not offenders, offenders


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_nth=10)
    rows = plan.collect()
    assert all(r.frame_index % 10 == 0 for r in rows)
    n_videos = media.filter(F.col("modality") == "video").count()
    assert {r.media_id for r in rows} == {
        r.media_id for r in media.filter(F.col("modality") == "video").collect()
    }
    assert len(rows) >= n_videos


def test_decode_stub_raises(media):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "image/png")


def test_resize_stage_composes_and_preserves_schema(media):
    resized = resize_images(media, width=32, height=48)
    assert resized.schema == MEDIA_SCHEMA  # stages compose
    rows = {r.media_id: r for r in resized.collect()}
    orig = {r.media_id: r for r in media.collect()}
    assert rows.keys() == orig.keys()
    for mid, r in rows.items():
        if r.modality == "image":
            assert (r.width, r.height) == (32, 48)
            assert bytes(r.payload) != bytes(orig[mid].payload)
        else:  # pass-through for non-images
            assert bytes(r.payload) == bytes(orig[mid].payload)
            assert (r.width, r.height) == (orig[mid].width, orig[mid].height)
    # deterministic + partitioning-invariant, and feeds the featurizer
    again = {r.media_id: bytes(r.payload)
             for r in resize_images(media.repartition(7), width=32, height=48).collect()}
    assert {m: bytes(r.payload) for m, r in rows.items()} == again
    feats = extract_features(resize_images(media, width=32, height=48))
    assert feats.count() == len(rows)
