"""Multimodal plumbing: schema, Arrow batch path, determinism, stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators import multimodal as MM


def test_media_table_schema(spark, sf_dir):
    media = MM.synth_media_table(spark, sf_dir)
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<kind:string,width:int")
    assert media.count() > 0


def test_feature_extract_shape_and_determinism(spark, sf_dir):
    media = MM.synth_media_table(spark, sf_dir)
    feats = MM.extract_features(media)
    rows = feats.orderBy("doc_id").limit(5).collect()
    for r in rows:
        assert len(r.features) == MM.FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r.features)
        assert r.byte_len > 0
    again = MM.extract_features(media).orderBy("doc_id").limit(5).collect()
    assert [r.features for r in rows] == [r.features for r in again]


def test_resize_rewrites_meta_only(spark, sf_dir):
    media = MM.synth_media_table(spark, sf_dir)
    resized = MM.resize_images(media, 32, 32)
    r = resized.first()
    assert r.meta.width == 32 and r.meta.height == 32
    assert r.meta.kind == "image"
    # payload untouched
    orig = media.where(F.col("doc_id") == r.doc_id).first()
    assert bytes(r.payload) == bytes(orig.payload)


def test_sample_frames_fanout(spark, sf_dir):
    media = MM.synth_media_table(spark, sf_dir)
    frames = MM.sample_frames(media, every_n=10)
    r = frames.groupBy("doc_id").count().first()
    assert r["count"] >= 1
    assert frames.where(F.col("frame_idx") % 10 != 0).count() == 0


def test_real_decode_is_explicit_stub():
    if MM.HAS_PIL:
        pytest.skip("PIL present; stub path not applicable")
    with pytest.raises(NotImplementedError):
        MM.decode_real(b"bytes", "image")


def test_sample_frames_zero_and_null_frame_videos_drop_not_throw(spark, sf_dir):
    """r8 guard: sequence(0, n_frames-1, step) THROWS for n_frames=0 under
    a positive step — a truncated/corrupt video row must contribute zero
    sampled frames, not fail the job; null n_frames likewise drops."""
    media = MM.synth_media_table(spark, sf_dir)
    schema = media.schema
    broken = spark.createDataFrame(
        [
            ("vid_zero", bytearray(b"x"), {"kind": "video", "n_frames": 0}),
            ("vid_null", bytearray(b"x"), {"kind": "video", "n_frames": None}),
            ("vid_ok", bytearray(b"x"), {"kind": "video", "n_frames": 25}),
        ],
        "doc_id string, payload binary, meta map<string,string>",
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.col("meta.kind").alias("kind"),
            F.col("meta.n_frames").cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    frames = MM.sample_frames(broken, every_n=10)
    got = {r.doc_id: r.frame_idx for r in frames.collect()}
    assert "vid_zero" not in got and "vid_null" not in got
    assert frames.where(F.col("doc_id") == "vid_ok").count() == 3  # 0,10,20
