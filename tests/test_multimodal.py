"""Multimodal plumbing tests: binary payloads + typed metadata + Arrow
feature extraction (stubbed kernel, real Spark mechanics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators.multimodal import (
    attach_media_metadata,
    extract_features,
    frame_sample,
)


def _media_df(spark, n=20):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_metadata_struct_schema(spark):
    df = attach_media_metadata(_media_df(spark))
    f = dict(zip(df.schema.fieldNames(), df.schema.fields))["media_meta"]
    names = [x.name for x in f.dataType.fields]
    assert names == ["format", "width", "height", "n_frames", "sample_rate"]
    rows = df.collect()
    assert all(r["media_meta"]["format"] in {"jpeg", "png", "wav", "mp4"} for r in rows)


def test_extract_features_deterministic(spark):
    df = _media_df(spark)
    a = {r["id"]: r["features"] for r in extract_features(df, dim=8).collect()}
    b = {r["id"]: r["features"] for r in extract_features(df, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    # different payloads → different features
    assert a[0] != a[1]


def test_frame_sample_indices(spark):
    df = attach_media_metadata(_media_df(spark))
    out = frame_sample(df, every_nth=30).collect()
    for r in out:
        n = r["media_meta"]["n_frames"]
        assert list(r["sampled_frames"]) == list(range(0, n, 30))
