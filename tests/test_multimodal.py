"""Multimodal column plumbing: binary payloads + typed metadata through
Arrow-batched mapInPandas stages (decode / resize / frame-sample)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import multimodal


def _media(spark):
    df = spark.createDataFrame(
        [(1, "alpha payload"), (2, "beta"), (3, "gamma bytes here")],
        "doc_id long, text string",
    )
    return multimodal.attach_binary_payload(df, "text", "doc_id")


def test_decode_schema_and_determinism(spark):
    out = multimodal.decode_media(_media(spark)).orderBy("media_id")
    rows = out.collect()
    assert out.columns == ["media_id", "kind", "width", "height", "feature_hash", "n_bytes"]
    assert [r["n_bytes"] for r in rows] == [13, 4, 16]
    # the fake decode is content-addressed: same payload -> same features
    expect = hashlib.md5(b"alpha payload").hexdigest()
    assert rows[0]["feature_hash"] == expect
    assert rows[0]["width"] == int(expect[:2], 16) + 1


def test_real_decoder_is_gated_not_silently_fake(spark):
    out = multimodal.decode_media(_media(spark), decoder="image")
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        out.collect()


def test_resize_fixes_dimensions_and_payload_size(spark):
    out = multimodal.resize_media(_media(spark), 8, 4).orderBy("media_id")
    rows = out.collect()
    assert {(r["width"], r["height"]) for r in rows} == {(8, 4)}
    assert all(r["n_bytes"] == 32 and len(bytes(r["payload"])) == 32 for r in rows)
    # deterministic: tiling of the source bytes
    assert bytes(rows[1]["payload"]) == (b"beta" * 9)[:32]


def test_resize_preserves_partitioning(spark):
    src = _media(spark).repartition(3)
    out = multimodal.resize_media(src, 4, 4)
    assert out.rdd.getNumPartitions() == 3  # mapInPandas adds no shuffle


def test_frame_sample_stride(spark):
    out = multimodal.frame_sample(_media(spark), every_n=2)
    rows = out.collect()
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    assert len(rows) > 0


def test_extract_features_shape_and_determinism(spark):
    out = multimodal.extract_features(_media(spark), dim=16).orderBy("media_id")
    rows = out.collect()
    assert out.columns == ["media_id", "feature"]
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(-1.0 <= x < 1.0 for r in rows for x in r["feature"])
    # content-addressed: re-running produces identical embeddings
    again = multimodal.extract_features(_media(spark), dim=16).orderBy("media_id")
    assert [r["feature"] for r in again.collect()] == [r["feature"] for r in rows]


def test_extract_features_feeds_ann(spark):
    from scicat_ingestor_spark.operators import similarity

    feats = multimodal.extract_features(_media(spark), dim=16).select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").cast("array<double>").alias("embedding"),
    )
    queries = feats.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    top = similarity.brute_force_topk(feats, queries, k=1).collect()
    # nearest neighbor of a corpus vector is itself at cosine 1
    assert top[0]["neighbor_id"] == top[0]["query_id"]
    assert abs(top[0]["cosine"] - 1.0) < 1e-6


def test_real_extractor_is_gated_not_silently_fake(spark):
    with pytest.raises(Exception, match="NotImplementedError|no embedding model"):
        multimodal.extract_features(_media(spark), dim=8, extractor="clip").collect()
