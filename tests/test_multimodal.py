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


def _make_png(width: int, height: int) -> bytes:
    """A genuinely valid, decodable PNG built with stdlib only: 8-byte
    signature + IHDR + zlib IDAT (grayscale scanlines) + IEND, with real
    CRCs — any standards-compliant decoder opens it."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(
        b"\x00" + bytes(i % 256 for i in range(width)) for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_runs_real_branch_through_plumbing(spark):
    """The non-fake, non-raising DECODERS branch executes end-to-end:
    real PNG bytes ride the same attach -> mapInPandas decode plumbing
    and the parsed IHDR dimensions come back exact."""
    pngs = [(1, _make_png(7, 3)), (2, _make_png(64, 2))]
    df = spark.createDataFrame(pngs, "media_id long, payload binary").select(
        "media_id",
        "payload",
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/png").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )
    rows = multimodal.decode_media(df, decoder="png").orderBy("media_id").collect()
    assert [(r["width"], r["height"]) for r in rows] == [(7, 3), (64, 2)]
    assert rows[0]["feature_hash"] == hashlib.md5(pngs[0][1]).hexdigest()
    assert rows[0]["n_bytes"] == len(pngs[0][1])


def test_png_decoder_rejects_non_png(spark):
    """Garbage bytes through the png decoder fail the task (ValueError
    -> ingest failure channel), never decode silently."""
    df = _media(spark)  # text payloads, not PNGs
    with pytest.raises(Exception, match="not a PNG|ValueError"):
        multimodal.decode_media(df, decoder="png").collect()


def test_png_decoder_unit():
    png = _make_png(640, 480)
    d = multimodal._png_decode(png)
    assert (d["width"], d["height"]) == (640, 480)
    with pytest.raises(ValueError, match="bad signature"):
        multimodal._png_decode(b"JFIF" + png)
    with pytest.raises(ValueError, match="IHDR"):
        multimodal._png_decode(png[:8] + b"\x00\x00\x00\x08IDAT" + png[16:])
