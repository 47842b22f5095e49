"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Design: media payloads ride as ``binary`` columns with a
``media_meta STRUCT<kind, mime, width, height, sample_rate, n_frames>``
sidecar. Decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over ``mapInPandas`` — the Spark-side
plumbing (schema, partitioning, batch shape) is real; the actual codec
call is stubbed (image/audio libraries are not in this container) behind
``DECODERS`` with a deterministic fake so plans and tests are exact.

At scale: payload columns are large — partition sizing must come from
``spark.sql.files.maxPartitionBytes`` on the parquet side, and decode
stages should be late (after all relational filtering) so bytes never
shuffle; ``mapInPandas`` preserves partitioning (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "kind string, mime string, width int, height int, sample_rate int, n_frames int"
)

DECODE_OUT_SCHEMA = (
    "media_id long, kind string, width int, height int, feature_hash string, n_bytes long"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode.

    A real deployment registers e.g. a PIL/torchvision decoder in
    ``DECODERS``; shape of the returned record is the contract.
    """
    digest = hashlib.md5(payload).hexdigest()
    return {
        "width": int(digest[:2], 16) + 1,
        "height": int(digest[2:4], 16) + 1,
        "feature_hash": digest,
    }


def _unavailable_decode(payload: bytes) -> dict:
    raise NotImplementedError(
        "real media codecs are not installed in this environment; "
        "register a decoder in DECODERS"
    )


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_decode(payload: bytes) -> dict:
    """REAL decoder, stdlib-only: parse the PNG signature and IHDR chunk
    (width/height — the header every PNG must start with, per the PNG
    spec: 8-byte signature, then the IHDR chunk at offset 8 with
    big-endian u32 width at byte 16 and height at 20). Malformed input
    raises ValueError -> the task fails -> the file lands in the ingest
    failure channel, same contract as a malformed NeXus file (V3/T4).

    This is the registry's proof that the NotImplementedError entries
    are gates, not the only possible behavior: the identical Arrow-
    batched mapInPandas plumbing runs a real codec when one is
    registered."""
    import struct

    if len(payload) < 24 or payload[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    length, chunk = struct.unpack(">I4s", payload[8:16])
    if chunk != b"IHDR" or length < 8:
        raise ValueError("not a PNG: first chunk is not IHDR")
    width, height = struct.unpack(">II", payload[16:24])
    if not width or not height:
        raise ValueError("not a PNG: zero dimension")
    return {
        "width": width,
        "height": height,
        "feature_hash": hashlib.md5(payload).hexdigest(),
    }


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "fake": _fake_decode,
    "png": _png_decode,  # real stdlib decoder (IHDR header parse)
    "image": _unavailable_decode,  # swap in PIL.Image.open in production
    "audio": _unavailable_decode,
    "video": _unavailable_decode,
}


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test harness: treat a text column's bytes as the media payload and
    attach typed metadata, the way a real multimodal table would arrive."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched decode via mapInPandas: (media_id, payload, meta) ->
    DECODE_OUT_SCHEMA rows. Partition-preserving; codec runs next to the
    data."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["media_meta"].map(lambda m: m["kind"])
            decoded = pdf["payload"].map(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "width": decoded.map(lambda d: d["width"]),
                    "height": decoded.map(lambda d: d["height"]),
                    "feature_hash": decoded.map(lambda d: d["feature_hash"]),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return df.mapInPandas(run, schema=DECODE_OUT_SCHEMA)


FEATURES_OUT_SCHEMA = "media_id long, feature array<float>"


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real feature extractor (CLIP-style
    embedding): sha256 bytes stretched over ``dim`` floats in [-1, 1).
    A real deployment swaps in the model forward pass; the Spark-side
    contract — `array<float>` of fixed dim, Arrow batch transfer, no
    shuffle — is what the tests pin."""
    digest = b""
    while len(digest) < dim * 2:
        digest += hashlib.sha256(payload + bytes([len(digest) % 256])).digest()
    return [
        (int.from_bytes(digest[2 * d : 2 * d + 2], "big") / 32768.0) - 1.0
        for d in range(dim)
    ]


def _unavailable_features(payload: bytes, dim: int) -> list[float]:
    raise NotImplementedError(
        "no embedding model in this environment; register one in EXTRACTORS"
    )


EXTRACTORS: dict[str, Callable[[bytes, int], list[float]]] = {
    "fake": _fake_features,
    "clip": _unavailable_features,  # swap in a model forward pass
}


def extract_features(
    df: DataFrame, dim: int = 64, extractor: str = "fake"
) -> DataFrame:
    """Feature-extract stage: (media_id, payload) -> (media_id,
    feature array<float>), Arrow-batched mapInPandas, partition-
    preserving. Output feeds ``operators.similarity`` directly
    (brute-force / LSH / IVF ANN over the extracted embeddings)."""
    extract = EXTRACTORS[extractor]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": pdf["payload"].map(
                        lambda b: _as_float32(extract(bytes(b), dim))
                    ),
                }
            )

    return df.mapInPandas(run, schema=FEATURES_OUT_SCHEMA)


def _as_float32(values: list[float]) -> list[float]:
    import numpy as np

    return np.asarray(values, dtype=np.float32).tolist()


RESIZE_OUT_SCHEMA = (
    "media_id long, width int, height int, payload binary, n_bytes long"
)


def resize_media(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: Arrow-batched mapInPandas producing fixed-size
    payloads with updated dimensions. The deterministic stand-in clips /
    tiles the source bytes to ``target_w * target_h``; a real deployment
    swaps the body for the codec's resample call — schema, batch shape
    and partition behavior (no shuffle) are identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: (bytes(b) * (n_out // max(len(b), 1) + 1))[:n_out]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": resized,
                    "n_bytes": resized.map(len),
                }
            )

    return df.mapInPandas(run, schema=RESIZE_OUT_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode a (stubbed) frame index list and
    keep every Nth frame — the real variant replaces the index generator
    with the container demuxer inside the same mapInPandas stage."""
    decoded = decode_media(df)
    return (
        decoded.select(
            "media_id",
            F.explode(F.sequence(F.lit(0), (F.col("width") % 16))).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )
