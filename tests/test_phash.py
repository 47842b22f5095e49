"""Perceptual image hashing (r11): decode parity vs a serial
reference, near-duplicate tolerance under pixel perturbation, banded
Hamming recall, and the brightness-invariance property dHash exists
for."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import multimodal
from scicat_ingestor_spark.operators.dedup import banded_hamming_pairs


def _gray_ref(w: int, h: int) -> np.ndarray:
    """Closed-form gray grid of make_bmp(w, h) — (h, w) image order."""
    g = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            g[y, x] = sum((x * 7 + y * 13 + c * 29) % 256 for c in range(3))
    return g


def _bmp_with_pixels(px: np.ndarray) -> bytes:
    """Minimal 24-bit BMP around an (h, w, 3) uint8 array (bottom-up,
    4-byte stride) — the fixture for perturbation tests."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y].tobytes()
        rows += row + b"\x00" * (stride - len(row))
    data_off = 54
    size = data_off + len(rows)
    header = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return bytes(header + rows)


def test_gray_grid_matches_closed_form():
    for w, h in [(1, 1), (3, 7), (16, 16), (12, 5)]:
        payload = multimodal.make_bmp(w, h)
        got = multimodal.bmp_gray_grid(payload)
        assert got.shape == (h, w)
        assert np.array_equal(got, _gray_ref(w, h)), (w, h)


def test_dhash_is_brightness_invariant():
    rng = np.random.RandomState(7)
    base = rng.randint(0, 180, size=(32, 32, 3)).astype(np.uint8)
    brighter = np.clip(base.astype(np.int32) + 60, 0, 255).astype(np.uint8)
    g0 = multimodal.bmp_gray_grid(_bmp_with_pixels(base))
    g1 = multimodal.bmp_gray_grid(_bmp_with_pixels(brighter))
    # uniform (non-saturating) brightness shift preserves every
    # gradient sign — the property that makes dHash a dedup key
    assert multimodal.dhash64(g0) == multimodal.dhash64(g1)


def test_dhash_near_duplicate_small_hamming():
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
    perturbed = base.copy()
    perturbed[10, 10] = 255 - perturbed[10, 10]  # one pixel flipped
    h0 = multimodal.dhash64(multimodal.bmp_gray_grid(_bmp_with_pixels(base)))
    h1 = multimodal.dhash64(
        multimodal.bmp_gray_grid(_bmp_with_pixels(perturbed))
    )
    dist = sum(a != b for a, b in zip(h0, h1))
    assert dist <= 3  # one source pixel touches <= a couple of cells
    unrelated = rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
    h2 = multimodal.dhash64(
        multimodal.bmp_gray_grid(_bmp_with_pixels(unrelated))
    )
    assert sum(a != b for a, b in zip(h0, h2)) > 3


def test_banded_hamming_pairs_recall(spark):
    # signatures at controlled distances: full recall <= 3, cut > 3
    base = "01" * 32
    def flip(s, idxs):
        out = list(s)
        for i in idxs:
            out[i] = "0" if out[i] == "1" else "1"
        return "".join(out)

    rows = [
        (0, base),
        (1, flip(base, [5])),            # hamming 1
        (2, flip(base, [5, 20, 40])),    # hamming 3
        (3, flip(base, [1, 17, 33, 49])),  # hamming 4: one flip/band
        (4, flip(base, [0, 1, 2, 3, 4, 5, 6, 7])),  # hamming 8, one band
    ]
    sig = spark.createDataFrame(rows, "id long, sig string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in banded_hamming_pairs(sig, max_hamming=3).collect()
    }
    assert got[(0, 1)] == 1 and got[(0, 2)] == 3 and got[(1, 2)] == 2
    assert (0, 3) not in got  # verify filter cuts hamming 4
    assert (0, 4) not in got  # band agreement alone never admits > 3


def test_perceptual_hash_plan_is_scan_local(spark):
    docs = spark.range(64).select(F.col("id").alias("media_id"))

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        multimodal.make_bmp((int(i) % 16) + 1, 4)
                        for i in pdf["media_id"]
                    ],
                }
            )

    media = docs.mapInPandas(synth, schema="media_id long, payload binary")
    df = multimodal.perceptual_hash(media)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # decode + hash ride the scan
    row = df.filter(F.col("media_id") == 3).collect()[0]
    g = _gray_ref(4, 4)
    assert row["dhash"] == multimodal.dhash64(g)
    assert row["ahash"] == multimodal.ahash64(g)


def test_non_bmp_gates_cleanly():
    with pytest.raises(ValueError):
        multimodal.bmp_gray_grid(b"\x89PNG\r\n\x1a\nxxxx")
    with pytest.raises(NotImplementedError):
        multimodal.bmp_gray_grid(multimodal.make_bmp(4, 4, bpp=8))


def test_audio_fingerprint_properties(spark):
    """afp64 (r11): noise robustness (quantization-level perturbation
    rounds away), tone sensitivity, and the banded-Hamming join
    finding audio duplicates."""
    rng = np.random.RandomState(3)
    s0 = multimodal._wav_int16_samples(multimodal.make_wav_tones(4))
    noisy = s0 + rng.randint(-1, 2, size=s0.shape)  # +-1 LSB noise
    f0 = multimodal.afp64(s0)
    assert multimodal.afp64(noisy) == f0  # 3dp rounding absorbs it
    f1 = multimodal.afp64(
        multimodal._wav_int16_samples(multimodal.make_wav_tones(5))
    )
    assert f0 != f1

    rows = [(0, f0), (1, f0), (2, f1)]
    sig = spark.createDataFrame(rows, "id long, sig string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in banded_hamming_pairs(sig, max_hamming=3).collect()
    }
    assert (0, 1) in pairs


def test_audio_fingerprint_query_scan_local(spark):
    from scicat_ingestor_spark.queries import QUERIES

    df = QUERIES["audio_fingerprint"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # the fact repartition only
