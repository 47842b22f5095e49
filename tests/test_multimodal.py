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


def test_jpeg_decoder_unit():
    """SOF walk: skips APP0/COM segments, honors standalone markers,
    reads the frame header of SOF0 and SOF2, rejects malformed input."""
    jpg = multimodal.make_jpeg(1920, 1080)
    d = multimodal._jpeg_decode(jpg)
    assert (d["format"], d["width"], d["height"]) == ("jpeg", 1920, 1080)
    # progressive (SOF2) parses the same frame header
    prog = jpg.replace(b"\xff\xc0", b"\xff\xc2")
    d2 = multimodal._jpeg_decode(prog)
    assert (d2["width"], d2["height"]) == (1920, 1080)
    # a COM segment and a standalone RST before the SOF must be skipped
    import struct

    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    with_com = jpg[:2] + com + b"\xff\xd0" + jpg[2:]
    assert multimodal._jpeg_decode(with_com)["width"] == 1920
    with pytest.raises(ValueError, match="bad SOI"):
        multimodal._jpeg_decode(b"GIF89a")
    with pytest.raises(ValueError, match="no SOF"):
        multimodal._jpeg_decode(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError, match="truncated"):
        multimodal._jpeg_decode(jpg[:10])


def test_gif_bmp_decoder_unit():
    gif = multimodal.make_gif(320, 200)
    d = multimodal._gif_decode(gif)
    assert (d["format"], d["width"], d["height"]) == ("gif", 320, 200)
    assert multimodal._gif_decode(b"GIF87a" + gif[6:])["width"] == 320
    with pytest.raises(ValueError, match="bad signature"):
        multimodal._gif_decode(b"GIF88a" + gif[6:])
    import struct

    bmp = (
        b"BM" + struct.pack("<IHHI", 62, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 17, -9, 1, 24, 0, 8, 0, 0, 0, 0)
    )
    d = multimodal._bmp_decode(bmp)
    # negative height = top-down rows; the dimension is its magnitude
    assert (d["format"], d["width"], d["height"]) == ("bmp", 17, 9)
    with pytest.raises(ValueError, match="bad magic"):
        multimodal._bmp_decode(b"XX" + bmp[2:])


def test_auto_decoder_dispatches_on_magic_bytes(spark):
    """The sniffing path decodes a mixed-format batch and reports the
    format it actually parsed (kind comes from the bytes, not the
    metadata sidecar)."""
    rows = [
        (0, multimodal.make_png(7, 3)),
        (1, multimodal.make_jpeg(31, 15)),
        (2, multimodal.make_gif(5, 9)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary").select(
        "media_id",
        "payload",
        F.struct(
            F.lit("mystery").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )
    got = {
        r.media_id: (r.kind, r.width, r.height)
        for r in multimodal.decode_media(df, decoder="auto").collect()
    }
    assert got == {0: ("png", 7, 3), 1: ("jpeg", 31, 15), 2: ("gif", 5, 9)}
    with pytest.raises(Exception, match="unrecognized media signature"):
        multimodal._sniff_decode(b"not a media file")


def test_fixture_media_rows_are_stable():
    """The constants oracle for multimodal_features pins these exact
    bytes: pure struct.pack builders only (no zlib stream whose bytes
    depend on the zlib build), and the fixture must never drift."""
    import hashlib as _h

    rows = multimodal.fixture_media_rows()
    assert len(rows) == 24
    assert all(p[:2] in (b"\xff\xd8", b"GI") for _, p in rows)
    digest = _h.md5(b"".join(p for _, p in rows)).hexdigest()
    assert digest == "d54b32f601ee9e09f14fccb03e4735b6"


def test_wav_decoder_unit():
    """RIFF chunk walk: fmt + data, word alignment, malformed input."""
    wav = multimodal.make_wav(2, 1000, sample_rate=44100)
    d = multimodal._wav_decode(wav)
    assert d["format"] == "wav"
    assert (d["width"], d["sample_rate"], d["n_frames"]) == (2, 44100, 1000)
    # an odd-sized unknown chunk before fmt must be skipped with padding
    import struct

    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    padded = wav[:12] + odd + wav[12:]
    padded = b"RIFF" + struct.pack("<I", len(padded) - 8) + padded[8:]
    assert multimodal._wav_decode(padded)["n_frames"] == 1000
    with pytest.raises(ValueError, match="bad RIFF"):
        multimodal._wav_decode(b"RIFX" + wav[4:])
    with pytest.raises(ValueError, match="missing fmt"):
        multimodal._wav_decode(wav[:12])
    # truncation anywhere raises ValueError, never struct.error or a
    # silent over-count from the declared data size (review finding r6)
    with pytest.raises(ValueError, match="truncated"):
        multimodal._wav_decode(wav[:22])
    with pytest.raises(ValueError, match="truncated"):
        multimodal._wav_decode(multimodal.make_wav(2, 100)[:-20])
    # auto-dispatch finds wav too
    assert multimodal._sniff_decode(wav)["format"] == "wav"


def test_gif_frame_count_unit():
    g3 = multimodal.make_gif_frames(5, 2, 3)
    assert multimodal.gif_frame_count(g3) == 3
    g1 = multimodal.make_gif_frames(1, 1, 1)
    assert multimodal.gif_frame_count(g1) == 1
    # an extension block before the frames is skipped, not counted
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    with_ext = g3[:13] + ext + g3[13:]
    assert multimodal.gif_frame_count(with_ext) == 3
    with pytest.raises(ValueError, match="missing trailer"):
        multimodal.gif_frame_count(g3[:-1])
    with pytest.raises(ValueError, match="truncated logical screen"):
        multimodal.gif_frame_count(g1[:10])
    with pytest.raises(ValueError, match="unknown block"):
        multimodal.gif_frame_count(g3[:13] + b"\x7f" + g3[13:])


def test_decoder_fuzz_only_valueerror_escapes():
    """Failure-channel fuzz: every decoder, fed random bytes and
    random mutations/truncations of VALID files, either returns a dict
    or raises ValueError — NEVER IndexError/struct.error/KeyError
    (those would escape mapInPandas as unclassified executor errors
    instead of landing in the ingest failure channel)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = [
        multimodal.make_png(7, 3),
        multimodal.make_jpeg(31, 15),
        multimodal.make_gif(5, 9),
        multimodal.make_gif_frames(4, 4, 3),
        multimodal.make_wav(2, 50),
    ]
    decoders = [
        multimodal._png_decode,
        multimodal._jpeg_decode,
        multimodal._gif_decode,
        multimodal._bmp_decode,
        multimodal._wav_decode,
        multimodal._sniff_decode,
        multimodal.gif_frame_count,
    ]

    @settings(max_examples=300, deadline=None)
    @given(st.data())
    def check(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:  # pure random bytes
            payload = data.draw(st.binary(max_size=200))
        else:
            base = bytearray(data.draw(st.sampled_from(valid)))
            if mode == 1:  # truncate
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:  # mutate a few bytes
                for _ in range(data.draw(st.integers(1, 4))):
                    i = data.draw(st.integers(0, len(base) - 1))
                    base[i] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        for dec in decoders:
            try:
                dec(payload)
            except ValueError:
                pass  # the contract

    check()


def test_bmp_pixel_stats_unit():
    """Real pixel decode: integer sums match the closed-form rule, the
    positional checksum encodes (x, y) placement (bottom-up rows,
    4-byte stride), and a top-down variant (negative height) decodes to
    the SAME statistics."""
    import struct

    w, h = 5, 3  # stride 16 != w*3: exercises row padding
    buf = multimodal.make_bmp(w, h)
    st = multimodal.bmp_pixel_stats(buf)
    want = {
        c: sum((x * 7 + y * 13 + c * 29) % 256 for x in range(w) for y in range(h))
        for c in range(3)
    }
    assert (st["width"], st["height"]) == (w, h)
    assert (st["sum_b"], st["sum_g"], st["sum_r"]) == (want[0], want[1], want[2])
    assert st["pos_checksum"] == sum(
        (x + y * w) * ((x * 7 + y * 13) % 256) for x in range(w) for y in range(h)
    )

    # top-down storage: flip the row order, negate the height field
    off = struct.unpack("<I", buf[10:14])[0]
    stride = (w * 3 + 3) & ~3
    rows = [buf[off + i * stride : off + (i + 1) * stride] for i in range(h)]
    flipped = buf[:off] + b"".join(reversed(rows))
    flipped = flipped[:22] + struct.pack("<i", -h) + flipped[26:]
    assert multimodal.bmp_pixel_stats(flipped) == st


def test_bmp_pixel_stats_gates_and_errors():
    import struct

    import pytest as _pytest

    buf = multimodal.make_bmp(4, 4)
    with _pytest.raises(ValueError):
        multimodal.bmp_pixel_stats(buf[:-8])  # truncated pixel array
    two_bit = buf[:28] + struct.pack("<H", 2) + buf[30:]
    with _pytest.raises(NotImplementedError):
        # 2 bpp is not a BMP depth this decoder (or the format
        # commonly) supports — 1/4/8/24/32 all decode for real now
        multimodal.bmp_pixel_stats(two_bit)
    rle = buf[:30] + struct.pack("<I", 1) + buf[34:]
    with _pytest.raises(NotImplementedError):
        multimodal.bmp_pixel_stats(rle)  # compressed decode is gated


def test_bmp_variant_decode_closed_forms():
    """r8 sixth pass: 32-bit (alpha excluded) and 8-bit palette BMPs
    decode for real; 24/32 carry identical channel content through
    different strides; palette damage is a structural ValueError."""
    import struct

    import pytest as _pytest

    for w, h in ((1, 1), (7, 5), (16, 9)):
        s24 = multimodal.bmp_pixel_stats(multimodal.make_bmp(w, h))
        s32 = multimodal.bmp_pixel_stats(multimodal.make_bmp(w, h, bpp=32))
        keys = ("sum_b", "sum_g", "sum_r", "pos_checksum")
        assert {k: s24[k] for k in keys} == {k: s32[k] for k in keys}
        s8 = multimodal.bmp_pixel_stats(multimodal.make_bmp(w, h, bpp=8))
        assert s8["sum_b"] == sum(
            (7 * ((x * 11 + y * 17) % 16) + 3) % 256
            for x in range(w)
            for y in range(h)
        )
    # truncated color table
    buf = multimodal.make_bmp(7, 5, bpp=8)
    with _pytest.raises(ValueError, match="color table|truncated"):
        multimodal.bmp_pixel_stats(buf[:54] + buf[54 + 40 :])
    # index out of range: shrink the declared color count below the
    # max index the pixel rule produces
    small = bytearray(buf)
    struct.pack_into("<I", small, 46, 4)
    # drop table entries 4..15 and fix the data offset accordingly
    small = bytes(small[: 54 + 16]) + bytes(small[54 + 64 :])
    small = bytearray(small)
    struct.pack_into("<I", small, 10, 54 + 16)
    with _pytest.raises(ValueError, match="index out of range"):
        multimodal.bmp_pixel_stats(bytes(small))


def test_wav_pcm_stats_against_stdlib_wave():
    """Cross-check the PCM sample decode against the stdlib wave module
    reading the same bytes: identical sample count and reductions."""
    import io
    import struct
    import wave

    buf = multimodal.make_wav(2, 17)
    wf = wave.open(io.BytesIO(buf))
    frames = wf.readframes(17)
    samples = struct.unpack(f"<{len(frames) // 2}h", frames)
    st = multimodal.wav_pcm_stats(buf)
    assert st["channels"] == 2 and st["sample_rate"] == 8000
    assert st["n_samples"] == len(samples)
    assert st["abs_sum"] == sum(abs(s) for s in samples)
    assert st["peak"] == max(abs(s) for s in samples)
    assert st["pos_checksum"] == sum(k * abs(s) for k, s in enumerate(samples))


def test_wav_pcm_depths_and_gates():
    """r8 sixth pass: all integer depths decode (8-bit unsigned -128,
    24-bit sign-extended triples, 32-bit); non-PCM format codes stay
    gated; invalid depths are structural ValueErrors."""
    import struct

    import pytest as _pytest

    for bits in (8, 16, 24, 32):
        st = multimodal.wav_pcm_stats(multimodal.make_wav(3, 8, bits=bits))
        step = bits // 8
        n = 3 * 8

        def samp(k):
            bs = [((k * step + j) * 31) % 256 for j in range(step)]
            if bits == 8:
                return bs[0] - 128
            v = sum(b << (8 * j) for j, b in enumerate(bs))
            return v - ((1 << bits) if bs[-1] >= 128 else 0)

        assert st["n_samples"] == n
        assert st["abs_sum"] == sum(abs(samp(k)) for k in range(n))
        assert st["pos_checksum"] == sum(
            k * abs(samp(k)) for k in range(n)
        )
    # r9: IEEE-float WAV (fmt code 3) decodes for real now — an
    # integer-depth payload under a float fmt code is a structural
    # error, not a gate (test_float_pcm_decode_real covers the rest)
    buf = bytearray(multimodal.make_wav(1, 4))
    assert buf[12:16] == b"fmt "
    buf[20:22] = struct.pack("<H", 3)
    with _pytest.raises(ValueError, match="invalid float PCM depth"):
        multimodal.wav_pcm_stats(bytes(buf))
    # invalid integer depth -> ValueError
    buf = bytearray(multimodal.make_wav(1, 4))
    buf[34:36] = struct.pack("<H", 12)
    with _pytest.raises(ValueError, match="invalid integer PCM depth"):
        multimodal.wav_pcm_stats(bytes(buf))


def test_decode_pixels_and_pcm_dataplane(spark):
    """The Spark wrappers: JVM-side rounded means match a driver-side
    recomputation, including the n=128 case where Python round()
    (banker's) and SQL round (half-up) disagree at the tie."""
    ids = [0, 7, 135, 120]  # 120 -> w=9,h=8 (n=72); 135 -> w=8,h=16 (n=128)
    media = spark.createDataFrame(
        [(i, multimodal.make_bmp((i % 16) + 1, ((i // 16) % 16) + 1)) for i in ids],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in multimodal.decode_pixels(media).collect()}
    import decimal

    for i in ids:
        w, h = (i % 16) + 1, ((i // 16) % 16) + 1
        s = sum((x * 7 + y * 13) % 256 for x in range(w) for y in range(h))
        # half-up reference, exact decimal arithmetic
        want = float(
            decimal.Decimal(s / (w * h)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )
        assert out[i]["mean_b"] == want, (i, out[i]["mean_b"], want)

    wavs = spark.createDataFrame(
        [(i, multimodal.make_wav((i % 3) + 1, ((i % 11) + 2) * 8)) for i in ids],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in multimodal.decode_pcm(wavs).collect()}
    for i in ids:
        assert rows[i]["channels"] == (i % 3) + 1
        assert rows[i]["n_samples"] == ((i % 3) + 1) * ((i % 11) + 2) * 8
        assert rows[i]["peak"] > 0 and rows[i]["pos_checksum"] > 0


def test_bmp_resize_unit():
    """Real nearest-neighbor resize: identity resize preserves the exact
    pixel stats; a down-sample matches the direct sampling-rule
    recomputation; the re-encoded bytes decode through the same real
    decoder (encoder layout proven too)."""
    w, h = 7, 5
    src = multimodal.make_bmp(w, h)
    same = multimodal.bmp_resize(src, w, h)
    assert multimodal.bmp_pixel_stats(same) == multimodal.bmp_pixel_stats(src)

    tw, th = 4, 3
    st = multimodal.bmp_pixel_stats(multimodal.bmp_resize(src, tw, th))
    def px(x, y, c):
        return (((x * w) // tw) * 7 + ((y * h) // th) * 13 + c * 29) % 256
    assert (st["width"], st["height"]) == (tw, th)
    for ci, key in enumerate(("sum_b", "sum_g", "sum_r")):
        assert st[key] == sum(px(x, y, ci) for x in range(tw) for y in range(th))
    assert st["pos_checksum"] == sum(
        (x + y * tw) * px(x, y, 0) for x in range(tw) for y in range(th)
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.bmp_resize(src, 0, 3)
    with _pytest.raises(ValueError):
        multimodal.bmp_resize(src[:-10], 4, 3)


def test_content_decoder_fuzz_only_contract_errors_escape():
    """Same failure-channel contract for the r7 CONTENT decoders
    (pixel/PCM/resize): random bytes and mutations/truncations of valid
    media either decode or raise ValueError/NotImplementedError —
    never IndexError/struct.error/KeyError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = [
        multimodal.make_bmp(5, 3),
        multimodal.make_bmp(16, 16),
        multimodal.make_wav(1, 20),
        multimodal.make_wav(3, 7),
        multimodal.make_png(4, 4),
        multimodal.make_png_filtered(6, 5),
    ]
    fns = [
        multimodal.bmp_pixel_stats,
        multimodal.wav_pcm_stats,
        multimodal.png_pixel_stats,
        multimodal.pixel_stats,
        lambda b: multimodal.bmp_resize(b, 4, 3),
    ]

    @settings(max_examples=300, deadline=None)
    @given(st.data())
    def check(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(max_size=300))
        else:
            base = bytearray(data.draw(st.sampled_from(valid)))
            if mode == 1:
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:
                for _ in range(data.draw(st.integers(1, 4))):
                    i = data.draw(st.integers(0, len(base) - 1))
                    base[i] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        for fn in fns:
            try:
                fn(payload)
            except (ValueError, NotImplementedError):
                pass  # the contract

    check()


def test_png_pixel_stats_all_filters():
    """Real PNG pixel decode (r8): the filtered builder applies filter
    y % 5 per scanline — None/Sub/Up/Average/Paeth all on the decode
    path — and the decoded statistics must match the closed-form raw
    rule (i*37 + y*101) % 256 exactly. Heights >= 5 guarantee every
    filter type occurs."""
    for w, h in [(1, 5), (3, 6), (5, 5), (16, 7), (7, 16)]:
        st = multimodal.png_pixel_stats(multimodal.make_png_filtered(w, h))
        want = {
            c: sum(
                ((3 * x + c) * 37 + y * 101) % 256
                for x in range(w)
                for y in range(h)
            )
            for c in range(3)
        }
        assert (st["width"], st["height"]) == (w, h)
        assert (st["sum_r"], st["sum_g"], st["sum_b"]) == (
            want[0], want[1], want[2],
        )
        assert st["pos_checksum"] == sum(
            (x + y * w) * (((3 * x + 2) * 37 + y * 101) % 256)
            for x in range(w)
            for y in range(h)
        )
        # the unfiltered builder must decode to the SAME stats (filters
        # are invertible; both builders share the raw rule)
        assert multimodal.png_pixel_stats(multimodal.make_png(w, h)) == st


def test_png_pixel_stats_gates_and_errors():
    import struct
    import zlib

    import pytest as _pytest

    buf = multimodal.make_png_filtered(4, 4)
    with _pytest.raises(ValueError, match="bad signature"):
        multimodal.png_pixel_stats(b"\x89PNG" + buf[4:][::-1])
    with _pytest.raises(ValueError, match="truncated|missing IEND"):
        multimodal.png_pixel_stats(buf[:-6])  # rips through IEND
    with _pytest.raises(ValueError, match="truncated|missing IEND"):
        # mid-chunk cut: the partial IDAT body itself must raise
        multimodal.png_pixel_stats(buf[: buf.index(b"IDAT") + 6])
    # corrupt one IDAT byte -> CRC mismatch, ValueError (never zlib.error)
    idat_at = buf.index(b"IDAT") + 4
    bad = buf[:idat_at] + bytes([buf[idat_at] ^ 0xFF]) + buf[idat_at + 1 :]
    with _pytest.raises(ValueError, match="bad CRC"):
        multimodal.png_pixel_stats(bad)

    def rebuild(depth=8, ctype=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, interlace)
        body = buf[buf.index(b"IDAT") - 4 : ]
        return multimodal._PNG_SIGNATURE + multimodal._png_chunk(b"IHDR", ihdr) + body

    # r8 third pass: interlace/palette/16-bit are IMPLEMENTED — a
    # mismatched body is now a structural ValueError, never a gate
    with _pytest.raises(
        ValueError, match="interlace pass|unknown filter|size mismatch"
    ):
        # row-major body under an interlaced header: pass sizes no
        # longer tile the stream — caught by the r9 whole-stream size
        # pre-check (which runs BEFORE the output allocation)
        multimodal.png_pixel_stats(rebuild(interlace=1))
    with _pytest.raises(ValueError, match="missing PLTE"):
        multimodal.png_pixel_stats(rebuild(ctype=3))
    with _pytest.raises(ValueError, match="size mismatch"):
        # RGBA header over a 3-bpp body: supported type, wrong length
        multimodal.png_pixel_stats(rebuild(ctype=6))
    with _pytest.raises(ValueError, match="size mismatch"):
        multimodal.png_pixel_stats(rebuild(depth=16))
    with _pytest.raises(ValueError, match="invalid depth/color-type"):
        multimodal.png_pixel_stats(rebuild(ctype=2, depth=4))
    with _pytest.raises(ValueError, match="unknown interlace"):
        multimodal.png_pixel_stats(rebuild(interlace=2))
    # a VALID zlib stream of the WRONG length -> size-mismatch ValueError
    short = (
        multimodal._PNG_SIGNATURE
        + multimodal._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + multimodal._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + multimodal._png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="size mismatch"):
        multimodal.png_pixel_stats(short)


def test_png_pixel_stats_full_coverage_roundtrip():
    """r8 third pass — the PNG gate list is EMPTY: every legal color
    type x depth x interlace combination round-trips through the
    filtered builder and decodes to the closed-form sample rule. The
    dim sweep crosses every Adam7 pass-boundary shape."""
    import numpy as np

    for ctype, depths in multimodal._PNG_DEPTHS.items():
        for depth in depths:
            for interlace in (0, 1):
                for w, h in [(1, 1), (3, 2), (8, 8), (13, 9), (17, 5)]:
                    nc = min(16, 1 << depth) if ctype == 3 else 16
                    buf = multimodal.make_png_filtered(
                        w, h, ctype, depth=depth, interlace=interlace,
                        n_colors=nc,
                    )
                    got = multimodal._png_decode_samples(buf)
                    assert got[:4] == (w, h, ctype, depth)
                    assert np.array_equal(
                        got[4],
                        multimodal._png_rule_samples(w, h, ctype, depth, nc),
                    ), (ctype, depth, interlace, w, h)


def test_png_adam7_equals_row_major_stats():
    """Interlaced and row-major encodings of the SAME final image must
    reduce to identical statistics — the deinterlace cross-check (the
    GIF pattern applied to PNG)."""
    for ctype, depth in [(2, 8), (6, 16), (3, 4), (0, 1), (4, 16)]:
        nc = min(16, 1 << depth) if ctype == 3 else 16
        a = multimodal.png_pixel_stats(multimodal.make_png_filtered(
            13, 9, ctype, depth=depth, interlace=0, n_colors=nc))
        b = multimodal.png_pixel_stats(multimodal.make_png_filtered(
            13, 9, ctype, depth=depth, interlace=1, n_colors=nc))
        assert a == b, (ctype, depth)


def test_png_palette_semantics():
    """Palette decode maps indexes through the PLTE closed form; the
    8-bit and 4-bit index encodings carry IDENTICAL content through
    DIFFERENT unpack paths; an out-of-range index is a structural
    ValueError, not an IndexError."""
    import pytest as _pytest

    s8 = multimodal.png_pixel_stats(
        multimodal.make_png_filtered(7, 6, 3, depth=8)
    )
    s4 = multimodal.png_pixel_stats(
        multimodal.make_png_filtered(7, 6, 3, depth=4)
    )
    assert s8 == s4
    want_b = sum(
        (7 * ((x * 11 + y * 17) % 16) + 3) % 256
        for x in range(7)
        for y in range(6)
    )
    assert s8["sum_b"] == want_b
    # shrink the PLTE below the max index -> out-of-range ValueError
    buf = multimodal.make_png_filtered(7, 6, 3, depth=8, n_colors=16)
    at = buf.index(b"PLTE") - 4
    end = at + 8 + 48 + 4
    short_plte = multimodal._png_chunk(b"PLTE", bytes(9))
    with _pytest.raises(ValueError, match="palette index out of range"):
        multimodal.png_pixel_stats(buf[:at] + short_plte + buf[end:])


def test_png_16bit_sample_rule():
    """16-bit samples are big-endian byte pairs of the historical byte
    rule: an endianness swap or pair misalignment breaks the sums."""
    st = multimodal.png_pixel_stats(
        multimodal.make_png_filtered(5, 4, 2, depth=16)
    )
    want_r = sum(
        ((222 * x + 101 * y) % 256) * 256 + (222 * x + 37 + 101 * y) % 256
        for x in range(5)
        for y in range(4)
    )
    assert st["sum_r"] == want_r


def test_pixel_stats_dispatch_and_mixed_dataplane(spark):
    """Magic-byte dispatch: one decode stage over a MIXED BMP/PNG binary
    column — the blue-channel checksum contract is format-independent
    (BMP stores bottom-up BGR, PNG top-down RGB; both normalize to
    image row order)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unrecognized"):
        multimodal.pixel_stats(b"GIF89a......")

    ids = [0, 1, 7, 135, 120]
    media = spark.createDataFrame(
        [
            (
                i,
                (multimodal.make_bmp if i % 2 == 0 else multimodal.make_png_filtered)(
                    (i % 16) + 1, ((i // 16) % 16) + 1
                ),
            )
            for i in ids
        ],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in multimodal.decode_pixels(media).collect()}
    for i in ids:
        w, h = (i % 16) + 1, ((i // 16) % 16) + 1
        assert (out[i]["width"], out[i]["height"]) == (w, h)
        if i % 2 == 0:
            chk = sum(
                (x + y * w) * ((x * 7 + y * 13) % 256)
                for x in range(w) for y in range(h)
            )
        else:
            chk = sum(
                (x + y * w) * (((3 * x + 2) * 37 + y * 101) % 256)
                for x in range(w) for y in range(h)
            )
        assert out[i]["pos_checksum"] == chk, i


def test_gif_lzw_roundtrip_fuzz():
    """The LZW pair is mutually inverse for arbitrary index streams —
    including dictionary growth across code-width boundaries and the
    4096-entry reset (the encoder's width must track the DECODER's
    lagging table; any desync corrupts from the first boundary)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def check(data):
        mcs = data.draw(st.integers(2, 8))
        idx = bytes(
            data.draw(
                st.lists(st.integers(0, (1 << mcs) - 1), max_size=2000)
            )
        )
        assert multimodal._gif_lzw_decode(
            multimodal._gif_lzw_encode(idx, mcs), mcs
        ) == idx

    check()
    # deterministic reset-crossing case (4096 entries needs volume)
    import random

    big = bytes(random.Random(3).randrange(4) for _ in range(60000))
    assert multimodal._gif_lzw_decode(
        multimodal._gif_lzw_encode(big, 2), 2
    ) == big


def test_gif_frame_pixel_stats_closed_form():
    """Frame-pixel decode matches the closed-form index + palette rules
    for every frame, and the r7 frame counter agrees on the same
    bytes."""
    w, h, nf = 6, 5, 3
    payload = multimodal.make_gif_pixel_frames(w, h, nf)
    assert multimodal.gif_frame_count(payload) == nf
    frames = multimodal.gif_frame_pixel_stats(payload)
    assert [fr["frame_idx"] for fr in frames] == [0, 1, 2]
    for f, fr in enumerate(frames):
        for ci, key in enumerate(("sum_r", "sum_g", "sum_b")):
            assert fr[key] == sum(
                multimodal.gif_palette((x * 3 + y * 5 + f * 7) % 8)[ci]
                for x in range(w)
                for y in range(h)
            )
        assert fr["idx_checksum"] == sum(
            (x + y * w) * ((x * 3 + y * 5 + f * 7) % 8)
            for x in range(w)
            for y in range(h)
        )


def test_gif_frame_pixel_stats_gates_and_errors():
    import pytest as _pytest

    payload = bytearray(multimodal.make_gif_pixel_frames(4, 3, 2))
    # first image descriptor sits right after header(13) + GCT(24)
    # (searching for 0x2C would hit palette byte 44 first)
    desc_at = 13 + 3 * multimodal.GIF_PALETTE_SIZE
    assert payload[desc_at] == 0x2C
    with _pytest.raises(ValueError):  # rip off trailer + some data
        multimodal.gif_frame_pixel_stats(bytes(payload[:-10]))
    # shrink the descriptor's height: decoded pixel count mismatches
    wrong = bytearray(payload)
    wrong[desc_at + 7 : desc_at + 9] = (99).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="pixels"):
        multimodal.gif_frame_pixel_stats(bytes(wrong))
    # frames with no color table anywhere -> ValueError
    no_gct = multimodal.make_gif_frames(3, 3, 1)  # r7 builder: no GCT
    with _pytest.raises(ValueError, match="no color table"):
        multimodal.gif_frame_pixel_stats(no_gct)


def test_decode_frame_pixels_dataplane(spark):
    """The Spark wrapper: per-frame rows with JVM-rounded means match a
    driver-side recomputation."""
    import decimal

    ids = [0, 5, 11]
    media = spark.createDataFrame(
        [
            (
                i,
                multimodal.make_gif_pixel_frames(
                    (i % 6) + 2, ((i // 6) % 6) + 2, (i % 4) + 1
                ),
            )
            for i in ids
        ],
        "media_id long, payload binary",
    )
    rows = multimodal.decode_frame_pixels(media).collect()
    by_key = {(r["media_id"], r["frame_idx"]): r for r in rows}
    assert len(by_key) == sum((i % 4) + 1 for i in ids)
    for i in ids:
        w, h = (i % 6) + 2, ((i // 6) % 6) + 2
        for f in range((i % 4) + 1):
            r = by_key[(i, f)]
            s = sum(
                multimodal.gif_palette((x * 3 + y * 5 + f * 7) % 8)[0]
                for x in range(w)
                for y in range(h)
            )
            want = float(
                decimal.Decimal(s / (w * h)).quantize(
                    decimal.Decimal("0.000001"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )
            assert r["mean_r"] == want, (i, f)


def test_gif_interlaced_frames_deinterlace_to_image_order():
    """Interlaced storage (r8): the 4-pass row permutation round-trips —
    interlaced and non-interlaced builds of the same image rule decode
    to IDENTICAL statistics (the index checksum is row-order-sensitive,
    so a deinterlacing bug cannot hide). Flipping the flag on a
    row-major stream, conversely, permutes the checksum."""
    for w, h, nf in [(5, 4, 2), (7, 9, 3), (3, 16, 1), (6, 1, 2)]:
        plain = multimodal.gif_frame_pixel_stats(
            multimodal.make_gif_pixel_frames(w, h, nf)
        )
        inter = multimodal.gif_frame_pixel_stats(
            multimodal.make_gif_pixel_frames(w, h, nf, interlace=True)
        )
        assert plain == inter, (w, h, nf)
    # a WRONGLY-flagged row-major stream yields a different checksum
    # (means survive — they are row-order-invariant; the checksum not)
    payload = bytearray(multimodal.make_gif_pixel_frames(4, 6, 1))
    desc_at = 13 + 3 * multimodal.GIF_PALETTE_SIZE
    payload[desc_at + 9] |= 0x40
    wrong = multimodal.gif_frame_pixel_stats(bytes(payload))[0]
    right = multimodal.gif_frame_pixel_stats(
        multimodal.make_gif_pixel_frames(4, 6, 1)
    )[0]
    assert wrong["sum_r"] == right["sum_r"]
    assert wrong["idx_checksum"] != right["idx_checksum"]


def test_png_gray_and_rgba_decode_closed_form():
    """PNG color-type coverage (r8): grayscale and RGBA decode through
    the bpp-generalized unfilter; gray reports its single channel in
    all three slots, RGBA excludes alpha; 16-bit/palette stay gated."""
    import struct

    import pytest as _pytest

    st = multimodal.png_pixel_stats(multimodal.make_png_filtered(5, 6, color_type=0))
    g = sum((x * 37 + y * 101) % 256 for x in range(5) for y in range(6))
    assert (st["sum_r"], st["sum_g"], st["sum_b"]) == (g, g, g)
    assert st["pos_checksum"] == sum(
        (x + y * 5) * ((x * 37 + y * 101) % 256)
        for x in range(5)
        for y in range(6)
    )
    st = multimodal.png_pixel_stats(multimodal.make_png_filtered(4, 7, color_type=6))
    for ci, key in enumerate(("sum_r", "sum_g", "sum_b")):
        assert st[key] == sum(
            ((4 * x + ci) * 37 + y * 101) % 256
            for x in range(4)
            for y in range(7)
        )
    # palette (type 3) is implemented as of the r8 third pass — a
    # palette header with no PLTE is now a structural ValueError
    buf = multimodal.make_png_filtered(4, 4)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    pal = (
        multimodal._PNG_SIGNATURE
        + multimodal._png_chunk(b"IHDR", ihdr)
        + buf[buf.index(b"IDAT") - 4 :]
    )
    with _pytest.raises(ValueError, match="missing PLTE"):
        multimodal.png_pixel_stats(pal)


def test_float_pcm_decode_real():
    """r9: fmt-code-3 WAV decodes for real at float32/float64; the
    dyadic sample rule makes reductions exact; compressed formats stay
    gated, bad float depths are structural errors."""
    import struct

    import pytest as _pytest

    for bits in (32, 64):
        buf = multimodal.make_wav_float(2, 7, bits=bits)
        s = multimodal.wav_pcm_stats(buf)
        vals = [(((k * 31) % 256) - 128) / 128.0 for k in range(14)]
        assert s["n_samples"] == 14 and s["channels"] == 2
        assert s["abs_sum"] == sum(abs(v) for v in vals)
        assert s["peak"] == max(abs(v) for v in vals)
        assert s["pos_checksum"] == sum(
            k * abs(v) for k, v in enumerate(vals)
        )
    # ADPCM (fmt 2) still gated; float with a non-32/64 depth is a
    # ValueError, not a gate
    buf = bytearray(multimodal.make_wav_float(1, 4))
    at = buf.index(b"fmt ") + 8
    buf[at : at + 2] = struct.pack("<H", 2)
    with _pytest.raises(NotImplementedError, match="fmt code=2"):
        multimodal.wav_pcm_stats(bytes(buf))
    buf[at : at + 2] = struct.pack("<H", 3)
    buf[at + 14 : at + 16] = struct.pack("<H", 16)
    with _pytest.raises(ValueError, match="invalid float PCM depth"):
        multimodal.wav_pcm_stats(bytes(buf))


def test_untrusted_header_dims_bounded_before_allocation():
    """r9: a tiny payload declaring huge dims must fail the structural
    check, never reach a multi-GB output allocation (the stsz-bound
    class: RLE delta escapes / Adam7 headers are untrusted)."""
    import struct
    import zlib

    import pytest as _pytest

    # BMP RLE8: patch width/height to 30000x30000 (7.2 GB int64 grid
    # if allocated) -> hard pixel-cap ValueError first
    buf = bytearray(multimodal.make_bmp(16, 9, bpp=8, rle=True))
    buf[18:26] = struct.pack("<ii", 30000, 30000)
    with _pytest.raises(ValueError, match="exceeds decode cap"):
        multimodal.bmp_pixel_stats(bytes(buf))
    # interlaced PNG: patch IHDR dims to 20000x20000 (3.2 GB samples
    # grid if allocated) + fix the CRC -> hard pixel cap BEFORE the
    # inflate (r9 post-review: a zlib bomb matching the declared size
    # would pass a size CHECK — the cap must precede decompression)
    png = bytearray(multimodal.make_png_filtered(8, 8, interlace=1))
    assert png[12:16] == b"IHDR"
    png[16:24] = struct.pack(">II", 20000, 20000)
    png[29:33] = struct.pack(">I", zlib.crc32(bytes(png[12:29])))
    with _pytest.raises(ValueError, match="exceeds decode cap"):
        multimodal.png_pixel_stats(bytes(png))
    # under the cap, an IDAT inflating PAST the declared size is a
    # bounded mismatch error (the inflate stops at expected+1 bytes)
    png2 = bytearray(multimodal.make_png_filtered(8, 8))
    idat_at = bytes(png2).index(b"IDAT")
    big = zlib.compress(b"\x01" * 100000)
    new_chunk = (
        struct.pack(">I", len(big)) + b"IDAT" + big
        + struct.pack(">I", zlib.crc32(b"IDAT" + big))
    )
    (length,) = struct.unpack(">I", png2[idat_at - 4 : idat_at])
    rebuilt = (
        bytes(png2[: idat_at - 4])
        + new_chunk
        + bytes(png2[idat_at + 8 + length :])
    )
    with _pytest.raises(ValueError, match="size mismatch"):
        multimodal.png_pixel_stats(rebuilt)


def test_bmp_rle8_and_subbyte_decode():
    """r8 eighth pass: RLE8 (runs + absolute mode + escapes) and
    1/4-bit bit-packed palette BMPs decode for real. RLE8 and 4-bit
    must equal the uncompressed 8-bit content exactly; structural
    damage to the RLE stream is a ValueError."""
    import struct

    import pytest as _pytest

    for w, h in ((1, 1), (7, 5), (16, 9), (13, 2)):
        base8 = multimodal.bmp_pixel_stats(multimodal.make_bmp(w, h, bpp=8))
        assert multimodal.bmp_pixel_stats(
            multimodal.make_bmp(w, h, bpp=8, rle=True)
        ) == base8
        assert multimodal.bmp_pixel_stats(
            multimodal.make_bmp(w, h, bpp=4)
        ) == base8  # same 16-color index rule, different byte path
        b1 = multimodal.bmp_pixel_stats(multimodal.make_bmp(w, h, bpp=1))
        assert b1["sum_b"] == sum(
            (7 * ((x * 11 + y * 17) % 2) + 3) % 256
            for x in range(w)
            for y in range(h)
        )
    # fixture streams really exercise absolute mode (not just runs)
    buf = multimodal.make_bmp(16, 9, bpp=8, rle=True)
    data_off = struct.unpack("<I", buf[10:14])[0]
    s, i, has_abs = buf[data_off:], 0, False
    while i + 2 <= len(s):
        b0, b1 = s[i], s[i + 1]
        i += 2
        if b0 == 0:
            if b1 >= 3:
                has_abs = True
                i += b1 + (b1 & 1)
            elif b1 == 2:
                i += 2
            elif b1 == 1:
                break
    assert has_abs
    # truncated RLE stream
    with _pytest.raises(ValueError, match="truncated RLE|RLE run"):
        multimodal.bmp_pixel_stats(buf[:-6])
    # a run overrunning the row width
    bad = bytearray(buf)
    bad[data_off] = 255  # first run count -> past the 16-px row
    with _pytest.raises(ValueError, match="overruns row"):
        multimodal.bmp_pixel_stats(bytes(bad))
    # delta escape: decoder fills skipped pixels with index 0
    head = buf[:data_off]
    stream = bytes((2, 5)) + b"\x00\x02" + bytes((3, 1)) + b"\x00\x01"
    st = multimodal.bmp_pixel_stats(head + stream)
    # stored row 0 (image bottom): 5,5 then 3 skipped (0), then 1,1,1
    assert st["width"] == 16 and st["height"] == 9
    # RLE under a top-down header is structurally invalid
    td = bytearray(buf)
    struct.pack_into("<i", td, 22, -9)
    with _pytest.raises(ValueError, match="top-down"):
        multimodal.bmp_pixel_stats(bytes(td))


def test_wav_full_scale_32bit_peak_is_long():
    """Review finding: a full-scale negative 32-bit sample has
    |s| = 2^31, one past int32 max — the stats and the Spark schema
    must carry it as long."""
    import struct

    data = struct.pack("<i", -(2**31)) + struct.pack("<i", 5)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 4, 4, 32)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    st = multimodal.wav_pcm_stats(buf)
    assert st["peak"] == 2**31
    assert st["abs_sum"] == 2**31 + 5
