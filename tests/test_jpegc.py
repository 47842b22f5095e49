"""Baseline JPEG codec: exactness on uniform blocks (the oracle
path), LOSSLESS entropy-level roundtrips with random AC coefficients
(ZRL / EOB / sign branches), restart-marker resync, structural fuzz
under the failure-channel contract, and the Spark stage."""
import struct

import numpy as np
import pytest

from scicat_ingestor_spark.operators import jpegc


def _bv_gray(ci, bx, by):
    return (bx * 29 + by * 31 + 7) % 256


def test_uniform_blocks_decode_exactly():
    for w, h, ri in ((8, 8, 0), (32, 24, 0), (32, 24, 2), (64, 16, 3)):
        buf = jpegc.make_jpeg_baseline(w, h, _bv_gray, restart_interval=ri)
        st = jpegc.jpeg_pixel_stats(buf)
        assert (st["width"], st["height"]) == (w, h)
        want = sum(
            ((x // 8) * 29 + (y // 8) * 31 + 7) % 256
            for x in range(w)
            for y in range(h)
        )
        assert st["sum_c0"] == st["sum_c1"] == st["sum_c2"] == want
        assert st["pos_checksum"] == sum(
            (x + y * w) * (((x // 8) * 29 + (y // 8) * 31 + 7) % 256)
            for x in range(w)
            for y in range(h)
        )


def test_three_component_interleaved():
    def bv(ci, bx, by):
        a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
        return (bx * a + by * b + c) % 256

    bv.n_components = 3
    buf = jpegc.make_jpeg_baseline(32, 24, bv, restart_interval=2)
    st = jpegc.jpeg_pixel_stats(buf)
    for key, (a, b, c) in (
        ("sum_c0", (29, 31, 7)),
        ("sum_c1", (17, 23, 5)),
        ("sum_c2", (13, 19, 11)),
    ):
        assert st[key] == sum(
            ((x // 8) * a + (y // 8) * b + c) % 256
            for x in range(32)
            for y in range(24)
        )


def test_lossless_coefficient_roundtrip_random_acs():
    """The entropy layer is lossless: arbitrary quantized coefficient
    blocks survive encode -> decode exactly. Random sparse ACs hit
    zero-runs > 16 (ZRL), negative magnitudes, EOB placement, and
    DC-difference sign branches the uniform fixtures never touch."""
    rng = np.random.RandomState(7)
    for trial in range(12):
        stored = {}

        def bv(ci, bx, by):
            c = np.zeros((8, 8), dtype=np.int64)
            c[0, 0] = int(rng.randint(-1000, 1000))
            for _ in range(rng.randint(0, 6)):
                i, j = rng.randint(0, 8), rng.randint(0, 8)
                if (i, j) != (0, 0):
                    c[i, j] = int(rng.randint(-255, 256))
            stored[(ci, bx, by)] = c.copy()
            return c

        bv.n_components = 2 if trial % 2 else 1
        ri = (0, 1, 2)[trial % 3]
        buf = jpegc.make_jpeg_baseline(24, 16, bv, restart_interval=ri)
        w, h, samp, got = jpegc.jpeg_decode_coeffs(buf)
        assert (w, h, len(got)) == (24, 16, bv.n_components)
        assert samp == [(1, 1)] * bv.n_components
        for by in range(2):
            for bx in range(3):
                for ci in range(bv.n_components):
                    assert np.array_equal(
                        got[ci][by, bx], stored[(ci, bx, by)]
                    ), (trial, ci, bx, by)


def test_full_range_dc_and_extremes():
    """A DC walk whose successive differences hit every category
    1..11 plus category 0 (zero diff — the repeated-value path);
    diffs beyond the baseline 11-bit range are an encoder
    ValueError, not a KeyError."""
    vals = [0, 1, -1, 2, -2, 16, -16, 100, -100, 923, -923, 1023]

    def bv(ci, bx, by):
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = vals[(by * 4 + bx) % len(vals)]
        return c

    buf = jpegc.make_jpeg_baseline(32, 24, bv)
    _, _, _, got = jpegc.jpeg_decode_coeffs(buf)
    for m in range(12):
        by, bx = divmod(m, 4)
        assert got[0][by, bx, 0, 0] == vals[m % len(vals)]

    def bv_wild(ci, bx, by):
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = 2047 if bx % 2 else -2047
        return c

    with pytest.raises(ValueError, match="11-bit range"):
        jpegc.make_jpeg_baseline(16, 8, bv_wild)


def test_structural_fuzz_value_errors():
    buf = jpegc.make_jpeg_baseline(16, 16, _bv_gray, restart_interval=1)
    with pytest.raises(ValueError, match="bad SOI"):
        jpegc.jpeg_decode_coeffs(b"\x00" + buf)
    with pytest.raises(ValueError, match="truncated segment|missing SOF"):
        jpegc.jpeg_decode_coeffs(buf[:20])
    # chop the entropy stream mid-scan
    with pytest.raises(ValueError, match="ran out|missing restart"):
        jpegc.jpeg_decode_coeffs(buf[:-10])
    # kill the DHT segment -> missing Huffman table
    at = buf.index(b"\xff\xc4")
    (ln,) = struct.unpack(">H", buf[at + 2 : at + 4])
    with pytest.raises(ValueError, match="missing Huffman"):
        jpegc.jpeg_decode_coeffs(buf[:at] + buf[at + 2 + ln :])
    # corrupt a restart marker id -> resync failure
    r_at = buf.index(b"\xff\xd0")
    bad = buf[:r_at] + b"\xff\xd5" + buf[r_at + 2 :]
    with pytest.raises(ValueError, match="missing restart"):
        jpegc.jpeg_decode_coeffs(bad)


def test_unsupported_modes_stay_gated():
    buf = jpegc.make_jpeg_baseline(16, 16, _bv_gray)
    at = buf.index(b"\xff\xc0")
    # lossless sequential (SOF3) and arithmetic coding (SOF9) are
    # genuinely different coding systems — still gated
    for m in (0xC3, 0xC9):
        other = buf[:at] + bytes([0xFF, m]) + buf[at + 2 :]
        with pytest.raises(NotImplementedError, match="SOF marker"):
            jpegc.jpeg_decode_coeffs(other)
    # a progressive header over a baseline full-band scan body is a
    # structural error, not a gate (progressive decodes for real now)
    prog = buf[:at] + b"\xff\xc2" + buf[at + 2 :]
    with pytest.raises(ValueError, match="progressive DC scan"):
        jpegc.jpeg_decode_coeffs(prog)
    # r9: ALL legal sampling factors (1-4) decode — the gate is gone;
    # OUT-OF-SPEC factors (0 or >4, B.2.2) are structural errors
    sof_body = at + 4
    samp_at = sof_body + 6 + 1  # first component: id, THEN sampling
    for bad in (0x05, 0x51, 0x01, 0x10):
        sub = buf[:samp_at] + bytes([bad]) + buf[samp_at + 1 :]
        with pytest.raises(ValueError, match="sampling factors must be 1-4"):
            jpegc.jpeg_decode_coeffs(sub)


def test_general_sampling_grids_decode_exactly():
    """r9: every legal sampling grid (factors 1-4, spec B.2.2)
    decodes — 4:1:1 video-derived layout, restart markers across wide
    MCUs, and NON-DIVISOR ratios (hi=2 under hmax=3) through the
    A.1.1 index-map upsample."""

    def check(w, h, samp, restart=0):
        def bv(ci, bx, by):
            a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
            return (bx * a + by * b + 3 * c) % 256

        bv.n_components = 3
        buf = jpegc.make_jpeg_baseline(
            w, h, bv, restart_interval=restart, subsampling=samp
        )
        s = jpegc.jpeg_pixel_stats(buf)
        assert (s["width"], s["height"]) == (w, h)
        sl = samp if isinstance(samp, list) else [(4, 1), (1, 1), (1, 1)]
        hmax = max(x[0] for x in sl)
        vmax = max(x[1] for x in sl)
        for ci, (hi, vi) in enumerate(sl):
            a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
            exp = sum(
                (((x * hi) // hmax // 8) * a
                 + ((y * vi) // vmax // 8) * b + 3 * c) % 256
                for y in range(h)
                for x in range(w)
            )
            assert s[f"sum_c{ci}"] == exp, (samp, ci)

    check(32, 8, "411")
    check(64, 16, "411", restart=2)
    check(24, 16, [(3, 2), (1, 1), (1, 1)])
    check(32, 32, [(4, 4), (2, 1), (1, 2)])
    check(24, 24, [(3, 3), (2, 2), (1, 1)])  # non-divisor 2-under-3


def test_progressive_general_sampling_matches_baseline():
    """Progressive re-orders the same coefficients: a 4:1:1 SOF2 file
    must decode to the baseline fixture's exact stats."""

    def bv(ci, bx, by):
        a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
        return (bx * a + by * b + 5 * c) % 256

    bv.n_components = 3
    base = jpegc.jpeg_pixel_stats(
        jpegc.make_jpeg_baseline(32, 16, bv, subsampling="411")
    )
    for successive in (False, True):
        prog = jpegc.jpeg_pixel_stats(
            jpegc.make_jpeg_progressive(
                32, 16, bv, subsampling="411", successive=successive
            )
        )
        assert prog == base


def test_untrusted_sof_dims_bounded_before_allocation():
    # a ~300-byte file declaring 65504x65504 must raise ValueError in
    # the SOF handler, never reach the ~34 GB _ScanState allocation
    buf = jpegc.make_jpeg_baseline(16, 16, _bv_gray)
    at = buf.index(b"\xff\xc0")
    dims_at = at + 4 + 1  # marker(2) + len(2) + precision(1) -> h, w
    huge = (
        buf[:dims_at]
        + struct.pack(">HH", 65504, 65504)
        + buf[dims_at + 4 :]
    )
    with pytest.raises(ValueError, match="exceeds decode cap"):
        jpegc.jpeg_decode_coeffs(huge)
    # zero dimension: ValueError like the BMP/PNG paths, not a
    # zero-pixel "success"
    zero = (
        buf[:dims_at] + struct.pack(">HH", 0, 16) + buf[dims_at + 4 :]
    )
    with pytest.raises(ValueError, match="zero dimension"):
        jpegc.jpeg_decode_coeffs(zero)


def test_byte_stuffing_on_the_wire():
    """A coefficient stream that emits 0xFF bytes must be stuffed with
    0x00 on the wire and unstuffed on decode — craft DCs until the
    entropy bytes actually contain an 0xFF."""
    rng = np.random.RandomState(3)
    hit = False
    for _ in range(200):
        dc = int(rng.randint(-2000, 2000))

        def bv(ci, bx, by, _dc=dc):
            c = np.zeros((8, 8), dtype=np.int64)
            c[0, 0] = _dc
            c[0, 1] = int(rng.randint(-100, 100))
            return c

        buf = jpegc.make_jpeg_baseline(8, 8, bv)
        scan_at = buf.index(b"\xff\xda")
        if b"\xff\x00" in buf[scan_at:]:
            hit = True
            _, _, _, got = jpegc.jpeg_decode_coeffs(buf)
            assert got[0][0, 0, 0, 0] == dc
    assert hit, "no stuffed byte was ever produced — weak test"


def test_420_subsampling_decodes_exactly():
    """4:2:0 — the dominant real-world layout: luma 2x2 blocks per
    MCU, chroma at quarter resolution upsampled by replication. With
    per-block uniform values the decode is exact, so luma follows the
    8x8-grid rule and each chroma pixel equals its MCU's 16x16-grid
    rule value."""
    def bv(ci, bx, by):
        a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
        return (bx * a + by * b + c) % 256

    bv.n_components = 3
    for w, h, ri in ((16, 16, 0), (48, 32, 0), (48, 32, 2)):
        buf = jpegc.make_jpeg_baseline(
            w, h, bv, restart_interval=ri, subsampling="420"
        )
        st = jpegc.jpeg_pixel_stats(buf)
        assert (st["width"], st["height"]) == (w, h)
        # luma: full-resolution 8x8 block grid
        assert st["sum_c0"] == sum(
            ((x // 8) * 29 + (y // 8) * 31 + 7) % 256
            for x in range(w)
            for y in range(h)
        )
        # chroma: 16x16 MCU grid, replicated to full resolution
        assert st["sum_c1"] == sum(
            ((x // 16) * 17 + (y // 16) * 23 + 5) % 256
            for x in range(w)
            for y in range(h)
        )
        assert st["pos_checksum"] == sum(
            (x + y * w) * (((x // 16) * 13 + (y // 16) * 19 + 11) % 256)
            for x in range(w)
            for y in range(h)
        )


def test_420_lossless_coefficient_roundtrip():
    """The entropy layer stays lossless under 4:2:0 interleaving:
    random coefficient blocks in every component's own grid survive
    encode -> decode exactly (luma grid 2x the chroma grid)."""
    rng = np.random.RandomState(11)
    stored = {}

    def bv(ci, bx, by):
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = int(rng.randint(-900, 900))
        for _ in range(rng.randint(0, 5)):
            i, j = rng.randint(0, 8), rng.randint(0, 8)
            if (i, j) != (0, 0):
                c[i, j] = int(rng.randint(-200, 201))
        stored[(ci, bx, by)] = c.copy()
        return c

    bv.n_components = 3
    buf = jpegc.make_jpeg_baseline(48, 32, bv, subsampling="420",
                                   restart_interval=1)
    w, h, samp, got = jpegc.jpeg_decode_coeffs(buf)
    assert samp == [(2, 2), (1, 1), (1, 1)]
    assert got[0].shape[:2] == (4, 6)  # luma blocks
    assert got[1].shape[:2] == (2, 3)  # chroma blocks
    for (ci, bx, by), want in stored.items():
        assert np.array_equal(got[ci][by, bx], want), (ci, bx, by)


def test_jpeg_spark_stage(spark):
    rows = []
    for i in (0, 1, 5, 10):
        def bv(ci, bx, by, _id=i):
            return (bx * 29 + by * 31 + _id * 7) % 256

        rows.append(
            (i, jpegc.make_jpeg_baseline(
                8 * ((i % 4) + 1), 8 * ((i % 3) + 1), bv,
                restart_interval=2 if i % 2 else 0,
            ))
        )
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r
        for r in jpegc.decode_jpeg_pixels(df).collect()
    }
    for i in (0, 1, 5, 10):
        w, h = 8 * ((i % 4) + 1), 8 * ((i % 3) + 1)
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        want = round(
            sum(
                ((x // 8) * 29 + (y // 8) * 31 + i * 7) % 256
                for x in range(w)
                for y in range(h)
            ) / (w * h),
            6,
        )
        assert got[i]["mean_c0"] == pytest.approx(want, abs=1e-6)


def test_progressive_uniform_matches_baseline():
    """Progressive (SOF2) stores the same coefficients in a different
    scan order — decoded content must equal baseline exactly, for both
    spectral-selection-only and full successive-approximation scripts,
    444 and 420."""
    base = jpegc.jpeg_pixel_stats(jpegc.make_jpeg_baseline(32, 24, _bv_gray))
    for successive in (False, True):
        st = jpegc.jpeg_pixel_stats(
            jpegc.make_jpeg_progressive(32, 24, _bv_gray,
                                        successive=successive)
        )
        assert st == base, successive

    def bv3(ci, bx, by):
        a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
        return (bx * a + by * b + c) % 256

    bv3.n_components = 3
    for sub, dims in (("444", (32, 24)), ("420", (48, 32))):
        base = jpegc.jpeg_pixel_stats(
            jpegc.make_jpeg_baseline(*dims, bv3, subsampling=sub)
        )
        st = jpegc.jpeg_pixel_stats(
            jpegc.make_jpeg_progressive(*dims, bv3, subsampling=sub,
                                        successive=True)
        )
        assert st == base, sub


def test_progressive_lossless_roundtrip_random_acs():
    """The full successive-approximation machinery — EOBn run codes,
    ZRL windows bounded by the last newly-nonzero position, deferred
    vs block-local correction-bit buffers — is LOSSLESS at the
    coefficient level."""
    rng = np.random.RandomState(5)
    for trial in range(24):
        stored = {}

        def bv(ci, bx, by):
            c = np.zeros((8, 8), dtype=np.int64)
            c[0, 0] = int(rng.randint(-900, 900))
            for _ in range(rng.randint(0, 7)):
                i, j = rng.randint(0, 8), rng.randint(0, 8)
                if (i, j) != (0, 0):
                    c[i, j] = int(rng.randint(-255, 256))
            stored[(ci, bx, by)] = c.copy()
            return c

        nc = (1, 2, 3)[trial % 3]
        bv.n_components = nc
        sub = "420" if (nc == 3 and trial % 2) else "444"
        dims = (48, 32) if sub == "420" else (24, 16)
        buf = jpegc.make_jpeg_progressive(
            *dims, bv, subsampling=sub, successive=(trial % 4 < 2)
        )
        _, _, _, got = jpegc.jpeg_decode_coeffs(buf)
        for (ci, bx, by), want in stored.items():
            assert np.array_equal(got[ci][by, bx], want), (trial, ci, bx, by)


def test_progressive_two_buffer_regression():
    """Pin the exact case that exposed the single-buffer bug: a block
    whose tail joins an EOB run while the NEXT block has a history
    coefficient before its first ZRL — the deferred bits must flush
    with the EOBn, the block-local bit after the ZRL, or the decoder
    reads a correction bit as part of a Huffman code."""
    b0 = np.zeros((8, 8), dtype=np.int64)
    b0.reshape(-1)[2], b0.reshape(-1)[7], b0.reshape(-1)[51] = 200, -100, -2
    b1 = np.zeros((8, 8), dtype=np.int64)
    b1.reshape(-1)[18], b1.reshape(-1)[39], b1.reshape(-1)[45] = -2, 1, -100
    b2 = np.zeros((8, 8), dtype=np.int64)
    blocks = [b0, b1, b2]

    def bv(ci, bx, by):
        return blocks[bx]

    buf = jpegc.make_jpeg_progressive(24, 8, bv, successive=True)
    _, _, _, got = jpegc.jpeg_decode_coeffs(buf)
    for bx, want in enumerate(blocks):
        assert np.array_equal(got[0][0, bx], want), bx


def test_422_subsampling_decodes_exactly():
    """4:2:2 (chroma halved horizontally only): luma follows the 8x8
    grid, chroma the 16x8 cell grid after horizontal replication —
    both baseline and progressive encoders produce it and the decoder
    handles any 1-2 factor mix."""
    def bv(ci, bx, by):
        a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
        return (bx * a + by * b + c) % 256

    bv.n_components = 3
    for maker in (
        lambda: jpegc.make_jpeg_baseline(48, 24, bv, subsampling="422"),
        lambda: jpegc.make_jpeg_progressive(
            48, 24, bv, subsampling="422", successive=True
        ),
    ):
        st = jpegc.jpeg_pixel_stats(maker())
        assert st["sum_c0"] == sum(
            ((x // 8) * 29 + (y // 8) * 31 + 7) % 256
            for x in range(48)
            for y in range(24)
        )
        assert st["sum_c1"] == sum(
            ((x // 16) * 17 + (y // 8) * 23 + 5) % 256
            for x in range(48)
            for y in range(24)
        )
        assert st["pos_checksum"] == sum(
            (x + y * 48) * (((x // 16) * 13 + (y // 8) * 19 + 11) % 256)
            for x in range(48)
            for y in range(24)
        )


def test_pixel_stats_dispatch_includes_jpeg():
    """The magic-byte dispatch decodes BMP, PNG, and JPEG payloads in
    one contract; JPEG's raw components ride the r/g/b slots with the
    checksum on the last component."""
    from scicat_ingestor_spark.operators import multimodal

    st = multimodal.pixel_stats(
        jpegc.make_jpeg_progressive(16, 8, _bv_gray, successive=True)
    )
    want = sum(
        ((x // 8) * 29 + 7) % 256 for x in range(16) for y in range(8)
    )
    assert st["sum_b"] == st["sum_g"] == st["sum_r"] == want


def test_bit_accumulators_stay_bounded():
    """The bit reader/writer must mask their accumulators to live
    bits — an unmasked bigint accumulator made decode O(n^2) in scan
    size (review finding): every consumed byte stayed in acc forever."""
    br = jpegc._BitReader(b"\x55" * 4096, 0)
    for _ in range(4000):
        br.bits(8)
    assert br.acc.bit_length() <= 16
    bw = jpegc._BitWriter()
    for i in range(4000):
        bw.put(i & 0x3FF, 11)
    assert bw.acc.bit_length() <= 8


def test_decode_scales_linearly_not_quadratically():
    """Same review finding, end to end: doubling the pixel count must
    not quadruple-plus the decode time. Generous 3.5x bound per 4x
    pixels so scheduler noise can't flake it, but the pre-fix ~10x
    growth always fails."""
    import time

    rng = np.random.RandomState(1)

    def bv(ci, bx, by):
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = int(rng.randint(-900, 900))
        for _ in range(4):
            c[rng.randint(0, 8), rng.randint(0, 8)] = int(
                rng.randint(-200, 200)
            )
        return c

    bufs = {n: jpegc.make_jpeg_baseline(n, n, bv) for n in (64, 128, 256)}

    def t(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jpegc.jpeg_decode_coeffs(bufs[n])
            best = min(best, time.perf_counter() - t0)
        return best

    t128, t256 = t(128), t(256)
    assert t256 < t128 * 6.0, (t128, t256)


def test_fill_bytes_before_markers_are_legal():
    """0xFF pad bytes before a marker (spec B.1.1.2) must be skipped,
    not parsed as a marker with a garbage length."""
    buf = jpegc.make_jpeg_baseline(16, 16, _bv_gray)
    want = jpegc.jpeg_pixel_stats(buf)
    at = buf.index(b"\xff\xdb")  # pad before the DQT marker
    padded = buf[:at] + b"\xff\xff\xff" + buf[at:]
    assert jpegc.jpeg_pixel_stats(padded) == want


def test_baseline_per_component_scans_use_component_grid():
    """A legal baseline 4:2:0 file written as three per-component
    full-band scans (T.81 A.2.2 — some transcoders emit this): each
    non-interleaved scan walks the COMPONENT's own block grid, not
    hi*vi MCU geometry (review finding: the luma scan was consuming
    4x too many data units)."""
    import struct as _struct

    def bv(ci, bx, by):
        a, b, c = ((29, 31, 7), (17, 23, 5), (13, 19, 11))[ci]
        return (bx * a + by * b + c) % 256

    bv.n_components = 3
    w, h = 48, 32
    want = jpegc.jpeg_pixel_stats(
        jpegc.make_jpeg_baseline(w, h, bv, subsampling="420")
    )
    # hand-build the same image as three sequential scans
    samp = [(2, 2), (1, 1), (1, 1)]
    dc_codes = jpegc._canonical_codes(jpegc.DC_BITS, jpegc.DC_VALS)
    ac_codes = jpegc._canonical_codes(jpegc.AC_BITS, jpegc.AC_VALS)
    out = bytearray(b"\xff\xd8")
    out += jpegc._seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += jpegc._seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += jpegc._seg(0xC0, sof)
    out += jpegc._seg(
        0xC4,
        bytes([0x00]) + bytes(jpegc.DC_BITS) + bytes(jpegc.DC_VALS)
        + bytes([0x10]) + bytes(jpegc.AC_BITS) + bytes(jpegc.AC_VALS),
    )
    for ci in range(3):
        hi, vi = samp[ci]
        bx_n = ((w * hi + 1) // 2 + 7) // 8
        by_n = ((h * vi + 1) // 2 + 7) // 8
        out += jpegc._seg(0xDA, bytes([1, ci + 1, 0x00, 0, 63, 0]))
        bw = jpegc._BitWriter()
        dc_pred = {ci: 0}
        for b in range(by_n * bx_n):
            by, bx = divmod(b, bx_n)
            coeffs = jpegc._coeffs_for(bv, ci, bx, by)
            jpegc._encode_block(bw, coeffs, dc_pred, ci, dc_codes, ac_codes)
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    assert jpegc.jpeg_pixel_stats(bytes(out)) == want
