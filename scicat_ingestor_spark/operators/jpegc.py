"""Baseline JPEG entropy codec — pure Python/numpy, no codec library.

r8 fifth pass: the LAST image-side ``NotImplementedError`` gate was
"JPEG entropy-coded scans". Baseline JPEG entropy decoding is Huffman
prefix codes + zero-run-length coding + zigzag + dequantize + IDCT —
all of it spec-defined arithmetic (ITU-T T.81), none of it requiring a
codec library. This module implements BOTH directions:

- an encoder that writes real JFIF baseline files (SOI/DQT/SOF0/DHT/
  SOS/EOI, standard Annex-K luminance Huffman tables, byte stuffing,
  optional restart intervals) from arbitrary quantized coefficient
  blocks, and
- a decoder that reads ANY baseline JPEG structurally: DQT/DHT tables
  from the file itself, interleaved or single-component scans,
  restart-marker resync, 0xFF00 unstuffing, then dequantize →
  de-zigzag → float64 IDCT → level shift.

Fixture strategy (the oracle problem for a LOSSY codec): quant tables
of ones + per-block UNIFORM pixel values make the DCT exact — a
uniform block is DC-only (DC = 8*(v-128)) and its IDCT is exactly
flat, so the decoded pixels equal the closed form and a SQL oracle
can recompute every statistic. The entropy layer is additionally
round-trip tested LOSSLESSLY at the coefficient level (encode random
coefficient blocks → decode → exact equality), which exercises AC
run-lengths, ZRL, EOB, and both DC-difference sign branches — paths a
DC-only fixture would never touch.

Honesty: baseline sequential (SOF0/SOF1) AND progressive (SOF2)
huffman decode are REAL here — full spectral selection + successive
approximation, EOBn run codes, restart resync. All legal
sampling grids decode (factors 1-4 each way, spec B.2.2 — 4:1:1
included, r9). Still gated: arithmetic-coded (SOF9/SOF10), lossless,
and hierarchical variants. At scale the decode is scan-local
Arrow-batched ``mapInPandas``, numpy-vectorized across blocks.
"""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hard ceiling on w*h accepted by the decoder (16.7M px ~ 4096x4096):
# bounds the untrusted-header coefficient-grid allocation at ~128 MB
# per component. Shared by the BMP RLE path in multimodal.py.
MAX_DECODE_PIXELS = 1 << 24

# zigzag[k] = natural (row*8+col) position of the k-th zigzag element
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# Annex K.3.3.1/2 luminance tables (public spec constants). The
# decoder NEVER assumes these — it reads DHT from the file; the
# encoder just has to pick some valid tables.
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


# Progressive AC alphabet: EOBn run codes (r<<4, r 0..14), ZRL, and
# every (run, size) pair — symbols the Annex-K BASELINE table lacks
# (it has no EOBn entries). A flat one-length canonical code is a
# legal Huffman table; the decoder reads whatever DHT the file carries,
# so the choice only affects fixture size, not decode generality.
PROG_AC_VALS = tuple(
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC_BITS = tuple(
    len(PROG_AC_VALS) if ln == 8 else 0 for ln in range(1, 17)
)


def _canonical_codes(bits, vals):
    """Canonical Huffman assignment (spec C.2): returns
    {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """Decode-side canonical table: {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing (spec F.1.2.3)
        # keep only the live bits: an unmasked accumulator grows into
        # an unbounded bigint and every shift becomes O(total bits) —
        # quadratic over the scan (measured 10x time per 4x bytes)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec F.1.2.3)."""
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("not a JPEG: entropy stream ran out")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("not a JPEG: dangling 0xFF")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed byte
            else:
                # a real marker inside the scan: the caller should
                # have stopped (EOI/RST handled at MCU boundaries)
                raise ValueError(
                    f"not a JPEG: unexpected marker 0xFF{nxt:02X} in scan"
                )
        else:
            self.pos += 1
        # mask to live bits — see _BitWriter.put on the quadratic trap
        self.acc = (((self.acc << 8) | b) & ((1 << (self.n + 8)) - 1))
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("not a JPEG: invalid Huffman code")

    def align_restart(self, expect_n: int) -> None:
        """Byte-align and consume the RSTn marker (spec E.2.4)."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 2 > len(self.buf)
            or self.buf[self.pos] != 0xFF
            or self.buf[self.pos + 1] != 0xD0 + (expect_n & 7)
        ):
            raise ValueError("not a JPEG: missing restart marker")
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + extra bits (spec F.1.2.1)."""
    t = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _extend(bits: int, t: int) -> int:
    if t == 0:
        return 0
    return bits if bits >= (1 << (t - 1)) else bits - (1 << t) + 1


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _samp_for(subsampling, ncomp: int, width: int, height: int):
    """Sampling-factor lists for the fixture encoders: 4:4:4 (dims
    multiples of 8), 4:2:0 (multiples of 16), 4:2:2 (width multiple
    of 16, height of 8 — chroma halved horizontally only), 4:1:1
    (width multiple of 32 — the video-derived layout, r9), or an
    EXPLICIT list of (h, v) pairs (each 1-4, dims multiples of the
    8*hmax x 8*vmax MCU) for arbitrary general-grid fixtures."""
    if isinstance(subsampling, (tuple, list)):
        samp = [tuple(map(int, s)) for s in subsampling]
        if len(samp) != ncomp:
            raise ValueError("explicit sampling needs one pair per component")
        if any(not (1 <= h <= 4 and 1 <= v <= 4) for h, v in samp):
            raise ValueError("sampling factors must be 1-4")
        hmax = max(h for h, _ in samp)
        vmax = max(v for _, v in samp)
        if width % (8 * hmax) or height % (8 * vmax) or width <= 0 or height <= 0:
            raise ValueError(
                f"fixture dims must be multiples of {8 * hmax}x{8 * vmax}"
            )
        return samp
    if subsampling == "444":
        if width % 8 or height % 8 or width <= 0 or height <= 0:
            raise ValueError("fixture dims must be multiples of 8")
        return [(1, 1)] * ncomp
    if ncomp != 3:
        raise ValueError(f"{subsampling} requires exactly 3 components")
    if subsampling == "420":
        if width % 16 or height % 16 or width <= 0 or height <= 0:
            raise ValueError("4:2:0 fixture dims must be multiples of 16")
        return [(2, 2), (1, 1), (1, 1)]
    if subsampling == "422":
        if width % 16 or height % 8 or width <= 0 or height <= 0:
            raise ValueError("4:2:2 fixture dims must be 16x8 multiples")
        return [(2, 1), (1, 1), (1, 1)]
    if subsampling == "411":
        if width % 32 or height % 8 or width <= 0 or height <= 0:
            raise ValueError("4:1:1 fixture dims must be 32x8 multiples")
        return [(4, 1), (1, 1), (1, 1)]
    raise ValueError(f"unsupported subsampling {subsampling!r}")


def _encode_block(bw, coeffs, dc_pred, ci, dc_codes, ac_codes) -> None:
    zz = coeffs.reshape(-1)[list(ZIGZAG)]
    diff = int(zz[0]) - dc_pred[ci]
    dc_pred[ci] = int(zz[0])
    t, bits = _magnitude(diff)
    if t > 11:
        raise ValueError("DC difference exceeds the baseline 11-bit range")
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(bits, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        t, bits = _magnitude(int(zz[k]))
        if t > 10:
            raise ValueError(
                "AC coefficient exceeds the baseline 10-bit range"
            )
        code, ln = ac_codes[(run << 4) | t]
        bw.put(code, ln)
        bw.put(bits, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)


def make_jpeg_baseline(
    width: int,
    height: int,
    block_values,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Real JFIF baseline JPEG from per-block COEFFICIENT arrays.

    ``block_values(ci, bx, by) -> int | np.ndarray`` returns, for
    component ``ci`` and block (bx, by) IN THAT COMPONENT'S OWN block
    grid, either a scalar — a UNIFORM pixel value 0..255, stored as
    its exact DC-only transform — or a full (8, 8) int array of
    quantized coefficients in natural order (the lossless-roundtrip
    test path). The number of components is probed from the callable's
    ``n_components`` attribute (default 1).

    ``subsampling`` "444" (every component full resolution, dims
    multiples of 8) or "420" (3 components, luma 2x2 per MCU, chroma
    quarter resolution — the dominant real-world layout; dims
    multiples of 16). Quant table is all ones (so uniform blocks are
    exact) and every component shares the Annex-K luminance Huffman
    tables — legal, and the decoder reads tables from the file
    anyway."""
    ncomp = getattr(block_values, "n_components", 1)
    samp = _samp_for(subsampling, ncomp, width, height)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id 0, ones
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += _seg(0xC0, sof)  # SOF0 baseline
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS),
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux_n = width // (8 * hmax)
    mcuy_n = height // (8 * vmax)

    bw = _BitWriter()
    dc_pred = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcuy_n):
        for mx in range(mcux_n):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                dc_pred = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for dv in range(vi):
                    for dh in range(hi):
                        _encode_block(
                            bw,
                            _coeffs_for(
                                block_values, ci,
                                mx * hi + dh, my * vi + dv,
                            ),
                            dc_pred, ci, dc_codes, ac_codes,
                        )
            mcu += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _coeffs_for(block_values, ci: int, bx: int, by: int):
    """Resolve a block_values callback result to an 8x8 natural-order
    coefficient array: a scalar is a UNIFORM pixel value stored as its
    exact DC-only transform (DC = 8*(v-128)); anything else must be a
    full 8x8 quantized-coefficient array. Shared by the baseline and
    progressive encoders so the scalar rule can never diverge."""
    v = block_values(ci, bx, by)
    if np.isscalar(v):
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = 8 * (int(v) - 128)
        return c
    c = np.asarray(v, dtype=np.int64)
    if c.shape != (8, 8):
        raise ValueError("coefficient block must be 8x8")
    return c


def _emit_eobrun_sym(bw, ac_codes, eobrun: int) -> None:
    """Emit one EOBn symbol + its extension bits for a pending run —
    the single definition both progressive AC emitters share."""
    r = eobrun.bit_length() - 1
    code, ln = ac_codes[r << 4]
    bw.put(code, ln)
    if r:
        bw.put(eobrun - (1 << r), r)


def _default_progressive_script(ncomp: int, successive: bool):
    """A libjpeg-style scan script. Spectral-selection only
    (``successive=False``): one DC scan + two AC bands per component,
    all at point transform 0. With successive approximation: DC at
    Al=1 then a DC refinement; AC bands first at Al=2, then 2->1 and
    1->0 refinements — every refinement's Ah equals the previous Al,
    as the spec requires."""
    comps_all = list(range(ncomp))
    if not successive:
        script = [(comps_all, 0, 0, 0, 0)]
        for ci in range(ncomp):
            script += [([ci], 1, 5, 0, 0), ([ci], 6, 63, 0, 0)]
        return script
    script = [(comps_all, 0, 0, 0, 1)]
    for ci in range(ncomp):
        script += [([ci], 1, 5, 0, 2), ([ci], 6, 63, 0, 2)]
    for ci in range(ncomp):
        script += [([ci], 1, 5, 2, 1), ([ci], 6, 63, 2, 1)]
    script += [(comps_all, 0, 0, 1, 0)]
    for ci in range(ncomp):
        script += [([ci], 1, 5, 1, 0), ([ci], 6, 63, 1, 0)]
    return script


class _ACRefineEmitter:
    """Encoder-side AC refinement state (the exact mirror of
    ``block_ac_refine``, structured like libjpeg's
    encode_mcu_AC_refine): EOB runs accumulate across blocks; the
    correction bits of history-nonzero coefficients ride a shared
    buffer flushed right after whichever symbol (EOBn / ZRL /
    newly-nonzero) the decoder will be walking under when it reads
    them; ZRL is emitted at the first nonzero encounter once 16
    zero-history slots are pending, and never past the block's last
    newly-nonzero position (the tail joins the EOB run instead)."""

    def __init__(self, bw, ac_codes, al):
        self.bw = bw
        self.ac = ac_codes
        self.al = al
        self.eobrun = 0
        self.pending: list[int] = []

    def _flush_bits(self) -> None:
        for b in self.pending:
            self.bw.put(b, 1)
        self.pending = []

    def _emit_eobrun(self) -> None:
        if self.eobrun:
            _emit_eobrun_sym(self.bw, self.ac, self.eobrun)
            self.eobrun = 0
            self._flush_bits()

    def block(self, zz, ss, se) -> None:
        """Two distinct bit buffers, exactly like libjpeg: ``local``
        holds THIS block's history-coefficient bits since the last
        symbol (flushed right after the block's own ZRL/newly-nonzero
        symbols — the decoder reads them while walking under that
        symbol); at block end any remainder is DEFERRED into
        ``self.pending``, which only the eventual EOBn flush emits
        (the decoder reads those while refining the run's blocks)."""
        al = self.al
        eobpos = ss - 1  # position of the last newly-nonzero coeff
        for k in range(ss, se + 1):
            if (abs(int(zz[k])) >> al) == 1:
                eobpos = k
        run = 0
        local: list[int] = []
        for k in range(ss, se + 1):
            mag = abs(int(zz[k])) >> al
            if mag == 0:
                run += 1
                continue
            while run > 15 and k <= eobpos:
                self._emit_eobrun()
                code, ln = self.ac[0xF0]
                self.bw.put(code, ln)
                run -= 16
                for b in local:
                    self.bw.put(b, 1)
                local = []
            if mag > 1:
                local.append(mag & 1)
                continue
            self._emit_eobrun()
            code, ln = self.ac[(run << 4) | 1]
            self.bw.put(code, ln)
            self.bw.put(1 if zz[k] > 0 else 0, 1)
            for b in local:
                self.bw.put(b, 1)
            local = []
            run = 0
        if run > 0 or local:
            self.eobrun += 1
            self.pending.extend(local)
            if self.eobrun == 0x7FFF:
                self._emit_eobrun()

    def finish(self) -> None:
        self._emit_eobrun()


class _ACFirstEmitter:
    """Encoder-side first-pass AC scan (spectral selection at point
    transform ``al``): band run-lengths with cross-block EOB runs."""

    def __init__(self, bw, ac_codes, al):
        self.bw = bw
        self.ac = ac_codes
        self.al = al
        self.eobrun = 0

    def _flush_eob(self) -> None:
        if self.eobrun:
            _emit_eobrun_sym(self.bw, self.ac, self.eobrun)
            self.eobrun = 0

    def block(self, zz, ss, se) -> None:
        al = self.al
        run = 0
        wrote = False
        for k in range(ss, se + 1):
            v = int(zz[k]) >> al if zz[k] > 0 else -((-int(zz[k])) >> al)
            if v == 0:
                run += 1
                continue
            self._flush_eob()
            while run > 15:
                code, ln = self.ac[0xF0]
                self.bw.put(code, ln)
                run -= 16
            t, bits = _magnitude(v)
            if t > 10:
                raise ValueError(
                    "AC coefficient exceeds the baseline 10-bit range"
                )
            code, ln = self.ac[(run << 4) | t]
            self.bw.put(code, ln)
            self.bw.put(bits, t)
            run = 0
            wrote = True
        if run or not wrote:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def finish(self) -> None:
        self._flush_eob()


def make_jpeg_progressive(
    width: int,
    height: int,
    block_values,
    subsampling: str = "444",
    successive: bool = True,
) -> bytes:
    """Real progressive (SOF2) JFIF file from the same per-block
    COEFFICIENT contract as :func:`make_jpeg_baseline`: the default
    scan script delivers DC first, then the AC spectrum in two bands
    per component — with ``successive=True`` each at point transform 2
    followed by 2->1 and 1->0 refinement passes (the full successive-
    approximation machinery: EOBn run codes, correction-bit buffering,
    newly-nonzero placement). The COEFFICIENTS after all scans equal
    the input exactly, so progressive fixtures share the baseline
    queries' closed-form oracles — a re-ordering of the same data."""
    ncomp = getattr(block_values, "n_components", 1)
    samp = _samp_for(subsampling, ncomp, width, height)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux_n = width // (8 * hmax)
    mcuy_n = height // (8 * vmax)

    # materialize every component's zigzag-domain block grid once
    grids = []
    for ci in range(ncomp):
        hi, vi = samp[ci]
        bx_n, by_n = mcux_n * hi, mcuy_n * vi
        g = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                g[by, bx] = _coeffs_for(
                    block_values, ci, bx, by
                ).reshape(-1)[list(ZIGZAG)]
        grids.append(g)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += _seg(0xC2, sof)  # SOF2 progressive
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS),
    )

    for comps, ss, se, ah, al in _default_progressive_script(
        ncomp, successive
    ):
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        bw = _BitWriter()
        if ss == 0:  # DC scan (interleaved over `comps`)
            dc_pred = {ci: 0 for ci in comps}
            for m in range(mcux_n * mcuy_n):
                my, mx = divmod(m, mcux_n)
                for ci in comps:
                    hi, vi = samp[ci]
                    for dv in range(vi):
                        for dh in range(hi):
                            dcv = int(
                                grids[ci][my * vi + dv, mx * hi + dh, 0]
                            )
                            if ah == 0:
                                approx = dcv >> al
                                diff = approx - dc_pred[ci]
                                dc_pred[ci] = approx
                                t, bits = _magnitude(diff)
                                if t > 11:
                                    raise ValueError(
                                        "DC difference exceeds the "
                                        "baseline 11-bit range"
                                    )
                                code, ln = dc_codes[t]
                                bw.put(code, ln)
                                if t:
                                    bw.put(bits, t)
                            else:
                                bw.put((dcv >> al) & 1, 1)
        else:  # AC scan: exactly one component, non-interleaved
            ci = comps[0]
            hi, vi = samp[ci]
            cw = (width * hi + hmax - 1) // hmax
            ch = (height * vi + vmax - 1) // vmax
            bx_n, by_n = (cw + 7) // 8, (ch + 7) // 8
            em = (
                _ACFirstEmitter(bw, ac_codes, al)
                if ah == 0
                else _ACRefineEmitter(bw, ac_codes, al)
            )
            for b in range(by_n * bx_n):
                by, bx = divmod(b, bx_n)
                em.block(grids[ci][by, bx], ss, se)
            em.finish()
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _idct_basis() -> np.ndarray:
    x = np.arange(8)
    u = np.arange(8)[:, None]
    c = np.where(u == 0, 1 / np.sqrt(2.0), 1.0)
    return 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)


_BASIS = _idct_basis()


def jpeg_decode_coeffs(payload: bytes):
    """Entropy-decode a baseline JPEG to DEQUANTIZED coefficient
    blocks: returns (width, height, samp, comp_blocks) where ``samp``
    is the per-component (h, v) sampling list and ``comp_blocks[ci]``
    is that component's OWN block grid — an (by_n, bx_n, 8, 8) int64
    array in natural (de-zigzagged) order. Handles interleaved scans
    with the full legal 1-4 sampling range (4:4:4, 4:2:0, 4:2:2,
    4:4:0, 4:1:1, and any general h x v grid — r9).
    Tables are read from the FILE (DQT/DHT), never assumed. Lossless —
    the exact inverse of the entropy encoder, which the roundtrip
    tests pin. Structural damage raises ValueError; progressive/
    arithmetic JPEGs raise NotImplementedError (genuinely different
    coding modes)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    sof = None
    restart = 0
    state = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("not a JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xFF:
            # legal fill byte before a marker (spec B.1.1.2): any
            # number of 0xFF pad bytes may precede the marker code
            pos += 1
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("not a JPEG: truncated segment")
        if marker == 0xDB:
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 15
                n = 128 if pq else 64
                raw = body[at + 1 : at + 1 + n]
                if len(raw) < n:
                    raise ValueError("not a JPEG: truncated DQT")
                vals = (
                    np.frombuffer(raw, dtype=">u2")
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8)
                ).astype(np.int64)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[list(ZIGZAG)] = vals
                qt[tq] = tbl.reshape(8, 8)
                at += 1 + n
        elif marker == 0xC4:
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 15
                bits = body[at + 1 : at + 17]
                if len(bits) < 16:
                    raise ValueError("not a JPEG: truncated DHT")
                nvals = sum(bits)
                vals = body[at + 17 : at + 17 + nvals]
                if len(vals) < nvals:
                    raise ValueError("not a JPEG: truncated DHT values")
                table = _decode_table(tuple(bits), tuple(vals))
                (ac_tables if tc else dc_tables)[th] = table
                at += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            precision, h, w, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("not a JPEG: precision must be 8")
            if w == 0 or h == 0:
                # match the BMP/PNG paths' failure-channel contract —
                # a zero-pixel "success" is a silent decode hole
                raise ValueError("not a JPEG: zero dimension")
            if w * h > MAX_DECODE_PIXELS:
                # untrusted SOF dims drive the _ScanState coefficient
                # grids (w*h*8 bytes per component): a ~300-byte file
                # declaring 65504x65504 would allocate ~34 GB before
                # any entropy data is read. Progressive EOBn codes make
                # a payload-proportional bound spec-unsound (one EOBn
                # legally covers 32767 blocks), so the bound is a hard
                # pixel cap — same class as the stsz bound in mp4.py.
                raise ValueError(
                    f"not a JPEG: declared {w}x{h} exceeds decode cap "
                    f"of {MAX_DECODE_PIXELS} pixels"
                )
            comps = []
            for ci in range(nc):
                cid, samp_b, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp_b >> 4, samp_b & 15
                # r9: the full legal T.81 range (1-4 each way — 4:1:1
                # video-derived JPEGs and every general h x v grid).
                # 0 or >4 is out of spec (B.2.2) -> structural error.
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        "not a JPEG: sampling factors must be 1-4 "
                        f"(sampling=0x{samp_b:02X})"
                    )
                comps.append((cid, tq, hi, vi))
            sof = (w, h, comps, progressive)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG decode implemented for baseline sequential and "
                f"progressive huffman only (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("not a JPEG: SOS before SOF")
            if state is None:
                state = _ScanState(sof)
            nc_s = body[0]
            scan_comps = []
            for ci in range(nc_s):
                cid, tabs = body[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cid, tabs >> 4, tabs & 15))
            ss, se, ahal = body[1 + 2 * nc_s : 4 + 2 * nc_s]
            pos = state.process_scan(
                payload, pos + 2 + ln, scan_comps, ss, se,
                ahal >> 4, ahal & 15, dc_tables, ac_tables, restart,
            )
            continue
        pos += 2 + ln
    if sof is None or state is None:
        raise ValueError("not a JPEG: missing SOF/SOS")
    return state.finish(qt)


class _ScanState:
    """Cross-scan coefficient state: per-component zigzag-domain block
    grids accumulated scan by scan — one full-band scan for baseline,
    many partial (spectral-selection / successive-approximation) scans
    for progressive. ``finish`` de-zigzags and dequantizes."""

    def __init__(self, sof):
        self.w, self.h, self.comps, self.progressive = sof
        self.hmax = max(c[2] for c in self.comps)
        self.vmax = max(c[3] for c in self.comps)
        self.mcux_n = (self.w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy_n = (self.h + 8 * self.vmax - 1) // (8 * self.vmax)
        # zigzag-domain coefficient grids at the MCU-padded size
        self.zz = [
            np.zeros((self.mcuy_n * c[3], self.mcux_n * c[2], 64),
                     dtype=np.int64)
            for c in self.comps
        ]

    def _comp_grid(self, ci: int) -> tuple[int, int]:
        """Non-interleaved scan grid: the component's OWN block count,
        NOT MCU-padded (spec A.2.2)."""
        _, _, hi, vi = self.comps[ci]
        cw = (self.w * hi + self.hmax - 1) // self.hmax
        ch = (self.h * vi + self.vmax - 1) // self.vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def process_scan(
        self, payload, data_at, scan_comps, ss, se, ah, al,
        dc_tables, ac_tables, restart,
    ) -> int:
        """Entropy-decode one scan; returns the byte offset just past
        its entropy data (where the next marker begins)."""
        ids = [c[0] for c in self.comps]
        try:
            order = [ids.index(sc[0]) for sc in scan_comps]
        except ValueError:
            raise ValueError("not a JPEG: scan names unknown component")
        if self.progressive:
            if ss == 0 and se != 0:
                raise ValueError("not a JPEG: progressive DC scan with AC band")
            if ss > 0 and (len(order) != 1 or se < ss or se > 63):
                raise ValueError("not a JPEG: bad progressive AC scan header")
        else:
            if (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("not a JPEG: bad sequential scan header")
        br = _BitReader(payload, data_at)
        dc_pred = {ci: 0 for ci in order}
        eob_state = [0]  # EOBRUN carries across blocks within a scan
        rst = [0]

        def tables(pos_in_scan):
            _, dct, act = scan_comps[pos_in_scan]
            dc = dc_tables.get(dct)
            ac = ac_tables.get(act)
            return dc, ac

        def block_full(ci, si, bx, by):
            dc, ac = tables(si)
            if dc is None or ac is None:
                raise ValueError("not a JPEG: missing Huffman table")
            zz = self.zz[ci][by, bx]
            t = br.huff(dc)
            dc_pred[ci] += _extend(br.bits(t), t)
            zz[0] = dc_pred[ci]
            k = 1
            while k < 64:
                sym = br.huff(ac)
                if sym == 0x00:
                    break
                run, t = sym >> 4, sym & 15
                if t == 0:
                    if run != 15:
                        raise ValueError("not a JPEG: bad AC symbol")
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("not a JPEG: AC run overflow")
                zz[k] = _extend(br.bits(t), t)
                k += 1

        def block_dc_first(ci, si, bx, by):
            dc, _ = tables(si)
            if dc is None:
                raise ValueError("not a JPEG: missing Huffman table")
            t = br.huff(dc)
            dc_pred[ci] += _extend(br.bits(t), t)
            self.zz[ci][by, bx, 0] = dc_pred[ci] << al

        def block_dc_refine(ci, si, bx, by):
            if br.bit():
                self.zz[ci][by, bx, 0] |= 1 << al

        def block_ac_first(ci, si, bx, by):
            _, ac = tables(si)
            if ac is None:
                raise ValueError("not a JPEG: missing Huffman table")
            zz = self.zz[ci][by, bx]
            if eob_state[0]:
                eob_state[0] -= 1
                return
            k = ss
            while k <= se:
                sym = br.huff(ac)
                r, s = sym >> 4, sym & 15
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eob_state[0] = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise ValueError("not a JPEG: AC run overflow")
                zz[k] = _extend(br.bits(s), s) << al
                k += 1

        def _refine_nonzero(zz, k):
            if br.bit() and (abs(int(zz[k])) & (1 << al)) == 0:
                zz[k] += (1 << al) if zz[k] > 0 else -(1 << al)

        def block_ac_refine(ci, si, bx, by):
            _, ac = tables(si)
            if ac is None:
                raise ValueError("not a JPEG: missing Huffman table")
            zz = self.zz[ci][by, bx]
            if eob_state[0]:
                eob_state[0] -= 1
                for k in range(ss, se + 1):
                    if zz[k]:
                        _refine_nonzero(zz, k)
                return
            k = ss
            while k <= se:
                sym = br.huff(ac)
                r, s = sym >> 4, sym & 15
                if s == 0:
                    if r < 15:
                        eob_state[0] = (1 << r) - 1 + (
                            br.bits(r) if r else 0
                        )
                        while k <= se:
                            if zz[k]:
                                _refine_nonzero(zz, k)
                            k += 1
                        return
                    newval = 0  # ZRL: skip 16 zero-history slots
                elif s == 1:
                    newval = (1 << al) if br.bit() else -(1 << al)
                else:
                    raise ValueError(
                        "not a JPEG: bad AC refinement symbol"
                    )
                while k <= se:
                    if zz[k]:
                        _refine_nonzero(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1

        if not self.progressive:
            visit = block_full
        elif ss == 0:
            visit = block_dc_first if ah == 0 else block_dc_refine
        else:
            visit = block_ac_first if ah == 0 else block_ac_refine

        def maybe_restart(unit):
            if restart and unit and unit % restart == 0:
                br.align_restart(rst[0])
                rst[0] += 1
                for ci in dc_pred:
                    dc_pred[ci] = 0
                eob_state[0] = 0

        if len(order) > 1:
            # interleaved MCU order. A SINGLE-component scan — baseline
            # or progressive — is non-interleaved by spec (A.2.2) and
            # iterates the component's OWN unpadded block grid: a
            # baseline 4:2:0 file written as three per-component scans
            # must not be walked in hi*vi MCU geometry (for 1-component
            # FRAMES the two grids coincide, so the else-branch serves
            # them identically)
            for m in range(self.mcux_n * self.mcuy_n):
                maybe_restart(m)
                my, mx = divmod(m, self.mcux_n)
                for si, ci in enumerate(order):
                    _, _, hi, vi = self.comps[ci]
                    for dv in range(vi):
                        for dh in range(hi):
                            visit(ci, si, mx * hi + dh, my * vi + dv)
        else:
            ci = order[0]
            by_n, bx_n = self._comp_grid(ci)
            for b in range(by_n * bx_n):
                maybe_restart(b)
                by, bx = divmod(b, bx_n)
                visit(ci, 0, bx, by)
        return br.pos

    def finish(self, qt):
        comp_blocks = []
        for ci, c in enumerate(self.comps):
            tq = c[1]
            if tq not in qt:
                raise ValueError("not a JPEG: missing quant table")
            by_n, bx_n = self.zz[ci].shape[:2]
            nat = np.zeros((by_n, bx_n, 64), dtype=np.int64)
            nat[:, :, list(ZIGZAG)] = self.zz[ci]
            comp_blocks.append(nat.reshape(by_n, bx_n, 8, 8) * qt[tq])
        samp = [(c[2], c[3]) for c in self.comps]
        return self.w, self.h, samp, comp_blocks


def jpeg_pixel_stats(payload: bytes) -> dict:
    """REAL baseline JPEG pixel decode: entropy decode
    (:func:`jpeg_decode_coeffs`) then float64 IDCT + level shift +
    clip, reduced to the shared content-statistics contract — exact
    per-component integer sums and ``pos_checksum = sum((x + y*width)
    * LAST_COMPONENT(x, y))`` in image row order (the last component
    is B-analog: gray for 1-component files, Cr for YCbCr — matching
    the blue-channel convention of the other decoders). Components
    are reported RAW (no YCbCr->RGB conversion): the entropy decode
    is the hard claim; color conversion is a trivial linear map
    callers can apply. Subsampled chroma planes (4:2:0/4:2:2) are
    upsampled to full resolution by pixel replication before the
    reductions, so the statistics contract is sampling-independent."""
    w, h, samp, comp_blocks = jpeg_decode_coeffs(payload)
    ncomp = len(comp_blocks)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = []
    for ci in range(ncomp):
        blocks = comp_blocks[ci]
        by_n, bx_n = blocks.shape[:2]
        px = np.einsum(
            "ux,nuv,vy->nxy", _BASIS,
            blocks.reshape(-1, 8, 8).astype(np.float64), _BASIS,
        )
        px = np.clip(np.round(px + 128.0), 0, 255).astype(np.int64)
        plane = (
            px.reshape(by_n, bx_n, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by_n * 8, bx_n * 8)
        )
        hi, vi = samp[ci]
        if hi != hmax or vi != vmax:
            # spec A.1.1 sample mapping: full-res (x, y) reads component
            # sample (x*hi//hmax, y*vi//vmax). Index-map instead of
            # np.repeat so NON-DIVISOR ratios (e.g. hi=3 under hmax=4)
            # upsample correctly too; for the divisor cases this is
            # bit-identical to replication.
            xs = (np.arange(w, dtype=np.int64) * hi) // hmax
            ys_m = (np.arange(h, dtype=np.int64) * vi) // vmax
            planes.append(plane[ys_m][:, xs])
        else:
            planes.append(plane[:h, :w])
    ys = np.arange(h, dtype=np.int64)
    weights = np.arange(w, dtype=np.int64)[None, :] + ys[:, None] * w
    sums = [int(p.sum()) for p in planes]
    while len(sums) < 3:
        sums.append(sums[0])
    return {
        "width": int(w),
        "height": int(h),
        "sum_c0": sums[0],
        "sum_c1": sums[1],
        "sum_c2": sums[2],
        "pos_checksum": int((weights * planes[ncomp - 1]).sum()),
    }


_JPEG_RAW_SCHEMA = (
    "media_id long, width int, height int, sum_c0 long, sum_c1 long, "
    "sum_c2 long, pos_checksum long"
)


def decode_jpeg_pixels(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL baseline JPEG decode over (media_id,
    payload): integer component sums Python-side, mean division +
    rounding JVM-side (the shared decode-stage contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [jpeg_pixel_stats(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    **{
                        k: [s[k] for s in stats]
                        for k in (
                            "width", "height", "sum_c0", "sum_c1",
                            "sum_c2", "pos_checksum",
                        )
                    },
                }
            )

    raw = df.mapInPandas(run, schema=_JPEG_RAW_SCHEMA)
    n = (F.col("width") * F.col("height")).cast("double")
    return raw.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("sum_c0") / n, 6).alias("mean_c0"),
        F.round(F.col("sum_c1") / n, 6).alias("mean_c1"),
        F.round(F.col("sum_c2") / n, 6).alias("mean_c2"),
        "pos_checksum",
    )
