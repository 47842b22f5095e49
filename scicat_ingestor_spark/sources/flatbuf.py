"""Minimal pure-Python FlatBuffers table codec for wrdn / pl72 payloads.

The reference deserializes ESS streaming-data-types flatbuffer messages
(/root/reference/src/scicat_kafka.py:113-134 for wrdn, :208-249 for
pl72) via the ``streaming_data_types`` package. That stack is optional
here; this module implements just enough of the public FlatBuffers
binary format (flatbuffers.dev spec: root uoffset, file identifier at
bytes [4:8], signed vtable soffset, per-slot uint16 field offsets,
length-prefixed strings) to decode — and, for test fixtures, encode —
the two flat tables the ingestor needs. No external dependency, no
generated code.

Schemas (public, ess-dmsc/streaming-data-types):

``wrdn_finished_writing.fbs`` — FinishedWriting, identifier "wrdn"::

    service_id: string;        // slot 0
    job_id: string;            // slot 1
    error_encountered: bool;   // slot 2
    file_name: string;         // slot 3
    metadata: string;          // slot 4 (JSON)
    message: string;           // slot 5

``pl72_run_start.fbs`` — RunStart, identifier "pl72"::

    start_time: ulong;         // slot 0
    stop_time: ulong;          // slot 1
    run_name: string;          // slot 2
    instrument_name: string;   // slot 3
    nexus_structure: string;   // slot 4
    job_id: string;            // slot 5
    broker: string;            // slot 6
    service_id: string;        // slot 7
    filename: string;          // slot 8
    detector_spectrum_map: table;  // slot 9 (not read here)
    control_topic: string;     // slot 10
    metadata: string;          // slot 11

If the real ``streaming_data_types`` package is importable it is
preferred by the callers in :mod:`messages`; this codec is the fallback
that keeps the branch exercised in minimal environments.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- reader


def file_identifier(buf: bytes) -> bytes:
    return bytes(buf[4:8])


def _root(buf: bytes) -> int:
    return struct.unpack_from("<I", buf, 0)[0]


def _field_pos(buf: bytes, table: int, slot: int) -> int:
    """Absolute position of a field, or 0 if absent (vtable entry 0 /
    slot beyond this buffer's vtable — both mean 'default')."""
    soff = struct.unpack_from("<i", buf, table)[0]
    vt = table - soff
    vt_size = struct.unpack_from("<H", buf, vt)[0]
    entry = 4 + 2 * slot
    if entry + 2 > vt_size:
        return 0
    off = struct.unpack_from("<H", buf, vt + entry)[0]
    return table + off if off else 0


def _get_string(buf: bytes, table: int, slot: int) -> str | None:
    pos = _field_pos(buf, table, slot)
    if not pos:
        return None
    sp = pos + struct.unpack_from("<I", buf, pos)[0]
    ln = struct.unpack_from("<I", buf, sp)[0]
    return bytes(buf[sp + 4 : sp + 4 + ln]).decode("utf-8")


def _get_bool(buf: bytes, table: int, slot: int, default: bool = False) -> bool:
    pos = _field_pos(buf, table, slot)
    return bool(buf[pos]) if pos else default


def _get_u64(buf: bytes, table: int, slot: int, default: int = 0) -> int:
    pos = _field_pos(buf, table, slot)
    return struct.unpack_from("<Q", buf, pos)[0] if pos else default


def deserialise_wrdn(buf: bytes) -> dict:
    """FinishedWriting -> dict with the same keys the JSON harness and
    the reference's deserialise_wrdn surface. Raises on a wrong file
    identifier (caller treats any raise as a malformed message, T4)."""
    if file_identifier(buf) != b"wrdn":
        raise ValueError(f"not a wrdn buffer: {file_identifier(buf)!r}")
    t = _root(buf)
    return {
        "service_id": _get_string(buf, t, 0),
        "job_id": _get_string(buf, t, 1),
        "error_encountered": _get_bool(buf, t, 2),
        "file_name": _get_string(buf, t, 3),
        "metadata": _get_string(buf, t, 4),
        "message": _get_string(buf, t, 5),
    }


def deserialise_pl72(buf: bytes) -> dict:
    """RunStart -> the fields the ingestor consumes
    (/root/reference/src/scicat_kafka.py:208-249 reads job_id, filename,
    instrument_name)."""
    if file_identifier(buf) != b"pl72":
        raise ValueError(f"not a pl72 buffer: {file_identifier(buf)!r}")
    t = _root(buf)
    return {
        "job_id": _get_string(buf, t, 5),
        "filename": _get_string(buf, t, 8),
        "instrument_name": _get_string(buf, t, 3),
    }


# --------------------------------------------------------------- builder
# Front-to-back single-table builder: [root uoffset][file id][table
# (soffset + inline fields)][vtable][strings]. Valid per spec — offsets
# are arithmetic, not order: the table's soffset may be negative
# (vtable after table) and string uoffsets are forward. Used to produce
# golden fixtures and harness bytes; the reader above accepts buffers
# from ANY conformant builder, including the official one.


def _build_table(fields: list[tuple[str, object]], file_id: bytes) -> bytes:
    if len(file_id) != 4:
        raise ValueError("file identifier must be 4 bytes")
    table = 8
    inline = bytearray()
    slots: list[int] = []
    strings: list[tuple[int, str]] = []  # (field offset in table, value)
    off = 4  # field area starts after the 4-byte soffset
    for kind, val in fields:
        if val is None:
            slots.append(0)
            continue
        if kind == "bool":
            slots.append(off)
            inline += bytes([1 if val else 0, 0, 0, 0])
            off += 4
        elif kind == "u64":
            while (table + off) % 8:
                inline += b"\x00"
                off += 1
            slots.append(off)
            inline += struct.pack("<Q", int(val))
            off += 8
        elif kind == "string":
            slots.append(off)
            strings.append((off, str(val)))
            inline += b"\x00\x00\x00\x00"  # patched below
            off += 4
        else:
            raise ValueError(f"unsupported field kind {kind!r}")
    table_size = 4 + len(inline)
    vt = table + table_size
    if vt % 2:
        inline += b"\x00"
        table_size += 1
        vt += 1
    vt_size = 4 + 2 * len(slots)
    pos = vt + vt_size
    pad_vt = (-pos) % 4
    pos += pad_vt
    str_blob = bytearray()
    for field_off, s in strings:
        data = s.encode("utf-8")
        # patch the uoffset: from the field position to the string
        struct.pack_into("<I", inline, field_off - 4, pos - (table + field_off))
        chunk = struct.pack("<I", len(data)) + data + b"\x00"
        chunk += b"\x00" * ((-len(chunk)) % 4)
        str_blob += chunk
        pos += len(chunk)
    vtable = struct.pack("<HH", vt_size, table_size) + b"".join(
        struct.pack("<H", s) for s in slots
    )
    return (
        struct.pack("<I", table)
        + file_id
        + struct.pack("<i", table - vt)
        + bytes(inline)
        + vtable
        + b"\x00" * pad_vt
        + bytes(str_blob)
    )


def serialise_wrdn(
    *,
    job_id: str,
    file_name: str,
    error_encountered: bool = False,
    metadata: str | None = "",
    message: str | None = "",
    service_id: str | None = "",
) -> bytes:
    """Build a FinishedWriting buffer (same keyword surface as the
    reference's producer, /root/reference/tests/_scicat_ingestor.py:86-93)."""
    return _build_table(
        [
            ("string", service_id),
            ("string", job_id),
            ("bool", error_encountered),
            ("string", file_name),
            ("string", metadata),
            ("string", message),
        ],
        b"wrdn",
    )


def serialise_pl72(
    *,
    job_id: str,
    filename: str,
    instrument_name: str | None = "",
    run_name: str | None = None,
    start_time: int | None = None,
    stop_time: int | None = None,
) -> bytes:
    return _build_table(
        [
            ("u64", start_time),
            ("u64", stop_time),
            ("string", run_name),
            ("string", instrument_name),
            ("string", None),  # nexus_structure
            ("string", job_id),
            ("string", None),  # broker
            ("string", None),  # service_id
            ("string", filename),
            ("string", None),  # detector_spectrum_map (table; unused)
            ("string", None),  # control_topic
            ("string", None),  # metadata
        ],
        b"pl72",
    )
