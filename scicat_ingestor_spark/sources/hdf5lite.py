"""Minimal pure-Python HDF5 reader — the h5py-API subset the S6 walker
needs (`File.visititems`, `Dataset[()]`, `Dataset.attrs`), implemented
clean-room from the public HDF5 File Format Specification
(https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html). No third-party
code; stdlib struct/zlib only.

Scope (enough for real NeXus files like the reference's
/root/reference/test-data/*.hdf, which tests/test_hdf5lite.py reads
end-to-end — every dataset in both files):
- superblock v0/v2/v3, object headers v1 and v2 ("OHDR")
- groups via symbol tables (TREE/SNOD/HEAP), compact link messages, and
  DENSE link storage (link-info message -> fractal heap "FRHP" of link
  messages, name-indexed by a v2 B-tree "BTHD" — the layout h5py writes
  for NeXus trees)
- datasets: compact, contiguous and chunked layout — message v3 (v1
  B-tree chunk index) and v4 (single-chunk index), gzip + shuffle filters
- datatypes: fixed-point, IEEE float, fixed strings, vlen strings
  (global heap), and 1-D/scalar dataspaces (n-D reads return the flat
  list — the walker stringifies anyway)
- attributes (v1/v2/v3 messages), including vlen-string values

This is NOT a general HDF5 implementation; unknown features raise
cleanly so the caller can fall back. It exists so the real (non-fake)
branch of sources/hdf5.py executes in environments without h5py — the
production deployment still prefers h5py when installed.
"""

from __future__ import annotations

import struct
import zlib

UNDEF = 0xFFFFFFFFFFFFFFFF


class Hdf5LiteError(Exception):
    pass


# --------------------------------------------------------------------------
# datatype decoding


class _Dtype:
    """Parsed datatype message: enough to decode raw element bytes."""

    def __init__(self, buf: bytes):
        b0, b8, b16, b24 = buf[0], buf[1], buf[2], buf[3]
        self.cls = b0 & 0x0F
        self.version = (b0 >> 4) & 0x0F
        self.bits = (b8, b16, b24)
        (self.size,) = struct.unpack_from("<I", buf, 4)
        self.little = True
        self.signed = True
        self.base: _Dtype | None = None
        self.is_vlen_string = False
        if self.cls == 0:  # fixed-point
            self.little = not (b8 & 1)
            self.signed = bool(b8 & 8)
        elif self.cls == 1:  # float
            self.little = not (b8 & 1)
        elif self.cls == 3:  # string
            pass
        elif self.cls == 9:  # variable-length
            vtype = b8 & 0x0F
            self.is_vlen_string = vtype == 1
            self.base = _Dtype(buf[8:])
        # other classes (compound, enum, array, reference) are walked as
        # opaque bytes — the NeXus metadata the engine reads never uses
        # them for scalar values

    def decode(self, raw: bytes, n: int, file: "File"):
        """Decode n elements from raw bytes -> python list."""
        out = []
        if self.cls == 3:  # fixed string: one python bytes per element
            for i in range(n):
                s = raw[i * self.size : (i + 1) * self.size]
                out.append(s.split(b"\x00", 1)[0])
            return out
        if self.cls == 9 and self.is_vlen_string:
            for i in range(n):
                off = i * self.size
                (length,) = struct.unpack_from("<I", raw, off)
                addr, idx = struct.unpack_from("<QI", raw, off + 4)
                out.append(file._gheap_object(addr, idx)[:length])
            return out
        endian = "<" if self.little else ">"
        if self.cls == 0:
            code = {1: "b", 2: "h", 4: "i", 8: "q"}.get(self.size)
            if code is None:
                raise Hdf5LiteError(f"int size {self.size}")
            if not self.signed:
                code = code.upper()
            return list(struct.unpack(f"{endian}{n}{code}", raw[: n * self.size]))
        if self.cls == 1:
            code = {4: "f", 8: "d"}.get(self.size)
            if code is None:
                raise Hdf5LiteError(f"float size {self.size}")
            return list(struct.unpack(f"{endian}{n}{code}", raw[: n * self.size]))
        # opaque fallback: raw bytes per element
        return [raw[i * self.size : (i + 1) * self.size] for i in range(n)]


# --------------------------------------------------------------------------
# object header messages


class _Object:
    """Parsed object header: messages accumulated by type."""

    def __init__(self, file: "File", addr: int):
        self.file = file
        self.addr = addr
        self.msgs: list[tuple[int, bytes]] = []
        data = file._data
        ver = data[addr]
        if ver == 1:
            self._parse_v1(addr)
        elif data[addr : addr + 4] == b"OHDR":
            self._parse_v2(addr)
        else:
            raise Hdf5LiteError(f"unknown object header at {addr:#x}")

    def _parse_v1(self, addr: int) -> None:
        data = self.file._data
        nmsgs, = struct.unpack_from("<H", data, addr + 2)
        hdr_size, = struct.unpack_from("<I", data, addr + 8)
        blocks = [(addr + 16, hdr_size)]
        count = 0
        while blocks and count < nmsgs:
            off, length = blocks.pop(0)
            end = off + length
            while off + 8 <= end and count < nmsgs:
                mtype, msize = struct.unpack_from("<HH", data, off)
                body = data[off + 8 : off + 8 + msize]
                off += 8 + msize
                count += 1
                if mtype == 0x10:  # continuation
                    coff, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((coff, clen))
                else:
                    self.msgs.append((mtype, body))

    def _parse_v2(self, addr: int) -> None:
        data = self.file._data
        flags = data[addr + 5]
        off = addr + 6
        if flags & 0x20:
            off += 16  # access/mod/change/birth times (4 x 4 bytes)
        if flags & 0x10:
            off += 4  # max compact / min dense
        size_of_chunk0 = 1 << (flags & 0x3)
        chunk0 = int.from_bytes(data[off : off + size_of_chunk0], "little")
        off += size_of_chunk0
        self._parse_v2_block(off, chunk0, flags, first=True)

    def _parse_v2_block(self, off: int, length: int, flags: int, first: bool) -> None:
        data = self.file._data
        if not first:
            if data[off : off + 4] != b"OCHK":
                raise Hdf5LiteError("bad continuation block")
            off += 4
            length -= 4
        end = off + length - 4  # trailing checksum
        tracked = bool(flags & 0x04)
        while off + 4 <= end:
            mtype = data[off]
            msize, = struct.unpack_from("<H", data, off + 1)
            off += 4
            if tracked:
                off += 2
            body = data[off : off + msize]
            off += msize
            if mtype == 0x10:
                coff, clen = struct.unpack_from("<QQ", body, 0)
                self._parse_v2_block(coff, clen, flags, first=False)
            elif mtype:
                self.msgs.append((mtype, body))

    def first(self, mtype: int) -> bytes | None:
        for t, body in self.msgs:
            if t == mtype:
                return body
        return None

    def all(self, mtype: int) -> list[bytes]:
        return [b for t, b in self.msgs if t == mtype]

    @property
    def is_group(self) -> bool:
        return (
            self.first(0x11) is not None  # symbol table
            or self.first(0x02) is not None  # link info
            or (self.first(0x03) is None and self.first(0x08) is None)
        )


def _dataspace_npoints(body: bytes) -> int:
    ver = body[0]
    ndims = body[1]
    if ver == 1:
        dims_off = 8
    elif ver == 2:
        dims_off = 4
    else:
        raise Hdf5LiteError(f"dataspace v{ver}")
    n = 1
    for d in range(ndims):
        (dim,) = struct.unpack_from("<Q", body, dims_off + 8 * d)
        n *= dim
    return n


def _pad8(n: int) -> int:
    return (n + 7) & ~7


class _Attrs:
    """dict-like over attribute messages (h5py's .attrs.get surface).

    Raises if the object stores attributes DENSELY (attribute-info
    message 0x15 with a defined fractal heap) — silently returning an
    empty attr set would drop `units` without a trace; a clean raise
    makes the caller fall back (h5py) or land the file in the failure
    channel. h5py only goes dense above 8 attributes per object, which
    NeXus metadata trees don't reach (both reference files are compact).
    """

    def __init__(self, obj: _Object):
        ai = obj.first(0x15)
        if ai is not None:
            flags = ai[1]
            off = 2 + (2 if flags & 0x1 else 0)  # max creation index
            (fheap_addr,) = struct.unpack_from("<Q", ai, off)
            if fheap_addr != UNDEF:
                raise Hdf5LiteError("dense attribute storage not supported")
        self._map: dict[str, object] = {}
        for body in obj.all(0x0C):
            try:
                name, value = _parse_attribute(obj.file, body)
            except Hdf5LiteError:
                continue
            self._map[name] = value

    def get(self, key, default=None):
        return self._map.get(key, default)

    def __getitem__(self, key):
        return self._map[key]

    def __contains__(self, key):
        return key in self._map

    def keys(self):
        return self._map.keys()


def _parse_attribute(file: "File", body: bytes):
    ver = body[0]
    if ver == 1:
        name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
        off = 8
        name = body[off : off + name_size].split(b"\x00", 1)[0].decode("utf-8")
        off += _pad8(name_size)
        dt = _Dtype(body[off : off + dt_size])
        off += _pad8(dt_size)
        ds = body[off : off + ds_size]
        off += _pad8(ds_size)
    elif ver in (2, 3):
        name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
        off = 8 + (1 if ver == 3 else 0)
        name = body[off : off + name_size].split(b"\x00", 1)[0].decode("utf-8")
        off += name_size
        dt = _Dtype(body[off : off + dt_size])
        off += dt_size
        ds = body[off : off + ds_size]
        off += ds_size
    else:
        raise Hdf5LiteError(f"attribute v{ver}")
    n = _dataspace_npoints(ds)
    values = dt.decode(body[off:], n, file)
    if n == 1:
        return name, values[0]
    return name, values


# --------------------------------------------------------------------------
# datasets and groups


class Dataset:
    def __init__(self, file: "File", obj: _Object, name: str):
        self._file = file
        self._obj = obj
        self.name = name
        self.attrs = _Attrs(obj)

    def npoints(self) -> int:
        """Element count from the dataspace message alone — no data
        touched, so callers can skip bulk arrays before reading."""
        ds = self._obj.first(0x01)
        if ds is None:
            raise Hdf5LiteError("no dataspace message")
        return _dataspace_npoints(ds)

    def __getitem__(self, key):
        if key != ():
            raise Hdf5LiteError("hdf5lite supports full reads only")
        obj = self._obj
        dt = _Dtype(obj.first(0x03))
        ds = obj.first(0x01)
        n = _dataspace_npoints(ds)
        raw = self._raw_data(dt, n)
        values = dt.decode(raw, n, self._file)
        if n == 1 and ds[1] == 0:  # true scalar dataspace
            return values[0]
        return values

    def _raw_data(self, dt: _Dtype, n: int) -> bytes:
        obj, data = self._obj, self._file._data
        body = obj.first(0x08)
        if body is None:
            raise Hdf5LiteError("no layout message")
        ver = body[0]
        if ver in (3, 4):
            cls = body[1]
            if cls == 0:  # compact (v3 == v4)
                (size,) = struct.unpack_from("<H", body, 2)
                return body[4 : 4 + size]
            if cls == 1:  # contiguous (v3 == v4)
                addr, size = struct.unpack_from("<QQ", body, 2)
                if addr == UNDEF:
                    return b"\x00" * (n * dt.size)
                return data[addr : addr + size]
            if cls == 2 and ver == 3:  # chunked, v1 B-tree index
                ndims = body[2]
                (btree,) = struct.unpack_from("<Q", body, 3)
                chunk_dims = struct.unpack_from(f"<{ndims}I", body, 11)
                return self._read_chunks(btree, chunk_dims[:-1], n, dt)
            if cls == 2 and ver == 4:
                return self._read_chunks_v4(body, n, dt)
        raise Hdf5LiteError(f"layout v{ver}")

    def _read_chunks_v4(self, body: bytes, n: int, dt: _Dtype) -> bytes:
        """Layout v4 chunked: flags(1), dimensionality(1), dim-size
        encoded length(1), dims, chunk index type(1), index info, addr(8).
        Only index type 1 (single chunk) is supported — newer multi-chunk
        indexes (implicit/fixed/extensible array, v2 btree) raise cleanly
        so the caller falls back to h5py or the fake tree."""
        data = self._obj.file._data
        flags, ndims, enc = body[2], body[3], body[4]
        off = 5 + ndims * enc
        index_type = body[off]
        off += 1
        if index_type != 1:
            raise Hdf5LiteError(f"chunk index type {index_type} not supported")
        if flags & 0x02:  # single chunk with filters: size + filter mask first
            (csize,) = struct.unpack_from("<Q", body, off)
            off += 8 + 4
            (addr,) = struct.unpack_from("<Q", body, off)
            raw = bytes(data[addr : addr + csize])
            for fid, cd in reversed(self._filters()):
                if fid == 1:
                    raw = zlib.decompress(raw)
                elif fid == 2:
                    esize = cd[0]
                    m = len(raw) // esize
                    raw = bytes(raw[j * m + k] for k in range(m) for j in range(esize))
                else:
                    raise Hdf5LiteError(f"filter {fid}")
            return raw[: n * dt.size]
        (addr,) = struct.unpack_from("<Q", body, off)
        if addr == UNDEF:
            return b"\x00" * (n * dt.size)
        return bytes(data[addr : addr + n * dt.size])

    def _filters(self) -> list[tuple[int, tuple]]:
        body = self._obj.first(0x0B)
        if body is None:
            return []
        out = []
        ver = body[0]
        nf = body[1]
        off = 8 if ver == 1 else 2
        for _ in range(nf):
            fid, namelen, _flags, ncdv = struct.unpack_from("<HHHH", body, off)
            off += 8
            if ver == 1 or namelen:
                off += _pad8(namelen) if ver == 1 else namelen
            cd = struct.unpack_from(f"<{ncdv}I", body, off)
            off += 4 * ncdv
            if ver == 1 and ncdv % 2:
                off += 4
            out.append((fid, cd))
        return out

    def _read_chunks(self, btree: int, chunk_dims, n: int, dt: _Dtype) -> bytes:
        """1-D chunked read (the NeXus metadata case): concatenate chunks
        in offset order, applying gzip/shuffle filters."""
        data = self._file._data
        filters = self._filters()
        chunks: list[tuple[tuple, int, int, int]] = []

        def walk(addr: int) -> None:
            if addr == UNDEF:
                return
            if data[addr : addr + 4] != b"TREE":
                raise Hdf5LiteError("bad chunk btree")
            level = data[addr + 5]
            (used,) = struct.unpack_from("<H", data, addr + 6)
            ndims_k = len(chunk_dims) + 1
            key_size = 8 + 8 * ndims_k
            off = addr + 24
            for i in range(used):
                ksz, kmask = struct.unpack_from("<II", data, off)
                koffs = struct.unpack_from(f"<{ndims_k}Q", data, off + 8)
                (child,) = struct.unpack_from("<Q", data, off + key_size)
                if level == 0:
                    chunks.append((koffs, child, ksz, kmask))
                else:
                    walk(child)
                off += key_size + 8

        walk(btree)
        chunks.sort(key=lambda c: c[0])
        out = bytearray()
        for _koffs, addr, size, mask in chunks:
            raw = bytes(data[addr : addr + size])
            for i, (fid, cd) in enumerate(reversed(filters)):
                if mask & (1 << (len(filters) - 1 - i)):
                    continue
                if fid == 1:  # gzip
                    raw = zlib.decompress(raw)
                elif fid == 2:  # shuffle
                    esize = cd[0]
                    m = len(raw) // esize
                    raw = bytes(
                        raw[j * m + k] for k in range(m) for j in range(esize)
                    )
                else:
                    raise Hdf5LiteError(f"filter {fid}")
            out += raw
        return bytes(out[: n * dt.size])


class Group:
    def __init__(self, file: "File", obj: _Object, name: str):
        self._file = file
        self._obj = obj
        self.name = name
        self.attrs = _Attrs(obj)

    def children(self) -> list[tuple[str, int]]:
        """(link name, object header address) pairs."""
        out: list[tuple[str, int]] = []
        st = self._obj.first(0x11)
        data = self._file._data
        if st is not None:  # classic symbol-table group
            btree, heap = struct.unpack_from("<QQ", st, 0)
            heap_data_addr, = struct.unpack_from("<Q", data, heap + 24)

            def name_at(off: int) -> str:
                # .find, not .index: the mmap backing has no .index
                end = data.find(b"\x00", heap_data_addr + off)
                if end < 0:
                    raise Hdf5LiteError("unterminated heap string")
                return data[heap_data_addr + off : end].decode("utf-8")

            def walk(addr: int) -> None:
                if addr == UNDEF:
                    return
                sig = data[addr : addr + 4]
                if sig == b"TREE":
                    level = data[addr + 5]
                    (used,) = struct.unpack_from("<H", data, addr + 6)
                    off = addr + 24
                    off += 8  # key 0
                    for _ in range(used):
                        (child,) = struct.unpack_from("<Q", data, off)
                        walk(child)
                        off += 16  # child + next key
                elif sig == b"SNOD":
                    (nsyms,) = struct.unpack_from("<H", data, addr + 6)
                    off = addr + 8
                    for _ in range(nsyms):
                        lno, ohdr = struct.unpack_from("<QQ", data, off)
                        out.append((name_at(lno), ohdr))
                        off += 40
                else:
                    raise Hdf5LiteError(f"bad group node {sig!r}")

            walk(btree)
            return out
        # v2 group: compact hard links as link messages, or dense storage
        # (link-info message -> fractal heap of link messages indexed by a
        # name-order v2 B-tree) — the layout both reference test files use
        links = self._obj.all(0x06)
        if not links:
            li = self._obj.first(0x02)
            if li is not None:
                lflags = li[1]
                off = 2 + (8 if lflags & 0x1 else 0)  # max creation index
                fheap_addr, name_bt = struct.unpack_from("<QQ", li, off)
                if fheap_addr != UNDEF:
                    heap = _FractalHeap(self._file, fheap_addr)
                    # record type 5: hash(4) + managed heap ID(id_len)
                    for rec in _btree2_records(self._file, name_bt):
                        body = heap.get(rec[4 : 4 + heap.id_len])
                        out.append(_parse_link_message(body))
                    return out
        for body in links:
            out.append(_parse_link_message(body))
        return out


def _parse_link_message(body: bytes) -> tuple[str, int]:
    """Link message (type 0x06) body -> (name, object header address).
    Hard links only — the NeXus trees the engine reads use nothing else."""
    flags = body[1]
    off = 2
    if flags & 0x08:
        ltype = body[off]
        off += 1  # link type byte present
        if ltype != 0:
            raise Hdf5LiteError(f"link type {ltype} not supported")
    if flags & 0x04:
        off += 8  # creation order
    if flags & 0x10:
        off += 1  # charset
    ls_size = 1 << (flags & 0x3)
    length = int.from_bytes(body[off : off + ls_size], "little")
    off += ls_size
    name = body[off : off + length].decode("utf-8")
    off += length
    (ohdr,) = struct.unpack_from("<Q", body, off)
    return name, ohdr


class _FractalHeap:
    """Just enough of the fractal heap to fetch managed objects by heap
    ID — the storage dense link/attribute storage puts its messages in.

    Header field offsets follow the public HDF5 File Format Spec IV.A.1
    (sig 4, version 1, heap-ID len 2, filter len 2, flags 1, max managed
    object size 4, then twelve 8-byte counters, then the doubling-table
    geometry). Verified against h5py-written files."""

    def __init__(self, file: "File", addr: int):
        data = file._data
        if data[addr : addr + 4] != b"FRHP":
            raise Hdf5LiteError("bad fractal heap")
        self._data = data
        (self.id_len,) = struct.unpack_from("<H", data, addr + 5)
        (filter_len,) = struct.unpack_from("<H", data, addr + 7)
        if filter_len:
            raise Hdf5LiteError("filtered fractal heap not supported")
        self.flags = data[addr + 9]
        (self.max_man_size,) = struct.unpack_from("<I", data, addr + 10)
        # twelve 8-byte fields: next huge id, huge btree addr, free space,
        # free-space mgr addr, managed space, allocated managed space,
        # direct-block iterator offset, # managed objects, huge size,
        # huge count, tiny size, tiny count
        o = addr + 14 + 12 * 8
        (self.width,) = struct.unpack_from("<H", data, o)
        (self.start_block,) = struct.unpack_from("<Q", data, o + 2)
        (self.max_direct,) = struct.unpack_from("<Q", data, o + 10)
        (self.max_heap_bits,) = struct.unpack_from("<H", data, o + 18)
        # o+20: starting # rows in root indirect block (unused for reads)
        (self.root_addr,) = struct.unpack_from("<Q", data, o + 22)
        (self.curr_rows,) = struct.unpack_from("<H", data, o + 30)
        self.off_bytes = (self.max_heap_bits + 7) // 8

    def _block_size(self, row: int) -> int:
        return self.start_block if row < 2 else self.start_block << (row - 1)

    def _block_heap_off(self, addr: int) -> int:
        """Heap-space offset of a direct block (from its FHDB header).
        Heap offsets cover the WHOLE block including the header, so a
        managed object at heap offset X lives at file addr
        block_addr + (X - block_heap_off)."""
        data = self._data
        if data[addr : addr + 4] != b"FHDB":
            raise Hdf5LiteError("bad direct block")
        o = addr + 5 + 8
        return int.from_bytes(data[o : o + self.off_bytes], "little")

    def _blocks(self) -> list[tuple[int, int, int]]:
        """(heap offset, file addr, block size) of every direct block,
        walking the root (direct or indirect)."""
        out = []
        if self.curr_rows == 0:
            addr = self.root_addr
            out.append((self._block_heap_off(addr), addr, self.start_block))
            return out
        data = self._data
        addr = self.root_addr
        if data[addr : addr + 4] != b"FHIB":
            raise Hdf5LiteError("bad indirect block")
        o = addr + 5 + 8 + self.off_bytes
        for row in range(self.curr_rows):
            size = self._block_size(row)
            if size > self.max_direct:
                raise Hdf5LiteError("nested indirect heap blocks not supported")
            for _ in range(self.width):
                (child,) = struct.unpack_from("<Q", data, o)
                o += 8
                if child != UNDEF:
                    out.append((self._block_heap_off(child), child, size))
        return out

    def get(self, heap_id: bytes) -> bytes:
        flags = heap_id[0]
        if (flags >> 4) & 0x3:
            raise Hdf5LiteError("huge/tiny heap objects not supported")
        off = int.from_bytes(heap_id[1 : 1 + self.off_bytes], "little")
        length = int.from_bytes(heap_id[1 + self.off_bytes :], "little")
        for hoff, addr, size in self._blocks():
            if hoff <= off < hoff + size:
                p = addr + (off - hoff)
                return self._data[p : p + length]
        raise Hdf5LiteError("heap id out of range")


def _btree2_records(file: "File", addr: int) -> list[bytes]:
    """All records of a v2 B-tree, in tree order."""
    data = file._data
    if data[addr : addr + 4] != b"BTHD":
        raise Hdf5LiteError("bad v2 btree")
    (node_size,) = struct.unpack_from("<I", data, addr + 6)
    (rec_size,) = struct.unpack_from("<H", data, addr + 10)
    (depth,) = struct.unpack_from("<H", data, addr + 12)
    root_addr, = struct.unpack_from("<Q", data, addr + 16)
    root_nrec, = struct.unpack_from("<H", data, addr + 24)
    total_nrec, = struct.unpack_from("<Q", data, addr + 26)

    def nrec_size(tot: int) -> int:
        bits = max(tot.bit_length(), 1)
        return (bits + 7) // 8

    out: list[bytes] = []

    def walk(a: int, nrec: int, d: int, tot_below: int) -> None:
        sig = data[a : a + 4]
        o = a + 6
        if d == 0:
            if sig != b"BTLF":
                raise Hdf5LiteError("bad btree leaf")
            for i in range(nrec):
                out.append(data[o + i * rec_size : o + (i + 1) * rec_size])
            return
        if sig != b"BTIN":
            raise Hdf5LiteError("bad btree internal node")
        if d > 1:
            # child-pointer field widths depend on a recursive max-record
            # capacity formula; depth>1 needs ~millions of links per group
            # — raise cleanly so callers fall back
            raise Hdf5LiteError("v2 btree depth > 1 not supported")
        # interleaved: child0, rec0, child1, rec1, ... recN-1, childN
        # child pointer: addr(8) + nrec(n); n = min bytes for the max
        # records a leaf can hold ((node_size - 10-byte overhead) / rec)
        n = nrec_size((node_size - 10) // rec_size)
        m = 0  # total-below field only present when depth of child > 0
        recs = []
        kids = []
        for i in range(nrec + 1):
            (caddr,) = struct.unpack_from("<Q", data, o)
            o += 8
            cn = int.from_bytes(data[o : o + n], "little")
            o += n
            ct = cn
            if d > 1:
                ct = int.from_bytes(data[o : o + m], "little")
                o += m
            kids.append((caddr, cn, ct))
            if i < nrec:
                recs.append(data[o : o + rec_size])
                o += rec_size
        for i, (caddr, cn, ct) in enumerate(kids):
            walk(caddr, cn, d - 1, ct)
            if i < nrec:
                out.append(recs[i])

    walk(root_addr, root_nrec, depth, total_nrec)
    return out


class File:
    """h5py.File stand-in: open, visititems, context manager."""

    def __init__(self, path: str, mode: str = "r"):
        if mode != "r":
            raise Hdf5LiteError("read-only")
        # mmap, not read(): raw NeXus files carry GBs of event data next
        # to the KBs of metadata the walker reads — a full read() would
        # size the Python worker's heap by the file, an mmap touches
        # only the pages the object headers and small datasets live on.
        # Slices of an mmap return bytes, so all parsing code is
        # indifferent to the backing.
        import mmap

        self._fh = open(path, "rb")
        try:
            self._data = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:  # zero-length file cannot be mapped
            self._fh.close()
            raise Hdf5LiteError("not an HDF5 file") from None
        self._gheaps: dict[int, dict[int, bytes]] = {}
        try:
            root = self._find_root()
            self._root = Group(self, _Object(self, root), "/")
        except Exception:
            self.close()
            raise

    def close(self) -> None:
        data = getattr(self, "_data", None)
        if data is not None:
            data.close()
            self._data = None  # type: ignore[assignment]
        fh = getattr(self, "_fh", None)
        if fh is not None:
            fh.close()
            self._fh = None

    def _find_root(self) -> int:
        data = self._data
        sig = b"\x89HDF\r\n\x1a\n"
        if data[:8] != sig:
            raise Hdf5LiteError("not an HDF5 file")
        ver = data[8]
        if ver == 0:
            if data[13] != 8 or data[14] != 8:
                raise Hdf5LiteError("only 8-byte offsets/lengths")
            # superblock v0: root symbol table entry at offset 24+8*4=56;
            # entry layout: link name offset(8), object header addr(8)
            (ohdr,) = struct.unpack_from("<Q", data, 64)
            return ohdr
        if ver in (2, 3):
            if data[9] != 8 or data[10] != 8:
                raise Hdf5LiteError("only 8-byte offsets/lengths")
            (ohdr,) = struct.unpack_from("<Q", data, 36)
            return ohdr
        raise Hdf5LiteError(f"superblock v{ver}")

    def _gheap_object(self, addr: int, idx: int) -> bytes:
        if addr not in self._gheaps:
            data = self._data
            if data[addr : addr + 4] != b"GCOL":
                raise Hdf5LiteError("bad global heap")
            (size,) = struct.unpack_from("<Q", data, addr + 8)
            objs: dict[int, bytes] = {}
            off = addr + 16
            end = addr + size
            while off + 16 <= end:
                oidx, _rc = struct.unpack_from("<HH", data, off)
                (osize,) = struct.unpack_from("<Q", data, off + 8)
                if oidx == 0:
                    break
                objs[oidx] = data[off + 16 : off + 16 + osize]
                off += 16 + _pad8(osize)
            self._gheaps[addr] = objs
        return self._gheaps[addr][idx]

    def visititems(self, fn) -> None:
        """Depth-first like h5py: fn(relative_name, Group|Dataset)."""
        seen: set[int] = set()

        def rec(group: Group, prefix: str) -> None:
            for name, addr in sorted(group.children()):
                if addr in seen:
                    continue
                seen.add(addr)
                obj = _Object(self, addr)
                full = f"{prefix}{name}"
                if obj.is_group:
                    g = Group(self, obj, full)
                    fn(full, g)
                    rec(g, full + "/")
                else:
                    fn(full, Dataset(self, obj, full))

        rec(self._root, "")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
