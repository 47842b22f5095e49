"""ISO-BMFF demux: round-trip vs the closed forms, parse-path
equivalence (constant vs tabled stsz), structural fuzz under the
failure-channel contract, and the Spark stages end-to-end."""
import struct

import pytest

from scicat_ingestor_spark.operators import mp4


def test_mp4_roundtrip_closed_forms():
    for mid in range(24):
        buf = mp4.make_mp4(mid)
        v, a = mp4.mp4_track_rows(buf)
        vid_n, vid_sz = (mid % 9) + 3, (mid % 5) + 2
        aud_n, aud_sz = (mid % 13) + 4, (mid % 3) + 1
        assert (v["handler"], v["codec"]) == ("vide", "avc1")
        assert (v["width"], v["height"]) == (
            ((mid % 16) + 1) * 16, ((mid % 9) + 1) * 16,
        )
        assert (v["n_samples"], v["sample_bytes"]) == (
            vid_n, vid_n * vid_sz,
        )
        assert (v["mdat_offset"], v["duration"]) == (0, vid_n * 40)
        assert (a["handler"], a["codec"]) == ("soun", "mp4a")
        assert (a["n_samples"], a["sample_bytes"]) == (
            aud_n, aud_n * aud_sz,
        )
        assert a["mdat_offset"] == vid_n * vid_sz
        assert v["movie_duration"] == max(vid_n * 40, aud_n * 23)


def test_mp4_frame_slices_checksum_the_actual_bytes():
    for mid in (0, 3, 7, 11):
        buf = mp4.make_mp4(mid)
        vid_n, vid_sz = (mid % 9) + 3, (mid % 5) + 2
        frames = mp4.mp4_frame_slices(buf, every_n=2)
        assert [f["frame_idx"] for f in frames] == list(range(0, vid_n, 2))
        for f in frames:
            k = f["frame_idx"]
            assert f["mdat_offset"] == k * vid_sz
            assert f["checksum"] == sum(
                ((k * vid_sz + t) * 13 + 5) % 256 for t in range(vid_sz)
            )
    # audio track selectable; every_n validated
    assert mp4.mp4_frame_slices(mp4.make_mp4(5), 3, handler="soun")
    with pytest.raises(ValueError, match="every_n"):
        mp4.mp4_frame_slices(mp4.make_mp4(5), 0)
    with pytest.raises(ValueError, match="no 'vide' track"):
        # audio-only probe: strip the video trak by rebuilding from a
        # demux of an id whose video track we rename
        buf = mp4.make_mp4(5).replace(b"vide", b"text")
        mp4.mp4_frame_slices(buf, 2)


def test_mp4_stsz_parse_paths_agree():
    """Constant-size stsz and a per-sample table of equal entries are
    two encodings of the same content; the demux must not see a
    difference (same trick as the PNG palette depths). The builder
    normally picks by id parity; the override pins both forms to one
    id."""
    for mid in (0, 5, 12):
        const = mp4.make_mp4(mid, stsz_table=False)
        table = mp4.make_mp4(mid, stsz_table=True)
        assert const != table  # genuinely different encodings
        assert mp4.mp4_track_rows(const) == mp4.mp4_track_rows(table)
        assert mp4.mp4_frame_slices(const, 2) == mp4.mp4_frame_slices(
            table, 2
        )


def test_mp4_structural_fuzz_value_errors():
    buf = mp4.make_mp4(9)
    with pytest.raises(ValueError, match="too short"):
        mp4.mp4_demux(buf[:4])
    with pytest.raises(ValueError, match="missing ftyp"):
        mp4.mp4_demux(buf.replace(b"ftyp", b"blah", 1))
    with pytest.raises(ValueError, match="overruns|truncated"):
        # dropping the ftyp header makes the first 'isom' bytes parse
        # as a huge box size
        mp4.mp4_demux(buf[8:])
    with pytest.raises(ValueError, match="truncated|overruns"):
        mp4.mp4_demux(buf[:-5])
    # box size below header size
    bad = struct.pack(">I", 3) + buf[4:]
    with pytest.raises(ValueError, match="bad box size"):
        mp4.mp4_demux(bad)
    # corrupt an stco offset so a sample overruns the file
    at = buf.index(b"stco") + 4 + 4 + 4  # tag + fullbox + count
    huge = buf[:at] + struct.pack(">I", len(buf) + 100) + buf[at + 4 :]
    with pytest.raises(ValueError, match="overruns the file|overruns file"):
        mp4.mp4_frame_slices(huge, 1)
    # no mdat
    mdat_at = buf.index(b"mdat") - 4
    with pytest.raises(ValueError, match="missing mdat"):
        mp4.mp4_track_rows(buf[:mdat_at])


def test_mp4_largesize_and_co64_paths():
    """64-bit box sizes and co64 chunk offsets parse identically to
    their 32-bit forms."""
    buf = mp4.make_mp4(7)
    want = mp4.mp4_track_rows(buf)

    # rewrite the mdat box header to a largesize form (size==1 +
    # 64-bit length); sample offsets shift by the 8 extra header bytes
    mdat_at = buf.index(b"mdat") - 4
    (old_size,) = struct.unpack(">I", buf[mdat_at : mdat_at + 4])
    body = buf[mdat_at + 8 : mdat_at + old_size]
    large = (
        buf[:mdat_at]
        + struct.pack(">I", 1)
        + b"mdat"
        + struct.pack(">Q", 16 + len(body))
        + body
    )
    # stco offsets must move +8 for both tracks
    out = bytearray(large)
    pos = 0
    while True:
        at = large.find(b"stco", pos)
        if at < 0:
            break
        off_at = at + 4 + 4 + 4
        (off,) = struct.unpack(">I", large[off_at : off_at + 4])
        out[off_at : off_at + 4] = struct.pack(">I", off + 8)
        pos = at + 4
    got = mp4.mp4_track_rows(bytes(out))
    assert got == want

    # rewrite stco -> co64 (same 1-entry table, 64-bit offsets); box
    # grows by 4 bytes so enclosing container sizes must grow too
    def grow_container(data: bytes, inner_at: int, delta: int) -> bytes:
        """Increase every enclosing box size for a position."""
        data = bytearray(data)
        pos = 0
        # walk top-level and recurse through known containers
        def fix(start, end):
            p = start
            while p < end:
                (size,) = struct.unpack(">I", bytes(data[p : p + 4]))
                tag = bytes(data[p + 4 : p + 8])
                if p <= inner_at < p + size:
                    struct.pack_into(">I", data, p, size + delta)
                    if tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                        fix(p + 8, p + size)
                    return
                p += size
        fix(0, len(data))
        return bytes(data)

    at = buf.index(b"stco") - 4
    (size,) = struct.unpack(">I", buf[at : at + 4])
    _, _, p = mp4._full_box(buf, at + 8, at + size)
    (count,) = struct.unpack(">I", buf[p : p + 4])
    assert count == 1
    (off,) = struct.unpack(">I", buf[p + 4 : p + 8])
    co64 = (
        struct.pack(">I", size + 4)
        + b"co64"
        + buf[at + 8 : p + 4]
        + struct.pack(">Q", off)
    )
    patched = grow_container(buf, at, 4)
    patched = patched[:at] + co64 + patched[at + size :]
    # mdat moved +4; fix BOTH chunk offsets (the co64 one and the
    # remaining stco one)
    out = bytearray(patched)
    c_at = out.find(b"co64")
    o_at = c_at + 4 + 4 + 4
    (o,) = struct.unpack(">Q", bytes(out[o_at : o_at + 8]))
    struct.pack_into(">Q", out, o_at, o + 4)
    s_at = out.find(b"stco")
    o_at = s_at + 4 + 4 + 4
    (o,) = struct.unpack(">I", bytes(out[o_at : o_at + 4]))
    struct.pack_into(">I", out, o_at, o + 4)
    got = mp4.mp4_track_rows(bytes(out))
    assert got == want


def test_mp4_spark_stages(spark):
    from pyspark.sql import functions as F

    rows = [(i, mp4.make_mp4(i)) for i in (0, 1, 8, 13)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    tracks = mp4.demux_tracks(df).orderBy("media_id", "track_id").collect()
    assert len(tracks) == 8
    assert [t["handler"] for t in tracks] == ["vide", "soun"] * 4
    frames = mp4.sample_frames(df, every_n=2)
    got = (
        frames.groupBy("media_id")
        .agg(F.count("*").alias("n"))
        .orderBy("media_id")
        .collect()
    )
    assert [r["n"] for r in got] == [
        ((i % 9) + 3 + 1) // 2 for i in (0, 1, 8, 13)
    ]


def test_stsz_fixed_count_is_bounded():
    """Review finding: a crafted stsz with sample_size != 0 and a
    4-billion count must not allocate a multi-GB list — the fixed-size
    branch bounds count by the file size like every other table."""
    buf = mp4.make_mp4(2, stsz_table=False)  # constant-size stsz
    at = buf.index(b"stsz") + 4 + 4 + 4  # tag + fullbox + sample_size
    huge = buf[:at] + struct.pack(">I", 0xFFFFFFFF) + buf[at + 4 :]
    with pytest.raises(ValueError, match="stsz count exceeds file"):
        mp4.mp4_demux(huge)


def test_truncated_fixed_headers_raise_value_error():
    """Review finding: short tkhd/mdhd slices must surface as the
    ValueError failure-channel contract, never a leaked struct.error."""
    buf = mp4.make_mp4(3)
    at = buf.index(b"tkhd") - 4
    (size,) = struct.unpack(">I", buf[at : at + 4])
    # shrink the tkhd box so the width/height reads run short, and
    # shrink every enclosing container consistently
    cut = 20
    out = bytearray(buf[: at + size - cut] + buf[at + size :])
    pos = 0
    for tag in (b"moov", b"trak"):
        p = bytes(out).index(tag) - 4
        (s,) = struct.unpack(">I", bytes(out[p : p + 4]))
        struct.pack_into(">I", out, p, s - cut)
    struct.pack_into(">I", out, at, size - cut)
    with pytest.raises(ValueError, match="not an MP4"):
        mp4.mp4_demux(bytes(out))
