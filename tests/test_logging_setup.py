"""Log shipping (reference parity:
/root/reference/src/scicat_logging.py) — the stdlib GELF UDP handler
ships real datagrams a Graylog-shaped listener can decode, chunking
follows the GELF spec, and build_logger wires the reference's handler
matrix from LoggingOptions."""

from __future__ import annotations

import json
import logging
import socket
import zlib

import pytest

from scicat_ingestor_spark.config import build_config
from scicat_ingestor_spark.logging_setup import (
    _GELF_CHUNK_MAGIC,
    GelfUdpHandler,
    LoggingOptions,
    build_logger,
)


@pytest.fixture()
def udp_listener():
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(5.0)
    yield sock, sock.getsockname()[1]
    sock.close()


def _recv_gelf(sock) -> dict:
    data, _ = sock.recvfrom(65536)
    assert data[:2] != _GELF_CHUNK_MAGIC, "expected an unchunked datagram"
    return json.loads(zlib.decompress(data))


def test_gelf_handler_ships_decodable_documents(udp_listener):
    sock, port = udp_listener
    logger = logging.getLogger("test-gelf-ship")
    logger.handlers.clear()
    logger.setLevel(logging.INFO)
    h = GelfUdpHandler("127.0.0.1", port, facility="scicat.ingestor.test")
    logger.addHandler(h)

    logger.warning("file %s failed ingestion", "/data/run42.nxs")
    doc = _recv_gelf(sock)
    assert doc["version"] == "1.1"
    assert doc["short_message"] == "file /data/run42.nxs failed ingestion"
    assert doc["level"] == 4  # syslog WARNING
    assert doc["_facility"] == "scicat.ingestor.test"
    assert doc["_logger"] == "test-gelf-ship"
    assert isinstance(doc["timestamp"], float)
    h.close()


def test_gelf_chunking_reassembles(udp_listener):
    """A message whose compressed payload exceeds one datagram is split
    into chunked-GELF frames (magic + 8-byte id + seq/count) that
    reassemble to the original document — the same framing graypy/
    Graylog use."""
    import os

    sock, port = udp_listener
    h = GelfUdpHandler("127.0.0.1", port)
    rec = logging.LogRecord(
        "big", logging.INFO, __file__, 1,
        # incompressible payload so zlib stays > one datagram
        os.urandom(12000).hex(), None, None,
    )
    h.emit(rec)
    frames = []
    while True:
        data, _ = sock.recvfrom(65536)
        assert data[:2] == _GELF_CHUNK_MAGIC
        msg_id, seq, count = data[2:10], data[10], data[11]
        frames.append((seq, count, msg_id, data[12:]))
        if len(frames) == frames[0][1]:
            break
    assert len({f[2] for f in frames}) == 1  # one message id
    assert sorted(f[0] for f in frames) == list(range(frames[0][1]))
    payload = b"".join(f[3] for f in sorted(frames))
    doc = json.loads(zlib.decompress(payload))
    assert len(doc["short_message"]) == 24000
    h.close()


def test_gelf_socket_errors_do_not_raise():
    """Shipping failures must never take down ingestion: emit swallows
    socket errors through handleError."""
    h = GelfUdpHandler("127.0.0.1", 9)
    h._sock.close()  # real socket replaced by a failing stub

    class _Dead:
        def sendto(self, *a):
            raise OSError("network down")

        def close(self):
            pass

    h._sock = _Dead()
    rec = logging.LogRecord("x", logging.INFO, __file__, 1, "msg", None, None)
    h.emit(rec)  # no raise
    h.close()


def test_build_logger_file_and_prefix(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opts = LoggingOptions(
        file_log=True, file_log_base_name="ship_test", logging_level="DEBUG"
    )
    logger = build_logger(opts, name="test-build-file")
    logger.debug("hello from the driver")
    for h in logger.handlers:
        h.flush()
    text = (tmp_path / "ship_test.log").read_text()
    assert "SFI - " in text and "hello from the driver" in text
    assert " - DEBUG - " in text


def test_build_logger_graylog_from_config(udp_listener):
    """The reference flow end-to-end: EngineConfig logging block ->
    build_logger -> GELF datagram on the configured port."""
    sock, port = udp_listener
    cfg, unused = build_config(
        None,
        {
            "logging.graylog": "true",
            "logging.graylog_host": "127.0.0.1",
            "logging.graylog_port": str(port),
        },
    )
    assert unused == []
    logger = build_logger(cfg.logging, name="test-build-gelf")
    logger.error("ingest failed for pid %s", "20.500/abc")
    doc = _recv_gelf(sock)
    assert doc["short_message"] == "ingest failed for pid 20.500/abc"
    assert doc["level"] == 3  # syslog ERROR
    for h in logger.handlers:
        h.close()


def test_build_logger_timestamped_file_name(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opts = LoggingOptions(
        file_log=True, file_log_base_name="ts_test", file_log_timestamp=True
    )
    logger = build_logger(opts, name="test-build-ts")
    logger.info("x")
    names = [p.name for p in tmp_path.glob("ts_test_*.log")]
    assert len(names) == 1 and names[0] != "ts_test.log"


def test_gelf_chunker_property(udp_listener):
    """Property: any payload size reassembles exactly (hypothesis over
    the chunk boundary region)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sock, port = udp_listener
    h = GelfUdpHandler("127.0.0.1", port)

    @settings(max_examples=20, deadline=None)
    @given(st.integers(min_value=0, max_value=30000))
    def check(n):
        import os

        payload = os.urandom(n)
        frames = list(h._chunks(payload))
        # every emitted datagram — chunk header INCLUDED — stays inside
        # the module's 8000-byte budget (some Graylog inputs enforce 8192)
        assert all(len(f) <= 8000 for f in frames)
        if len(frames) == 1 and not frames[0].startswith(_GELF_CHUNK_MAGIC):
            assert frames[0] == payload
            return
        parts = {}
        mid = None
        for f in frames:
            assert f[:2] == _GELF_CHUNK_MAGIC
            this_mid, seq, count = f[2:10], f[10], f[11]
            mid = mid or this_mid
            assert this_mid == mid  # all chunks share the message id
            assert count == len(frames) <= 128
            parts[seq] = f[12:]
        assert sorted(parts) == list(range(len(frames)))
        assert b"".join(parts[i] for i in sorted(parts)) == payload

    check()
    h.close()
