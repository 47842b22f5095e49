"""Structured logging with shipping hooks — parity with the reference's
``build_logger`` (/root/reference/src/scicat_logging.py:27-87): prefix
formatter, optional file log (timestamped name), optional syslog, and
Graylog shipping. The reference uses ``graypy.GELFUDPHandler``; graypy
is not in this environment, so :class:`GelfUdpHandler` implements the
GELF 1.1 wire format with stdlib only (json + zlib + socket, including
the chunked-datagram framing for messages over the UDP payload budget)
— drop-in for the same Graylog endpoint.

Driver-plane only: this configures the PYTHON driver process (the
offline/online/samples CLIs and the foreachBatch bodies, which run on
the driver). Executor-side JVM logging stays with Spark's log4j — the
right split, because executor logs are per-container and belong to the
cluster's log aggregation, while the ingest-progress narrative the
reference ships to Graylog is driver-side in both systems.

Credential hygiene: pair with ``config.to_public_dict`` when logging
configuration (it redacts sasl passwords and catalog tokens).
"""

from __future__ import annotations

import datetime
import json
import logging
import logging.handlers
import math
import os
import socket
import struct
import zlib
from dataclasses import dataclass

# syslog-style severity for GELF "level": logging.ERROR->3, WARNING->4,
# INFO->6, DEBUG->7 (RFC 5424 numerics, what Graylog expects)
_SYSLOG_LEVELS = {
    logging.CRITICAL: 2,
    logging.ERROR: 3,
    logging.WARNING: 4,
    logging.INFO: 6,
    logging.DEBUG: 7,
}

_GELF_CHUNK_MAGIC = b"\x1e\x0f"
# conservative UDP payload budget per GELF docs (8192 minus headroom)
_MAX_DATAGRAM = 8000
_MAX_CHUNKS = 128  # GELF hard limit; messages needing more are dropped


@dataclass
class LoggingOptions:
    """Reference LoggingOptions surface
    (/root/reference/src/scicat_configuration.py:203-223)."""

    verbose: bool = False
    file_log: bool = False
    file_log_base_name: str = "scicat_ingestor_log"
    file_log_timestamp: bool = False
    logging_level: str = "INFO"
    log_message_prefix: str = "SFI"
    system_log: bool = False
    graylog: bool = False
    graylog_host: str = ""
    graylog_port: str = ""
    graylog_facility: str = "scicat.ingestor"


class GelfUdpHandler(logging.Handler):
    """GELF 1.1 over UDP, stdlib-only (graypy parity).

    Each record becomes one JSON document
    ``{version, host, short_message, timestamp, level, _facility, ...}``
    (custom fields underscore-prefixed per spec), zlib-compressed; if the
    compressed payload exceeds the datagram budget it is split into
    chunked-GELF frames (magic 0x1e0f + 8-byte message id + seq/count).
    Socket errors are routed through ``handleError`` — shipping must
    never take down ingestion.
    """

    def __init__(
        self,
        host: str,
        port: int,
        facility: str = "scicat.ingestor",
        extra_fields: dict | None = None,
    ) -> None:
        super().__init__()
        self._addr = (host, int(port))
        self._facility = facility
        self._static = dict(extra_fields or {})
        self._hostname = socket.gethostname()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._msg_counter = 0

    def make_gelf(self, record: logging.LogRecord) -> dict:
        doc = {
            "version": "1.1",
            "host": self._hostname,
            "short_message": record.getMessage(),
            "timestamp": record.created,
            "level": _SYSLOG_LEVELS.get(record.levelno, 6),
            "_facility": self._facility,
            "_logger": record.name,
            "_line": record.lineno,
            "_file": record.pathname,
        }
        for k, v in self._static.items():
            doc[f"_{k}"] = v
        if record.exc_info and record.exc_info[0] is not None:
            doc["full_message"] = self.format(record)
        return doc

    def _chunks(self, payload: bytes):
        if len(payload) <= _MAX_DATAGRAM:
            yield payload
            return
        # chunk header is 12 bytes (2 magic + 8 id + seq + count); slice the
        # body so header + body stays inside the datagram budget
        body_max = _MAX_DATAGRAM - 12
        n = math.ceil(len(payload) / body_max)
        if n > _MAX_CHUNKS:
            raise ValueError(f"GELF message needs {n} chunks (max {_MAX_CHUNKS})")
        # unique-enough message id: pid + counter + monotonic-ish time
        self._msg_counter = (self._msg_counter + 1) & 0xFFFF
        msg_id = struct.pack(
            ">IHH",
            int(datetime.datetime.now(datetime.timezone.utc).timestamp()) & 0xFFFFFFFF,
            os.getpid() & 0xFFFF,
            self._msg_counter,
        )
        for seq in range(n):
            body = payload[seq * body_max : (seq + 1) * body_max]
            yield _GELF_CHUNK_MAGIC + msg_id + bytes([seq, n]) + body

    def emit(self, record: logging.LogRecord) -> None:
        try:
            payload = zlib.compress(
                json.dumps(self.make_gelf(record), default=str).encode("utf-8")
            )
            for datagram in self._chunks(payload):
                self._sock.sendto(datagram, self._addr)
        except Exception:
            self.handleError(record)

    def close(self) -> None:
        try:
            self._sock.close()
        finally:
            super().close()


def build_logger(
    options: LoggingOptions, name: str = "scicat_ingestor_spark"
) -> logging.Logger:
    """Reference build_logger parity
    (/root/reference/src/scicat_logging.py:27-87): prefix - asctime -
    name - level - message format on every shipping handler; file log
    with optional UTC timestamp in the name; syslog via /dev/log when
    present; GELF UDP when configured; a plain StreamHandler when
    verbose (stdlib stand-in for the reference's RichHandler)."""
    logger = logging.getLogger(name)
    logger.handlers.clear()
    formatter = logging.Formatter(
        " - ".join(
            (
                options.log_message_prefix,
                "%(asctime)s",
                "%(name)s",
                "%(levelname)s",
                "%(message)s",
            )
        )
    )

    if options.file_log:
        parts = [options.file_log_base_name]
        if options.file_log_timestamp:
            parts.append(
                datetime.datetime.now(datetime.timezone.utc).strftime(
                    "%Y%m%d%H%M%S%f"
                )
            )
        file_name = "_".join(parts) + ".log"
        logger.addHandler(logging.FileHandler(file_name, mode="w", encoding="utf-8"))

    if options.system_log and os.path.exists("/dev/log"):
        logger.addHandler(logging.handlers.SysLogHandler(address="/dev/log"))

    if options.graylog and options.graylog_host:
        logger.addHandler(
            GelfUdpHandler(
                options.graylog_host,
                int(options.graylog_port or 12201),
                facility=options.graylog_facility,
            )
        )

    if options.verbose:
        logger.addHandler(logging.StreamHandler())

    level = getattr(logging, str(options.logging_level).upper(), logging.INFO)
    logger.setLevel(level)
    for handler in logger.handlers:
        handler.setLevel(level)
        handler.setFormatter(formatter)

    # self-contained: never double-emit through an app-configured root
    logger.propagate = False
    return logger
