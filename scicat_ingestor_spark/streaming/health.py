"""T9: health endpoint for the streaming engine (ops-plane).

The reference serves ``GET /health`` = {kafka, storage, scicat} boolean
probes, 200 when all pass else 503, from a daemon thread
(/root/reference/src/scicat_health_check.py:23-141).

Spark-first re-expression: the "is the pipeline alive" signal comes from
a ``StreamingQueryListener`` — progress events mean the micro-batch loop
is advancing, exception events flip the query unhealthy — instead of
pinging a consumer object. External probes (storage dir readable,
catalog reachable) stay pluggable callables, exactly like the
reference's three checks. The HTTP skin is the same 200/503 JSON
contract so existing monitoring keeps working.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Callable

try:  # pragma: no cover - import surface differs across pyspark versions
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    from pyspark.sql.streaming.listener import StreamingQueryListener  # type: ignore


def check_storage(directory: str) -> bool:
    """Storage probe: directory exists and is listable
    (/root/reference/src/scicat_health_check.py:76-95)."""
    import pathlib

    try:
        path = pathlib.Path(directory)
        if not directory or not path.exists():
            return False
        next(path.iterdir(), None)
        return True
    except Exception:
        return False


class QueryHealthListener(StreamingQueryListener):
    """Tracks per-query liveness from engine events: healthy while
    progress keeps arriving within ``stale_after_s`` and no terminal
    exception was seen. Replaces the reference's process-level probe with
    the engine's own event bus (SURVEY §2.9 T9)."""

    def __init__(self, stale_after_s: float = 60.0):
        self.stale_after_s = stale_after_s
        self._last_progress: dict[str, float] = {}
        self._failed: dict[str, str] = {}
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._last_progress[str(event.id)] = time.monotonic()
            self._failed.pop(str(event.id), None)

    def onQueryProgress(self, event) -> None:
        with self._lock:
            qid = str(event.progress.id)
            self._last_progress[qid] = time.monotonic()
            # progress proves a restarted query is alive again. The
            # listener bus is async: under load the previous run's
            # terminated-with-exception event can be processed AFTER
            # the restart's start event, which would poison _failed
            # forever (measured: the fault-injection soak recovered
            # standalone but stayed 503 in the full suite, where
            # accumulated listeners slow the bus). Any liveness event
            # for the id clears the failure record.
            self._failed.pop(qid, None)

    def onQueryIdle(self, event) -> None:
        with self._lock:
            qid = str(event.id)
            self._last_progress[qid] = time.monotonic()
            self._failed.pop(qid, None)

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            if event.exception is not None:
                self._failed[str(event.id)] = str(event.exception)
            else:  # clean stop is not unhealthy
                self._last_progress.pop(str(event.id), None)

    def healthy(self) -> bool:
        now = time.monotonic()
        with self._lock:
            if self._failed:
                return False
            return all(
                now - t <= self.stale_after_s for t in self._last_progress.values()
            )


class HealthState:
    """Named probes -> one status dict, the reference's
    {check: bool, ...} + all() contract
    (/root/reference/src/scicat_health_check.py:49-58)."""

    def __init__(self, probes: dict[str, Callable[[], bool]]):
        self.probes = dict(probes)

    def status(self) -> dict:
        checks = {}
        for name, probe in self.probes.items():
            try:
                checks[name] = bool(probe())
            except Exception:
                checks[name] = False
        return checks


def serve_health(state: HealthState, host: str = "127.0.0.1", port: int = 0):
    """Start the /health HTTP endpoint on a daemon thread; returns the
    bound server (``server.server_address`` has the chosen port).
    200 when every probe passes, else 503; other paths 404."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self) -> None:
            if self.path != "/health":
                self.send_response(404)
                self.end_headers()
                return
            checks = state.status()
            self.send_response(200 if all(checks.values()) else 503)
            self.send_header("Content-type", "application/json")
            self.end_headers()
            self.wfile.write(json.dumps(checks).encode("utf-8"))

        def log_message(self, fmt: str, *args) -> None:
            pass

    server = HTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
