"""Daemon-loop resilience: restart-on-transient-failure + graceful exit.

Parity with the reference's ``system_helpers``
(/root/reference/src/system_helpers.py:17-88): its daemons wrap the
poll loop in ``handle_daemon_loop_exceptions`` — listed exceptions are
logged and the loop continues, a keyboard interrupt exits cleanly
(code 0), anything else logs the traceback and exits with code 1.

Spark-first translation: the "loop" is a StreamingQuery, and the unit
of recovery is a STREAM RESTART — ``query.awaitTermination()`` raises
``StreamingQueryException`` when any micro-batch fails, killing the
whole stream, so a bare awaitTermination turns one transient sink/
source hiccup into a dead daemon. Restarting from the same checkpoint
is safe by construction: offsets committed for completed batches are
never re-read, the failed batch replays, and every sink in this repo
is idempotent (anti-join append / conflict-status POST), so the replay
is exactly-once in effect. Bounded restarts (budget within a rolling
window) keep a genuinely broken pipeline from flapping forever — the
reference's ``ignored_exceptions`` tuple generalizes to the
``is_transient`` predicate.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.errors.exceptions.base import StreamingQueryException


def guarded(body: Callable[[], object], logger) -> int:
    """Batch-CLI exception parity (the reference's ``handle_exceptions``
    context manager): run ``body``; an exception logs the full traceback
    through the structured logging pipeline and yields exit code 1, a
    clean finish yields 0. KeyboardInterrupt propagates (the caller's
    ``raise SystemExit(main())`` surfaces it as 130, the conventional
    interrupt code)."""
    try:
        body()
    except Exception:
        logger.exception("ingestor failed; exiting")
        return 1
    return 0


def await_with_restarts(
    start: Callable[[], "object"],
    logger,
    max_restarts: int = 5,
    restart_window_s: float = 600.0,
    backoff_s: float = 2.0,
    is_transient: Callable[[BaseException], bool] | None = None,
) -> int:
    """Run a streaming daemon to completion with bounded restarts.

    ``start`` creates (or re-creates) the StreamingQuery — it is called
    once per attempt, so the stream always restarts from its checkpoint.
    Returns a process exit code: 0 for normal termination (an
    availableNow drain finishing, or a keyboard interrupt — the
    reference's safe_exit_type), 1 for a non-transient failure or an
    exhausted restart budget. ``is_transient`` classifies stream
    failures; the default treats every StreamingQueryException as
    transient (the restart BUDGET is the real guard: a persistent
    failure burns through it in seconds and exits 1)."""
    restart_times: list[float] = []
    while True:
        try:
            query = start()
        except Exception:
            logger.exception("stream failed to start")
            return 1
        try:
            query.awaitTermination()
            logger.info("stream terminated normally; exiting")
            return 0
        except KeyboardInterrupt:
            logger.info("received keyboard interrupt; stopping stream")
            try:
                query.stop()
            except Exception:
                logger.exception("stop during shutdown failed")
            return 0
        except StreamingQueryException as e:
            if is_transient is not None and not is_transient(e):
                logger.exception("non-transient stream failure; exiting")
                return 1
            now = time.monotonic()
            restart_times = [
                t for t in restart_times if now - t < restart_window_s
            ]
            restart_times.append(now)
            if len(restart_times) > max_restarts:
                logger.exception(
                    "restart budget exhausted (%d within %.0fs); exiting",
                    max_restarts,
                    restart_window_s,
                )
                return 1
            logger.warning(
                "stream failed (%s); restart %d/%d after %.1fs",
                e,
                len(restart_times),
                max_restarts,
                backoff_s,
            )
            time.sleep(backoff_s)
        except Exception:
            # anything that is not a stream failure (a Py4J gateway
            # drop, a wrapped JVM error) — the reference's unlisted-
            # exception branch: log the traceback, exit 1, never die
            # with a raw stderr trace outside the logging pipeline
            logger.exception("unexpected daemon failure; exiting")
            return 1
