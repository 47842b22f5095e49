"""Live REST sink (S14/S15/S16): POST datasets / origdatablocks /
samples to a SciCat-style catalog from inside ``foreachBatch``.

Reference behavior this mirrors
(/root/reference/src/scicat_communication.py:49-122): one POST per
entity to the configured endpoint with ``Authorization: Bearer <token>``
headers, non-2xx raises; dedup-before-POST happens upstream
(/root/reference/src/scicat_offline_ingestor.py:270-279 checks
existence by pid/metadata before creating).

Spark-first shape — the parts that matter at scale:

- **Serialization is JVM-side**: rows become JSON via ``to_json(struct(*))``
  (whole-stage codegen), so the Python layer only ships strings.
- **Posting is executor-side and partition-parallel**: ``foreachPartition``
  opens one connection pool per partition and walks rows sequentially.
  Nothing collects to the driver; throughput scales with partitions and
  is bounded by ``maxOffsetsPerTrigger`` upstream (T3).
- **Idempotency = anti-join, not per-row GET**: the reference probes the
  catalog once per file (fine at 1 file/s); at bulk-replay scale that is
  one HTTP round-trip per row. We anti-join the micro-batch against the
  existing-keys snapshot (broadcast — it is a key column, not the
  entities) and additionally tolerate duplicate-key conflict statuses
  (409/conflict) from the server, so at-least-once replays converge to
  exactly-once effects even when the snapshot is stale.
- **Retries are per-request with backoff**, matching the file-open retry
  family (T6); a post that keeps failing raises so Structured Streaming
  does NOT commit the offset range — the at-least-once contract.

Only stdlib ``urllib`` is used (executors can't assume requests).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RestSinkConfig:
    """Connection + retry policy for the live sink.

    Mirrors the reference's SciCatOptions surface
    (/root/reference/src/scicat_configuration.py:360-395): base URL,
    bearer token, extra headers, timeout — plus the retry knobs the
    reference keeps on its file-IO side.
    """

    base_url: str
    endpoint: str = "datasets"  # datasets | origdatablocks | samples
    token: str = ""
    additional_headers: dict = field(default_factory=dict)
    timeout_s: float = 10.0
    retries: int = 3
    retry_delay_s: float = 0.5
    # statuses treated as "already exists" => success for idempotency
    conflict_statuses: tuple = (409,)

    @property
    def url(self) -> str:
        return self.base_url.rstrip("/") + "/" + self.endpoint.lstrip("/")

    @property
    def headers(self) -> dict:
        h = {"Content-Type": "application/json", **self.additional_headers}
        if self.token:
            h["Authorization"] = f"Bearer {self.token}"
        return h


def post_json(cfg: RestSinkConfig, payload: str) -> int:
    """POST one JSON document; returns the HTTP status. Retries
    connection errors and 5xx with linear backoff; a conflict status
    (already exists) is success. Raises after the retry budget — which
    makes the streaming batch fail and the offsets NOT commit."""
    import urllib.error
    import urllib.request

    last_err: Exception | None = None
    for attempt in range(cfg.retries + 1):
        if attempt:
            time.sleep(cfg.retry_delay_s)
        try:
            req = urllib.request.Request(
                cfg.url,
                data=payload.encode("utf-8"),
                headers=cfg.headers,
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            if e.code in cfg.conflict_statuses:
                return e.code  # already there: idempotent success
            if e.code < 500:
                raise  # 4xx (other than conflict) won't heal on retry
            last_err = e
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            last_err = e
    raise RuntimeError(f"POST {cfg.url} failed after {cfg.retries + 1} attempts") from last_err


def _post_partition(rows: Iterable, cfg: RestSinkConfig) -> None:
    for row in rows:
        post_json(cfg, row["__payload"])


def post_entities(batch: DataFrame, cfg: RestSinkConfig) -> None:
    """POST every row of ``batch`` as a JSON entity, partition-parallel.
    Serialization happens in the JVM (`to_json`); executors only see an
    opaque string column."""
    payloads = batch.select(F.to_json(F.struct(*batch.columns)).alias("__payload"))
    payloads.foreachPartition(lambda rows: _post_partition(rows, cfg))


def idempotent_post(
    batch: DataFrame,
    cfg: RestSinkConfig,
    key: str,
    existing_keys: DataFrame | None = None,
) -> None:
    """At-least-once-safe live sink: drop rows whose ``key`` is already
    in the catalog snapshot (broadcast anti-join — the snapshot is one
    key column), then POST the remainder. The server-side conflict
    tolerance in :func:`post_json` covers snapshot staleness, so a replay
    of an already-posted micro-batch creates nothing twice.

    This is the live-mode twin of :func:`pipeline.idempotent_append`
    (reference dedup-before-POST,
    /root/reference/src/scicat_offline_ingestor.py:270-279).
    """
    fresh = batch
    if existing_keys is not None:
        probe = existing_keys.select(F.col(key)).distinct()
        fresh = batch.join(F.broadcast(probe), key, "left_anti")
    post_entities(fresh, cfg)


def make_rest_sink(
    cfg: RestSinkConfig,
    key: str,
    existing_keys_provider: Callable[[DataFrame], DataFrame | None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``sink(batch_df, batch_id)`` for
    :func:`pipeline.run_ingest_stream`, config-switched against the
    snapshot sink — same signature, same idempotency contract, POSTs
    instead of parquet appends.

    ``existing_keys_provider`` is called once per micro-batch with the
    batch itself (so it can scope the lookup to the batch's keys, or
    return a cached snapshot) and must return a DataFrame with ``key``,
    or None to rely on conflict-status tolerance alone.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        existing = existing_keys_provider(batch_df) if existing_keys_provider else None
        idempotent_post(batch_df, cfg, key, existing)

    return sink
