"""Live REST sink tests (S14/S15/S16): POSTs reach a real (local) HTTP
server from executor-side foreachPartition, replays create nothing
twice, and the retry/conflict policy matches the reference's
at-least-once + dedup-before-POST contract
(/root/reference/src/scicat_communication.py:49-122,
/root/reference/src/scicat_offline_ingestor.py:270-279).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from scicat_ingestor_spark.streaming.rest_sink import (
    RestSinkConfig,
    idempotent_post,
    make_rest_sink,
    post_json,
)


class _FakeCatalog(BaseHTTPRequestHandler):
    """Minimal SciCat stand-in: POST /datasets creates by pid, a second
    POST with a known pid answers 409; optional scripted 5xx failures."""

    store: dict = {}
    posts: list = []
    fail_next: list = []  # pop()ed per request: status codes to fail with
    lock = threading.Lock()

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        doc = json.loads(body)
        with self.lock:
            self.posts.append((self.path, doc, dict(self.headers)))
            if self.fail_next:
                code = self.fail_next.pop(0)
                self.send_response(code)
                self.end_headers()
                return
            pid = doc.get("pid")
            if pid in self.store:
                self.send_response(409)
                self.end_headers()
                return
            self.store[pid] = doc
        self.send_response(201)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def catalog():
    _FakeCatalog.store = {}
    _FakeCatalog.posts = []
    _FakeCatalog.fail_next = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeCatalog)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _FakeCatalog
    srv.shutdown()


def _batch(spark, pids):
    return spark.createDataFrame(
        [(p, f"ds-{p}", 42.0) for p in pids], "pid string, name string, size double"
    )


def test_post_entities_reach_server_with_auth(spark, catalog):
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, endpoint="datasets", token="tok123")
    idempotent_post(_batch(spark, ["a", "b", "c"]), cfg, key="pid")
    assert sorted(cat.store) == ["a", "b", "c"]
    # serialized JVM-side via to_json: full row arrives as one JSON doc
    assert cat.store["a"]["name"] == "ds-a" and cat.store["a"]["size"] == 42.0
    assert all(h["Authorization"] == "Bearer tok123" for _, _, h in cat.posts)


def test_replay_with_snapshot_posts_nothing(spark, catalog):
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, endpoint="datasets")
    batch = _batch(spark, ["a", "b"])
    idempotent_post(batch, cfg, key="pid")
    n_first = len(cat.posts)
    assert n_first == 2

    # replay with a current snapshot: anti-join drops everything, the
    # server sees zero additional requests
    snapshot = spark.createDataFrame([("a",), ("b",)], "pid string")
    idempotent_post(batch, cfg, key="pid", existing_keys=snapshot)
    assert len(cat.posts) == n_first


def test_stale_snapshot_converges_via_conflict(spark, catalog):
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, endpoint="datasets")
    batch = _batch(spark, ["a", "b"])
    idempotent_post(batch, cfg, key="pid")
    # stale/no snapshot: POSTs are re-sent, server answers 409, sink
    # treats it as success — store still has exactly one copy each
    idempotent_post(batch, cfg, key="pid", existing_keys=None)
    assert sorted(cat.store) == ["a", "b"]
    assert len(cat.store) == 2


def test_post_json_retries_5xx_then_succeeds(catalog):
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, retries=2, retry_delay_s=0.01)
    cat.fail_next.extend([500, 503])
    status = post_json(cfg, json.dumps({"pid": "r1"}))
    assert status == 201
    assert len(cat.posts) == 3  # two failures + the success


def test_post_json_gives_up_after_budget(catalog):
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, retries=1, retry_delay_s=0.01)
    cat.fail_next.extend([500, 500])
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        post_json(cfg, json.dumps({"pid": "r2"}))


def test_rest_sink_in_streaming_replay(spark, sf_dir, tmp_path, catalog):
    """End-to-end: foreachBatch drives the live sink; re-running the
    stream from the same checkpoint (offsets committed) plus a forced
    re-post with a fresh checkpoint both leave the catalog unchanged."""
    from pyspark.sql import functions as F

    from scicat_ingestor_spark.streaming.pipeline import run_ingest_stream

    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, endpoint="datasets")

    src = str(tmp_path / "src")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .limit(50)
        .select("event_id", "event_type")
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema

    def transform(batch):
        return batch.select(
            F.concat(F.lit("pid-"), F.col("event_id")).alias("pid"),
            F.col("event_type").alias("name"),
        )

    def snapshot_provider(batch_df):
        rows = [(p,) for p in cat.store]
        if not rows:
            return None
        return batch_df.sparkSession.createDataFrame(rows, "pid string")

    sink = make_rest_sink(cfg, key="pid", existing_keys_provider=snapshot_provider)

    q = run_ingest_stream(
        spark.readStream.schema(schema).parquet(src),
        transform,
        sink,
        str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert len(cat.store) == 50

    # fresh checkpoint = full replay of the source; the snapshot
    # anti-join drops every row, catalog unchanged
    n_posts = len(cat.posts)
    q2 = run_ingest_stream(
        spark.readStream.schema(schema).parquet(src),
        transform,
        sink,
        str(tmp_path / "ckpt2"),
        trigger_once=True,
    )
    q2.awaitTermination(120)
    assert len(cat.store) == 50
    assert len(cat.posts) == n_posts
