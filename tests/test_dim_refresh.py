"""SC dimension snapshot-refresh hook (S10 live mode,
streaming/dim_refresh.py): a stale dimension snapshot picks up new
catalog rows at the refresh boundary, retries ride the same policy as
the POST side, and between refreshes the hot path costs nothing."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspark.sql import functions as F

from scicat_ingestor_spark.plans.sc import attach_dimension
from scicat_ingestor_spark.streaming.dim_refresh import (
    SnapshotRefresher,
    fetch_resource,
)
from scicat_ingestor_spark.streaming.rest_sink import RestSinkConfig


class _FakeCatalogRead(BaseHTTPRequestHandler):
    """GET /proposals serves a mutable in-memory collection; scripted
    5xx failures exercise the retry schedule."""

    proposals: list = []
    gets: list = []
    fail_next: list = []
    lock = threading.Lock()

    def do_GET(self):
        with self.lock:
            self.gets.append((self.path, dict(self.headers)))
            if self.fail_next:
                code = self.fail_next.pop(0)
                self.send_response(code)
                self.end_headers()
                return
            body = json.dumps(self.proposals).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def catalog():
    _FakeCatalogRead.proposals = [
        {"proposalId": "p1", "title": "first"},
        {"proposalId": "p2", "title": "second"},
    ]
    _FakeCatalogRead.gets = []
    _FakeCatalogRead.fail_next = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeCatalogRead)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _FakeCatalogRead
    srv.shutdown()


DDL = "proposalId string, title string"


def test_fetch_resource_retries_5xx_and_sends_auth(catalog):
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, token="tok42", retry_delay_s=0.01)
    cat.fail_next = [503]
    rows = fetch_resource(cfg, "proposals")
    assert [r["proposalId"] for r in rows] == ["p1", "p2"]
    assert len(cat.gets) == 2  # one failed + one successful attempt
    assert cat.gets[-1][1].get("Authorization") == "Bearer tok42"


def test_fetch_resource_gives_up_after_budget(catalog):
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, retries=1, retry_delay_s=0.01)
    cat.fail_next = [500, 500]
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        fetch_resource(cfg, "proposals")


def test_stale_then_refreshed(spark, catalog):
    """The drift scenario from the round-4 verdict: a proposal created
    after the stream starts is invisible to the cached snapshot and
    visible after the refresh boundary — and BETWEEN boundaries no GET
    is issued (hot path is free)."""
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, retry_delay_s=0.01)
    r = SnapshotRefresher(
        spark, cfg, {"proposals": DDL}, refresh_every_n_batches=2
    )

    snaps = r.snapshots()  # batch 0: initial fetch
    assert sorted(x["proposalId"] for x in snaps["proposals"].collect()) == [
        "p1",
        "p2",
    ]
    n_gets = len(cat.gets)

    with cat.lock:
        cat.proposals.append({"proposalId": "p3", "title": "new"})

    snaps = r.snapshots()  # batch 1: cached — no GET, stale by design
    assert len(cat.gets) == n_gets
    assert snaps["proposals"].count() == 2

    snaps = r.snapshots()  # batch 2: due — refreshed
    assert len(cat.gets) == n_gets + 1
    assert sorted(x["proposalId"] for x in snaps["proposals"].collect()) == [
        "p1",
        "p2",
        "p3",
    ]


def test_refreshed_snapshot_feeds_dimension_join(spark, catalog):
    """End-to-end: the refreshed snapshot broadcast-joins into a fact
    micro-batch via plans.sc.attach_dimension — the late-created
    proposal resolves after refresh where it was NULL (V3 channel)
    before."""
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, retry_delay_s=0.01)
    r = SnapshotRefresher(
        spark, cfg, {"proposals": DDL}, refresh_every_n_batches=1
    )
    batch = spark.createDataFrame([("p3",)], "proposal_id string")

    def title_for(snaps):
        out = attach_dimension(
            batch,
            snaps["proposals"],
            "proposals",
            F.col("proposal_id"),
            "proposalId",
        )
        return out.select("_sc_proposals_title").first()[0]

    assert title_for(r.snapshots()) is None  # not in catalog yet
    with cat.lock:
        cat.proposals.append({"proposalId": "p3", "title": "late"})
    r.snapshots()  # advance the cadence counter (cached batch)
    assert title_for(r.snapshots()) == "late"


def test_empty_catalog_keeps_schema(spark, catalog):
    base, cat = catalog
    with cat.lock:
        cat.proposals = []
    cfg = RestSinkConfig(base_url=base, retry_delay_s=0.01)
    r = SnapshotRefresher(spark, cfg, {"proposals": DDL})
    dim = r.snapshots()["proposals"]
    assert dim.count() == 0
    assert dim.schema.simpleString() == "struct<proposalId:string,title:string>"


def test_extra_catalog_fields_are_ignored(spark, catalog):
    """A real catalog returns FULL documents (ownerGroup, createdAt,
    nested objects...); the explicit dimension schema must project just
    its columns and ignore the rest — pinned here because a change in
    createDataFrame's dict handling would break every refresh."""
    base, cat = catalog
    with cat.lock:
        cat.proposals = [
            {
                "proposalId": "p9",
                "title": "rich",
                "ownerGroup": "ess",
                "createdAt": "2026-01-01T00:00:00Z",
                "nested": {"a": 1},
            }
        ]
    cfg = RestSinkConfig(base_url=base, retry_delay_s=0.01)
    r = SnapshotRefresher(spark, cfg, {"proposals": DDL})
    dim = r.snapshots()["proposals"]
    assert dim.columns == ["proposalId", "title"]
    assert dim.first()["title"] == "rich"


def test_seeded_refresher_defers_first_get(spark, catalog):
    """The online-app wiring: seed() bootstraps from parquet snapshots
    (StructType schemas) so batch 0 serves WITHOUT touching the
    catalog; the first GET lands at the refresh boundary and replaces
    the seeded dimension."""
    base, cat = catalog
    cfg = RestSinkConfig(base_url=base, retry_delay_s=0.01)
    seeded = spark.createDataFrame(
        [("p0", "from-parquet")], DDL
    )
    r = SnapshotRefresher(
        spark, cfg, {"proposals": seeded.schema}, refresh_every_n_batches=2
    ).seed({"proposals": seeded})

    assert len(cat.gets) == 0
    assert r.snapshots()["proposals"].first()["proposalId"] == "p0"  # batch 1
    assert len(cat.gets) == 0  # still the seed
    dim = r.snapshots()["proposals"]  # batch 2: boundary -> live GET
    assert len(cat.gets) == 1
    assert sorted(x["proposalId"] for x in dim.collect()) == ["p1", "p2"]


def test_refresher_inside_real_stream(spark, catalog, tmp_path):
    """Full streaming e2e: a foreachBatch pipeline (the online-app
    wiring) refreshes the dimension every micro-batch; the catalog
    serves a different title per GET, so successive batches must join
    against successively fresher dimensions — stale-then-refreshed
    inside a REAL stream, not a hand-driven loop."""
    from scicat_ingestor_spark.streaming.pipeline import run_ingest_stream

    base, cat = catalog

    # each GET serves a new catalog state: title = version number
    version = {"n": 0}
    orig_do_get = cat.do_GET

    def versioned_get(self):
        with cat.lock:
            version["n"] += 1
            cat.proposals = [
                {"proposalId": "p1", "title": f"v{version['n']}"}
            ]
        orig_do_get(self)

    cat.do_GET = versioned_get
    try:
        src = str(tmp_path / "src")
        spark.range(8).select(
            F.col("id").alias("event_id"), F.lit("p1").alias("proposal_id")
        ).repartition(8).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema

        cfg = RestSinkConfig(base_url=base, retry_delay_s=0.01)
        r = SnapshotRefresher(
            spark, cfg, {"proposals": DDL}, refresh_every_n_batches=1
        )
        out = str(tmp_path / "out")

        def transform(batch):
            dim = r.snapshots()["proposals"]
            return batch.join(
                F.broadcast(dim),
                batch.proposal_id == dim.proposalId,
                "left",
            ).select("event_id", "title")

        def sink(batch, batch_id):
            batch.write.mode("append").parquet(out)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = run_ingest_stream(stream, transform, sink, str(tmp_path / "ck"),
                              trigger_once=True)
        q.awaitTermination(120)

        titles = {row["title"] for row in spark.read.parquet(out).collect()}
        # 8 files / 2 per trigger = 4 micro-batches, one refresh each:
        # the joined dimension version must ADVANCE across batches
        assert len(titles) >= 2, titles
        assert version["n"] >= 2
    finally:
        cat.do_GET = orig_do_get
