#!/usr/bin/env python3
"""Web-capture ingestion end-to-end over REAL files on disk: the front
half of a pretraining pipeline, composed from the same operators the
registry queries gate.

1. Write a small crawl: .warc.gz capture files (per-record gzip
   members — the Common-Crawl layout), several pages per file, some
   pages re-captured under messy surface URLs, bodies shipped chunked
   and gzip-encoded like a raw capture keeps them.
2. `warc_scan` (binaryFile — one task per file, the right parallelism
   unit for non-splittable gzip members) -> `warc_response_rows`
   (record framing + HTTP parse, Arrow-batched bytes plane) ->
   `latest_capture` (canonical-URL keep-newest dedup) -> `html_text`
   (the 6-step JVM extraction chain) -> the hygiene pipeline
   (`prep_corpus`): repetition gate, PII scrub, quality gate, line
   dedup, exact dedup, token packing.

Usage:
    python examples/warc_pipeline.py [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.apps.corpus import prep_corpus  # noqa: E402
from scicat_ingestor_spark.operators import warc  # noqa: E402
from scicat_ingestor_spark.session import get_session  # noqa: E402


def write_crawl(out_dir: str, n_files: int = 6, pages_per_file: int = 8) -> int:
    os.makedirs(out_dir, exist_ok=True)
    n_pages = 0
    for f in range(n_files):
        recs = [
            warc.make_warc_record(
                "warcinfo", b"software: warc_pipeline example\r\n",
                content_type="application/warc-fields",
            )
        ]
        for p in range(pages_per_file):
            pid = f * pages_per_file + p
            url = f"https://src{pid % 4}.example.org/page/{pid}"
            body = (
                f"<html><head><title>Page {pid}</title></head><body>"
                f"<h1>Interesting article {pid}</h1>"
                + "".join(
                    f"<p>paragraph {j} of page {pid} with enough words "
                    f"to clear the quality gate threshold comfortably</p>"
                    for j in range(6)
                )
                + f'<a href="https://src{(pid + 1) % 4}.example.org/'
                + f'page/{(pid + 1) % 48}">next</a>'
                + f'<a href="/page/{(pid + 2) % 48}">skip</a>'
                + "</body></html>"
            ).encode()
            recs.append(
                warc.make_warc_record(
                    "response",
                    warc.make_http_response(
                        body, "text/html; charset=utf-8",
                        content_encoding="gzip" if pid % 2 else "",
                        chunked=bool(pid % 3 == 0),
                    ),
                    target_uri=url,
                    content_type="application/http;msgtype=response",
                    date="2026-02-02T00:00:00Z",
                )
            )
            n_pages += 1
            if pid % 5 == 0:  # stale re-capture under a messy URL:
                # uppercase SCHEME+HOST only (path case is significant
                # per RFC 3986 and canonical_url preserves it — an
                # uppercased path would NOT fold onto the fresh page)
                host, path = url.split(".org", 1)
                messy = host.upper() + ".ORG" + path + "/#utm"
                recs.append(
                    warc.make_warc_record(
                        "response",
                        warc.make_http_response(
                            f"<p>stale copy {pid}</p>".encode(),
                            "text/html",
                        ),
                        target_uri=messy,
                        content_type="application/http;msgtype=response",
                        date="2026-01-01T00:00:00Z",
                    )
                )
        with open(os.path.join(out_dir, f"crawl-{f:03d}.warc.gz"), "wb") as fh:
            fh.write(warc.make_warc(recs, gzip_members=True))
    return n_pages


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/warc_pipeline"
    shutil.rmtree(work, ignore_errors=True)
    crawl = os.path.join(work, "crawl")
    n_pages = write_crawl(crawl)
    spark = get_session("warc_pipeline")

    rows = warc.warc_response_rows(warc.warc_scan(spark, crawl))
    pages = warc.latest_capture(
        rows.filter(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        )
    )
    docs = pages.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        F.regexp_extract("url", r"^https://([a-z0-9_]+)\.", 1).alias("source"),
        warc.html_text("text").alias("text"),
    )
    # explicit benchmark table for decontamination — with the default
    # id-mod split, page 0's boilerplate would contaminate (and drop)
    # every page that shares a 4-gram with it: exactly the behavior you
    # want against a real eval set, not against your own crawl
    eval_docs = spark.createDataFrame(
        [(10**9 + i, "eval", f"held out benchmark question {i} answer")
         for i in range(4)],
        "doc_id long, source string, text string",
    )
    packed = prep_corpus(docs, min_tokens=20, eval_docs=eval_docs)
    out = packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
    )
    print(f"crawl: {n_pages} pages written")
    for r in out.orderBy("source").collect():
        print(f"  {r['source']}: {r['n_docs']} docs, {r['tokens']} tokens")
    kept = packed.count()
    assert kept > 0
    print(f"packed corpus rows: {kept}")

    # r10 surface: the crawl graph (out-links -> domain PageRank) and
    # the WET sink (write the extracted corpus back as standard WET
    # shards any WARC consumer can read)
    from scicat_ingestor_spark.operators import graph

    outlinks = warc.page_outlinks(pages.select("url", "text"))
    edges = graph.domain_edges(outlinks)
    top = (
        graph.pagerank(edges, iterations=4)
        .orderBy(F.col("rank").desc())
        .limit(3)
        .collect()
    )
    for r in top:
        print(f"  rank {r['rank']:.4f}  {r['node']}")
    wet_out = os.path.join(work, "wet")
    n_shards = warc.write_wet_dir(
        warc.wet_shard_bytes(
            pages.select(
                "url", warc.html_text("text").alias("text"), "warc_date"
            ),
            shards=4,
        ),
        wet_out,
    )
    back = (
        warc.warc_response_rows(warc.warc_scan(spark, wet_out))
        .filter(F.col("warc_type") == "conversion")
        .count()
    )
    print(f"WET sink: {n_shards} shards, {back} pages read back")
    spark.stop()


if __name__ == "__main__":
    main()
