"""Streaming crawl ingestion: continuous captures -> a current-pages
store keyed by canonical URL, newest capture wins.

The batch operator (``operators.warc.latest_capture``) dedups ONE
capture set. This stream form closes the production loop for a crawl
that never stops: each micro-batch of .warc.gz files is extracted
scan-locally and appended to an append-only pages log; the CURRENT
view of the web (one newest row per canonical URL) is the keep-newest
window over that log (:func:`current_pages`), and a cadence-driven
compaction rewrites the log down to exactly that view so storage
tracks |distinct urls|, not |captures|.

Design notes, mirroring ``streaming/incremental.py``:

- **Append-only + insensitive reads.** The log append is plain
  parquet append; at-least-once foreachBatch replays can only
  duplicate identical capture rows, and the keep-newest window is
  insensitive to row multiplicity (row_number over a deterministic
  order picks the same winner). Replays grow BYTES, never change the
  current view — compaction bounds the bytes (the
  ``distinct_compact_parquet`` story, with keep-newest instead of
  DISTINCT).
- **Compaction between batches, never concurrent with a reader** —
  wired through the same rename-swap site as the index maintenance
  (local/posix paths only; on object stores compact to a new path
  from a scheduled job instead).
- **Scale shape (100 TB crawl):** extraction is scan-local per
  .warc.gz file; the only wide exchange per batch is batch-sized
  (none at all — the append is partition-preserving; the window cost
  lives in the READ path / compaction, both over the log, which
  compaction keeps at current-web size).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import warc
from scicat_ingestor_spark.streaming import maintenance

PAGE_COLUMNS = ["url", "warc_date", "media_id", "seq", "text"]


def extract_pages(files: DataFrame) -> DataFrame:
    """(media_id, payload) capture files -> one row per 200/text-html
    response with the canonical URL and RAW html in ``text`` —
    extraction stays raw here so downstream choices (full vs
    main-content extraction, noindex policy) remain open on the
    stored log. ``content_type`` arrives media-type-lowercased from
    warc_response_rows, so mixed-case captures ('Text/HTML') match.
    Dead-letter rows are dropped; revisit rows (null text, 200 +
    text/html head) are KEPT so latest_capture can date pages by
    their true newest observation."""
    rows = warc.warc_response_rows(files)
    return rows.filter(
        F.col("error").isNull()
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    ).select(
        warc.canonical_url("url").alias("url"),
        "warc_date",
        "media_id",
        "seq",
        "text",
    )


def decontaminate_pages(
    pages: DataFrame,
    eval_grams: DataFrame,
    bloom_pack: tuple[list[int], int, int] | None = None,
    n: int = 4,
) -> DataFrame:
    """Drop pages whose EXTRACTED text shares any word ``n``-gram with
    the eval set (r10, VERDICT r9 task 7 — the batch
    ``text_decontaminate_bloom`` contract applied at crawl admission,
    so eval leakage never reaches the stored pages log). ``eval_grams``
    is a (gram) relation; ``bloom_pack`` is the packed
    (words, m_bits, k) filter from ``operators.bloom.build`` — built
    ONCE offline, shipped to every micro-batch as a literal, so the
    per-batch cost is a codegen'd hash+mask prefilter plus an exact
    broadcast verify join on the tiny survivor stream (no false
    negatives; false positives die in the join). Deterministic per
    row, so at-least-once replays admit/drop identically.

    The drop propagates to EVERY row of the same canonical URL in the
    batch (r11, per r10 ADVICE): revisit rows carry null text, so
    they never gram — without propagation a contaminated page's
    revisit sibling would be admitted and ``latest_capture`` could
    surface the contaminated URL through its null-text newest
    observation. Both joins broadcast the (tiny) contaminated side —
    the page stream never shuffles."""
    from scicat_ingestor_spark.operators import bloom, dedup

    grams = pages.select(
        "media_id",
        "seq",
        F.explode(
            dedup.word_shingles(warc.html_text(F.col("text")), n=n)
        ).alias("gram"),
    )
    if bloom_pack is not None:
        words, m_bits, k = bloom_pack
        grams = bloom.probe(grams, "gram", words, m_bits, k)
    hits = (
        grams.join(F.broadcast(eval_grams.select("gram")), "gram")
        .select("media_id", "seq")
        .distinct()
    )
    bad_urls = (
        pages.join(F.broadcast(hits), ["media_id", "seq"])
        .select("url")
        .distinct()
    )
    return pages.join(F.broadcast(bad_urls), ["url"], "left_anti")


def append_captures(
    batch: DataFrame,
    pages_path: str,
    eval_grams: DataFrame | None = None,
    bloom_pack: tuple[list[int], int, int] | None = None,
) -> None:
    """foreachBatch body: extract (optionally decontaminate) and
    append this batch's pages."""
    pages = extract_pages(batch)
    if eval_grams is not None:
        pages = decontaminate_pages(pages, eval_grams, bloom_pack)
    pages.write.mode("append").parquet(pages_path)


def current_pages(spark: SparkSession, pages_path: str) -> DataFrame:
    """The current web: newest capture per canonical URL over the
    whole log (base + everything admitted so far). Insensitive to
    replay-duplicated rows."""
    log = spark.read.parquet(pages_path).select(*PAGE_COLUMNS)
    return warc.latest_capture(log)


def compact_pages(
    spark: SparkSession, pages_path: str, target_mb: int = 256
) -> int:
    """Rewrite the log down to the current view (keep-newest per url,
    capture counts folded away) through the crash-safe rename-swap
    site. Returns the resulting file count."""
    tmp, bak = maintenance._prepare_swap_site(pages_path)
    kept = current_pages(spark, pages_path).select(*PAGE_COLUMNS)
    n_files = math.ceil(
        max(maintenance._dir_bytes(pages_path), 1) / (target_mb * 1024 * 1024)
    )
    maintenance._swap_in(kept, pages_path, tmp, bak, n_files, False)
    return n_files


def run_crawl_ingest_stream(
    stream_files: DataFrame,
    pages_path: str,
    checkpoint: str,
    available_now: bool = True,
    compact_every_n_batches: int = 0,
    eval_grams: DataFrame | None = None,
    bloom_pack: tuple[list[int], int, int] | None = None,
):
    """Wire a binaryFile capture stream (columns: path, content or
    media_id, payload) through the append loop, with the same
    batch-id-keyed compaction cadence as the LSH index loop (monotone
    across restarts, stable under replay). Pass ``eval_grams`` (and
    optionally the packed ``bloom_pack`` prefilter) to
    eval-leak-check pages on admission — see
    :func:`decontaminate_pages`."""
    cols = set(stream_files.columns)
    if "payload" not in cols:
        stream_files = stream_files.select(
            F.xxhash64("path").alias("media_id"),
            F.col("content").alias("payload"),
        )

    def _body(b: DataFrame, bid: int) -> None:
        append_captures(b, pages_path, eval_grams, bloom_pack)
        if (
            compact_every_n_batches > 0
            and (bid + 1) % compact_every_n_batches == 0
        ):
            compact_pages(b.sparkSession, pages_path)

    writer = stream_files.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
