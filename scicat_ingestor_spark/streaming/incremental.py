"""Streaming incremental dedup: admit new documents against a stored
LSH index, updating the index with every admitted micro-batch.

The batch operator (``operators.dedup.incremental_dedup``) dedups one
increment against a static corpus index. This stream form closes the
production loop: each micro-batch is probed against base-corpus PLUS
previously-admitted buckets, survivors are appended to the corpus, and
their bucket keys to the index — so batch N+1 is deduped against
everything the corpus actually contains after batch N.

Cross-batch semantics is deliberately admitted-only: a doc colliding
solely with an earlier REJECTED doc is admitted, because the corpus
only holds admitted docs — that is the correct production rule, and it
differs from the batch operator's one-shot lower-id rule exactly when
a collision chain crosses batches. Inside one micro-batch the batch
operator's first-occurrence-wins rule applies unchanged. The global
invariant either way: base ∪ admitted is pairwise bucket-collision-free
against admitted (tested in tests/test_streaming.py).

Scale shape (100 TB): the index relation is |corpus|·bands rows of two
short columns (~1e-4 of corpus bytes); each micro-batch shuffles only
increment-sized data (the probe's semi-join against the bucketed index
+ the increment-local bucket window), and both appends are
increment-sized. Replay safety: the corpus append is the
anti-join-guarded ``idempotent_append`` (exactly-once rows under
at-least-once foreachBatch); a replayed index append can only duplicate
(band, sig) keys, which the probe's semi-join is insensitive to —
duplicates are then swept by the content-aware maintenance pass
(``maintenance.distinct_compact_parquet``), which the loop runs every
``compact_index_every_n_batches`` micro-batches (the ``dim_refresh``
cadence pattern): without it, at-least-once replays grow the index
without bound even though probes stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from scicat_ingestor_spark.operators import dedup
from scicat_ingestor_spark.streaming import maintenance
from scicat_ingestor_spark.streaming.pipeline import idempotent_append

INDEX_SCHEMA = "band int, sig string"


def dedup_batch_against_index(
    batch: DataFrame,
    index_path: str,
    admitted_path: str,
    text_col: str,
    id_col: str,
    shingle_n: int = 2,
    bands: int = 4,
    rows_per_band: int = 2,
) -> None:
    """foreachBatch body: probe -> append admitted -> append their keys.

    Seed ``index_path`` with ``build_lsh_index(base_corpus)`` before
    starting the stream; an absent index means an empty corpus."""
    import os

    from pyspark.errors import AnalysisException

    spark = batch.sparkSession
    # crash recovery BEFORE the no-corpus-yet fallback: a compaction
    # that died between its two swap renames leaves the index only at
    # .bak — treating that as "empty corpus" would admit the whole
    # micro-batch unprobed and permanently pollute the corpus. Restore
    # first; only a path with no backup either is a genuinely new corpus.
    bak = index_path + ".bak"
    if not os.path.exists(index_path) and os.path.isdir(bak):
        os.rename(bak, index_path)
    try:
        index = spark.read.parquet(index_path).select("band", "sig")
    except AnalysisException as e:
        # ONLY the documented no-corpus-yet case may fall back to an
        # empty index; any other read failure (IO, permissions,
        # throttling) must fail the batch — admitting a micro-batch
        # unprobed would permanently pollute the corpus
        if "PATH_NOT_FOUND" not in str(e):
            raise
        index = spark.createDataFrame([], INDEX_SCHEMA)
    # the bucket stream is computed ONCE (localCheckpoint) and feeds the
    # probe AND the index append — no re-digesting of admitted docs; the
    # admitted checkpoint additionally pins the probe result before the
    # index it was computed against is mutated by the second append
    buckets = dedup.lsh_band_buckets(
        batch, text_col, id_col, shingle_n, bands, rows_per_band
    ).localCheckpoint()
    admitted = dedup.incremental_dedup(
        batch, index, text_col, id_col, shingle_n, bands, rows_per_band,
        buckets=buckets,
    ).localCheckpoint()
    idempotent_append(admitted, admitted_path, id_col)
    (
        buckets.join(admitted.select(id_col), id_col, "left_semi")
        .select("band", "sig")
        .distinct()
        .write.mode("append")
        .parquet(index_path)
    )


def run_incremental_dedup_stream(
    stream_df: DataFrame,
    index_path: str,
    admitted_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    compact_index_every_n_batches: int = 0,
    **lsh_kwargs,
):
    """Wire a document stream through the probe-admit-index loop.

    ``compact_index_every_n_batches`` > 0 runs the content-aware index
    maintenance pass (DISTINCT (band, sig) rewrite + file merge,
    ``maintenance.distinct_compact_parquet``) after every N completed
    micro-batches — between batches, never concurrent with a probe, so
    the swap's brief path-absence window (see maintenance module
    docstring) cannot race a reader. The cadence keys off the stream's
    OWN batch_id, not a process counter: batch ids are monotone across
    restarts and stable under replay, so a daemon that restarts every
    few batches (exactly the at-least-once regime that creates the
    duplicates) still compacts on schedule — a replayed boundary batch
    just re-runs the idempotent DISTINCT rewrite. Replay-duplicated
    keys never change probe results; this bounds index BYTES, not
    correctness. The rewrite's rename-swap needs a LOCAL/posix index
    path (it refuses URI paths up front — see the maintenance module
    docstring); on object stores leave the cadence at 0 and compact to
    a new path from a scheduled job instead."""

    def _body(b: DataFrame, bid: int) -> None:
        dedup_batch_against_index(
            b, index_path, admitted_path, text_col, id_col, **lsh_kwargs
        )
        if (
            compact_index_every_n_batches > 0
            and (bid + 1) % compact_index_every_n_batches == 0
        ):
            maintenance.distinct_compact_parquet(
                b.sparkSession, index_path, key_columns=["band", "sig"]
            )

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
