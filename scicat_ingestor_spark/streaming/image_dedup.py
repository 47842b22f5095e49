"""Streaming perceptual-hash image admission: probe each micro-batch
of images against a stored dHash band index, admit the novel ones,
and append their band keys — the multimodal citizen of the
probe-admit-index loop ``streaming/incremental.py`` established for
text LSH (r11).

Semantics mirror the text loop deliberately:

- **Cross-batch is admitted-only**: an image is rejected iff it is
  within ``max_hamming`` of an image the corpus actually ADMITTED
  (base corpus or an earlier micro-batch); collisions with earlier
  rejected images don't block, because the corpus doesn't contain
  them.
- **Inside one micro-batch** the batch operator's one-shot
  lower-id-wins rule applies unchanged
  (``operators.dedup.banded_hamming_pairs``).

Unlike the text index (band keys only — bucket collision IS the
rejection rule), the image index stores the verify halves
``(h1, h2)`` alongside each band key: band agreement only NOMINATES a
stored neighbor, and the XOR+bit_count Hamming verify decides — so
the stream admits exactly what the batch contract
(all-pairs-within-``max_hamming``) would reject, with full recall at
``max_hamming <= bands - 1`` by pigeonhole.

Scale shape (100 TB of images): the index relation is
|corpus|·bands rows of four scalar columns (no payloads, no hash
strings); a micro-batch shuffles only increment-sized data (the
probe joins the increment's bands against the bucketed index — at
real scale the index side is pre-bucketed parquet and the probe is
increment × matching-buckets, never a corpus scan of payload bytes);
both appends are increment-sized. Replay safety is the text loop's:
admitted rows go through the anti-join-guarded ``idempotent_append``;
a replayed index append only duplicates (band, bkey, h1, h2) keys,
which the probe's verify is insensitive to, and the content-aware
maintenance pass sweeps on the same cadence pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import multimodal
from scicat_ingestor_spark.operators.dedup import (
    banded_hamming_pairs,
    hamming_signature_bands,
)
from scicat_ingestor_spark.streaming import maintenance
from scicat_ingestor_spark.streaming.pipeline import idempotent_append

INDEX_SCHEMA = "band int, bkey long, h1 long, h2 long"


def image_batch_against_index(
    batch: DataFrame,
    index_path: str,
    admitted_path: str,
    id_col: str = "media_id",
    max_hamming: int = 3,
) -> None:
    """foreachBatch body: hash -> probe -> append admitted ids+hashes
    -> append their band keys. ``batch`` carries (id_col, payload).

    Seed ``index_path`` by writing
    ``hamming_signature_bands(perceptual_hash(base))`` band rows
    before starting the stream; an absent index means an empty
    corpus."""
    import os

    from pyspark.errors import AnalysisException

    spark = batch.sparkSession
    # crash recovery before the no-corpus-yet fallback (the
    # incremental.py rule): a compaction that died mid-swap leaves
    # the index only at .bak — restore instead of admitting unprobed
    bak = index_path + ".bak"
    if not os.path.exists(index_path) and os.path.isdir(bak):
        os.rename(bak, index_path)
    try:
        index = spark.read.parquet(index_path).select(
            "band", "bkey", "h1", "h2"
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        index = spark.createDataFrame([], INDEX_SCHEMA)
    sig = (
        multimodal.perceptual_hash(batch.select(id_col, "payload"))
        .select(F.col("media_id").alias("id"), F.col("dhash").alias("sig"))
    )
    # bands computed ONCE, feeding the probe AND the index append;
    # the checkpoint also pins the probe before the index mutates
    bands_df = hamming_signature_bands(sig).localCheckpoint()
    ham = (
        F.bit_count(F.col("b.h1").bitwiseXOR(F.col("i.h1")))
        + F.bit_count(F.col("b.h2").bitwiseXOR(F.col("i.h2")))
    ).cast("long")
    hit = (
        bands_df.alias("b")
        .join(
            index.alias("i"),
            (F.col("b.band") == F.col("i.band"))
            & (F.col("b.bkey") == F.col("i.bkey")),
        )
        .filter(ham <= max_hamming)
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    losers = (
        banded_hamming_pairs(sig, max_hamming=max_hamming)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    admitted_ids = (
        sig.join(hit, "id", "left_anti")
        .join(losers, "id", "left_anti")
        .select("id", "sig")
        .localCheckpoint()
    )
    idempotent_append(
        admitted_ids.select(
            F.col("id").alias(id_col), F.col("sig").alias("dhash")
        ),
        admitted_path,
        id_col,
    )
    (
        bands_df.join(admitted_ids.select("id"), "id", "left_semi")
        .select("band", "bkey", "h1", "h2")
        .distinct()
        .write.mode("append")
        .parquet(index_path)
    )


def run_image_dedup_stream(
    stream_df: DataFrame,
    index_path: str,
    admitted_path: str,
    checkpoint: str,
    id_col: str = "media_id",
    max_hamming: int = 3,
    available_now: bool = True,
    compact_index_every_n_batches: int = 0,
):
    """Wire an image stream (id_col, payload) through the
    hash-probe-admit-index loop; cadence/compaction semantics are
    run_incremental_dedup_stream's (batch-id-keyed, local paths
    only — see streaming/maintenance.py)."""

    def _body(b: DataFrame, bid: int) -> None:
        image_batch_against_index(
            b, index_path, admitted_path, id_col, max_hamming
        )
        if (
            compact_index_every_n_batches > 0
            and (bid + 1) % compact_index_every_n_batches == 0
        ):
            maintenance.distinct_compact_parquet(
                b.sparkSession,
                index_path,
                key_columns=["band", "bkey", "h1", "h2"],
            )

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
