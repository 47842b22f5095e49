"""Corpus export sharding: deterministic seeded shuffle + token-budget
shard assignment — the last step before writing training shards.

Both operators ride the distributed prefix sum (operators/windows.py):
the global order is a range exchange (the shuffle the total order needs
anyway), ranks/prefixes are per-partition windows plus config-bounded
offsets, and there is never a single-partition global window. The
shuffle key is ``md5(seed:id)`` — reproducible across runs, retries and
engines, unlike ``orderBy(rand())`` whose order changes under task
retry (a retried stage re-draws its randoms, so two attempts of the
same job can emit different shard assignments mid-write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import windows
from scicat_ingestor_spark.operators.text import whitespace_token_count


def _shuffle_key(id_col: str, seed: str):
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))


def seeded_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "r6",
    n_shards: int = 16,
) -> DataFrame:
    """Global shuffle rank + round-robin shard id. Round-robin over the
    shuffled order keeps shard sizes within one row of each other with
    no knowledge of the row count up front. Returns ``id_col``,
    ``shuffle_rank`` (1-based, bigint) and ``shard_id`` (int)."""
    ranked = windows.global_rank(
        df.select(id_col, _shuffle_key(id_col, seed).alias("_k")),
        [F.col("_k").asc(), F.col(id_col).asc()],
        out_col="shuffle_rank",
    )
    return ranked.select(
        id_col,
        "shuffle_rank",
        ((F.col("shuffle_rank") - 1) % n_shards).cast("int").alias("shard_id"),
    )


def token_budget_shards(
    df: DataFrame,
    budget: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "r6",
) -> DataFrame:
    """Cut the seeded shuffle order into contiguous shards of ~``budget``
    whitespace tokens: a doc lands in ``prefix_tokens div budget``
    (greedy contiguous fill — every shard except the last provably
    crosses its budget boundary; only the final shard can under-fill).
    Integer division, not float ``floor(a/b)``, so there is no FP
    rounding seam between engines. Returns ``id_col``, ``n_tokens``,
    ``cum_tokens`` (both bigint) and ``shard_id`` (int)."""
    base = df.select(
        id_col,
        _shuffle_key(id_col, seed).alias("_k"),
        whitespace_token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    cum = windows.running_total(
        base,
        "n_tokens",
        [F.col("_k").asc(), F.col(id_col).asc()],
        out_col="cum_tokens",
    )
    return cum.select(
        id_col,
        "n_tokens",
        "cum_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {int(budget)}")
        .cast("int")
        .alias("shard_id"),
    )


def export_shards(
    docs: DataFrame,
    out_dir: str,
    budget: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "r6",
) -> None:
    """Write the corpus as one parquet directory per token-budget shard
    (``out_dir/shard_id=N/``). The shard map carries only (id, shard),
    so the join back to the full rows broadcasts when the increment is
    small and hash-joins on the id otherwise; the write clusters each
    shard's rows with ``repartition(shard_id)`` so every shard directory
    is a handful of contiguous files, not one sliver per task.

    The shard map's ``n_tokens`` wins over any pre-existing column of
    that name on ``docs`` (pack-stage output and enriched doc tables
    carry one): the input's copy is dropped before the join, otherwise
    the duplicate column fails the parquet write."""
    shards = token_budget_shards(
        docs, budget=budget, id_col=id_col, text_col=text_col, seed=seed
    ).select(id_col, "n_tokens", "shard_id")
    if "n_tokens" in docs.columns:
        docs = docs.drop("n_tokens")
    (
        docs.join(shards, id_col)
        .repartition(F.col("shard_id"))
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
