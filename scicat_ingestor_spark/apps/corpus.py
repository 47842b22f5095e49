"""Corpus-prep runner: the training-data pipeline (quality gate ->
eval-split decontamination -> exact dedup -> token packing) over any
documents-shaped parquet, as a batch CLI like the ingest apps.

The stages compose the same operators the standalone queries() entries
use; each one is optional so partial pipelines (e.g. dedup only) run
with the same command.

Usage:
    python -m scicat_ingestor_spark.apps.corpus \
        --docs /data/documents.parquet --out ./prep_out \
        [--min-tokens 25] [--eval-mod 97] [--capacity 512] \
        [--stage quality --stage decontaminate --stage dedup --stage pack]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import dedup, text
from scicat_ingestor_spark.operators.util import gate

STAGES = ("quality", "decontaminate", "dedup", "pack")
# the full published-pipeline order: repetition gate (Gopher) on raw
# text, PII scrub, cheap quality gate, global line-level dedup (C4),
# eval decontamination, exact dedup, token packing
FULL_STAGES = (
    "repetition",
    "pii",
    "quality",
    "linededup",
    "decontaminate",
    "dedup",
    "pack",
)


def prep_corpus(
    docs: DataFrame,
    stages: tuple[str, ...] = STAGES,
    min_tokens: int = 25,
    eval_mod: int = 97,
    capacity: int = 512,
    eval_docs: DataFrame | None = None,
) -> DataFrame:
    """The composed pipeline as a pure transform (see
    queries.q_corpus_prep_e2e for the plan-shape discussion). ``eval_docs``
    overrides the id-predicate eval split with a real benchmark table."""
    toks = text.whitespace_token_count(F.col("text"))
    out = docs
    if eval_docs is None:
        eval_docs = docs.filter(F.col("doc_id") % eval_mod == 0)
        out = out.filter(F.col("doc_id") % eval_mod != 0)
    if "repetition" in stages:
        # gate() pins the heavy regex filter above the parallelism
        # repartition (see operators/util.gate)
        out = gate(out, text.repetition_features(F.col("text"))["keep_gopher"])
    if "pii" in stages:
        out = out.withColumn("text", text.pii_scrub(F.col("text")))
    if "quality" in stages:
        out = gate(out, toks >= min_tokens)
    if "linededup" in stages:
        # C4-style global line dedup: keep each non-empty trimmed line at
        # its first corpus occurrence, rebuild the document from the
        # survivors, drop documents left empty. One shuffle on the line
        # hash + one groupBy(doc_id); projects to the pipeline columns
        # (doc_id, source, text).
        numbered = out.select(
            "doc_id",
            "source",
            F.explode(
                F.filter(
                    F.transform(
                        F.split("text", r"\n"),
                        lambda x, i: F.struct(
                            (i + 1).alias("pos"), F.trim(x).alias("line")
                        ),
                    ),
                    lambda s: F.length(s["line"]) > 0,
                )
            ).alias("l"),
        ).select(
            "doc_id", "source",
            F.col("l.pos").alias("pos"), F.col("l.line").alias("line"),
        )
        wl = Window.partitionBy(F.md5("line")).orderBy("doc_id", "pos")
        out = (
            numbered.withColumn("rn", F.row_number().over(wl))
            .filter(F.col("rn") == 1)
            .groupBy("doc_id", "source")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                ).alias("text")
            )
            .filter(F.length("text") > 0)
        )
    if "decontaminate" in stages:
        # NOTE (r11 optimization round): the contamination probe and the
        # anti-join fact side both consume `out`, but a shared_fanout
        # exchange here MEASURED SLOWER at sf0.1 (corpus_prep_e2e 1.05
        # -> 1.36 s, corpus_prep_full_e2e ~flat): the upstream already
        # ends in an aggregation exchange (linededup's groupBy / the
        # gated scan is cheap), which AQE's runtime stage cache dedupes
        # across the branches, so the extra exchange only added a
        # full-text shuffle. Left as-is deliberately.
        grams = dedup.word_shingles(F.col("text"), n=4)
        eval_grams = eval_docs.select(F.explode(grams).alias("gram")).distinct()
        contaminated = (
            out.select("doc_id", F.explode(grams).alias("gram"))
            .join(F.broadcast(eval_grams), "gram")
            .select("doc_id")
            .distinct()
        )
        out = out.join(F.broadcast(contaminated), "doc_id", "left_anti")
    if "dedup" in stages:
        wd = Window.partitionBy("h").orderBy("doc_id")
        out = (
            out.withColumn("h", dedup.content_hash(F.col("text")))
            .withColumn("rn", F.row_number().over(wd))
            .filter(F.col("rn") == 1)
            .drop("h", "rn")
        )
    if "pack" in stages:
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = (
            out.select("source", "doc_id", toks.alias("n_tokens"))
            .withColumn(
                "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
            )
            .withColumn("bin_id", F.floor(F.col("start_off") / capacity))
        )
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output parquet directory")
    ap.add_argument("--min-tokens", type=int, default=25)
    ap.add_argument("--eval-mod", type=int, default=97)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument(
        "--stage",
        action="append",
        choices=FULL_STAGES,
        default=None,
        help="run only these stages (default: quality/decontaminate/"
        "dedup/pack, in canonical order)",
    )
    ap.add_argument(
        "--full",
        action="store_true",
        help="run the full hygiene pipeline (adds repetition gate, PII "
        "scrub and global line dedup)",
    )
    ap.add_argument(
        "--export-shards",
        metavar="DIR",
        help="after the hygiene stages, seeded-shuffle the survivors and "
        "write one parquet directory per token-budget shard (replaces "
        "the pack stage's bin map as the endgame — pack emits offsets, "
        "this emits the physical shard layout)",
    )
    ap.add_argument("--shard-budget", type=int, default=4096)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    from scicat_ingestor_spark.session import get_session

    spark = get_session("corpus_prep")
    stages = (
        tuple(args.stage)
        if args.stage
        else (FULL_STAGES if args.full else STAGES)
    )
    if args.export_shards:
        # shard export needs the text column, which pack projects away
        stages = tuple(s for s in stages if s != "pack")
    def work():
        out = prep_corpus(
            spark.read.parquet(args.docs),
            stages=stages,
            min_tokens=args.min_tokens,
            eval_mod=args.eval_mod,
            capacity=args.capacity,
        )
        if args.dry_run:
            print(out.count(), "rows (dry run)")
        elif args.export_shards:
            from scicat_ingestor_spark.operators.sharding import export_shards

            export_shards(out, args.export_shards, budget=args.shard_budget)
        else:
            out.write.mode("overwrite").parquet(args.out)

    # same handle_exceptions parity as the offline ingestor: failures
    # log a full traceback and exit 1 instead of a raw stderr trace
    import logging

    from scicat_ingestor_spark.streaming.resilience import guarded

    return guarded(work, logging.getLogger("scicat.corpus_prep"))


if __name__ == "__main__":
    raise SystemExit(main())
