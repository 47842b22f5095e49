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

STAGES = ("quality", "decontaminate", "dedup", "pack")


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
    if "quality" in stages:
        out = out.filter(toks >= min_tokens)
    if "decontaminate" in stages:
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
        choices=STAGES,
        default=None,
        help="run only these stages (default: all, in canonical order)",
    )
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    from scicat_ingestor_spark.session import get_session

    spark = get_session("corpus_prep")
    stages = tuple(args.stage) if args.stage else STAGES
    out = prep_corpus(
        spark.read.parquet(args.docs),
        stages=stages,
        min_tokens=args.min_tokens,
        eval_mod=args.eval_mod,
        capacity=args.capacity,
    )
    if args.dry_run:
        print(out.count(), "rows (dry run)")
    else:
        out.write.mode("overwrite").parquet(args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
