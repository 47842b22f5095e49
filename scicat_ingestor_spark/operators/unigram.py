"""Unigram-LM tokenizer training (SentencePiece family; r11, VERDICT
r10 task 6) — the Llama/T5-side companion of operators/bpe.py.

Kudo 2018 (*Subword Regularization*) trains a unigram language model
over subword pieces by EM with pruning; SentencePiece is its public
implementation. This module implements the deterministic hard-EM
(Viterbi) variant, designed so a SQL oracle can replay every stage:

- **seed**: all substrings (length <= max_piece_len) of the corpus
  words, weighted by word frequency; top ``vocab_size`` by
  (count DESC, piece ASC) plus ALL single characters (coverage
  guarantee). Probabilities = count / total over the chosen set.
- **E-step**: Viterbi-segment each DISTINCT word (the classic
  dedup — segmentation depends only on the word, so the heavy loop
  runs on |vocabulary|, not |corpus|) maximizing the PRODUCT of piece
  probabilities. No logarithms anywhere: probabilities are exact
  integer ratios and IEEE multiply/divide are deterministic, so both
  engines compute BIT-IDENTICAL path scores — ties (equal-probability
  segmentations) break to the longest first piece (smallest split
  point), identically on both sides. Products of <= max-word-length
  doubles cannot underflow at realistic word lengths.
- **M-step**: piece count = frequency-weighted Viterbi usage;
  p = (count + 1[len == 1]) / (total + n_chars) — single characters
  keep a Laplace floor and never prune (coverage), multi-char pieces
  with zero usage drop.
- repeat ``rounds`` times; segmentation under the final vocab gives
  per-word token counts that join back to documents relationally.

Scale shape: substring seeding and the M-step are codegen'd
explode/groupBy aggregations; the per-word Viterbi is a JVM
expression fold over the distinct-word relation with the vocab as a
broadcast map literal (vocab_size is bounded by design — it IS the
model size); per round the driver collects one vocab-sized count
relation (the BPE bounded-collect pattern). Corpus-scale token
counting never re-segments per document: it joins the per-word piece
counts (|vocabulary| rows, broadcast) onto exploded tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MISS = -1.0  # candidate score for absent pieces: below any product


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-tokenized lowercased corpus."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _substring_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, cnt): every substring of length 1..max_piece_len of
    every word, weighted by word frequency — codegen'd explode +
    hash aggregation."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len),
                        F.length("word") - i + 1,
                    ),
                ),
                lambda l: F.substr(F.col("word"), i, l),
            ),
        )
    )
    return (
        words.select(F.col("freq"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def seed_vocab(
    words: DataFrame, vocab_size: int = 64, max_piece_len: int = 4
) -> dict[str, float]:
    """{piece: probability} — top ``vocab_size`` substrings by
    (cnt DESC, piece ASC) plus all single chars, normalized over the
    chosen set. Two bounded collects."""
    counts = _substring_counts(words, max_piece_len).localCheckpoint()
    top = counts.orderBy(
        F.col("cnt").desc(), F.col("piece").asc()
    ).limit(vocab_size)
    chars = counts.filter(F.length("piece") == 1)
    chosen = top.unionByName(chars).groupBy("piece").agg(
        F.max("cnt").alias("cnt")
    )
    rows = chosen.collect()
    total = float(sum(int(r["cnt"]) for r in rows))
    return {r["piece"]: int(r["cnt"]) / total for r in rows}


def _vocab_map(vocab: dict[str, float]) -> Column:
    return F.create_map(
        *[
            x
            for k, v in sorted(vocab.items())
            for x in (F.lit(k), F.lit(float(v)))
        ]
    )


def _viterbi_scores(
    w: Column, vmap: Column, max_piece_len: int
) -> Column:
    """Forward DP: scores[i] = best product of piece probabilities
    segmenting w[0:i]; scores[0] = 1.0. Each step is ONE multiply of
    a prior score — bit-deterministic across engines."""
    init = F.array(F.lit(1.0))

    def step(acc, i):
        lo = F.greatest(i - max_piece_len, F.lit(0))
        cands = F.transform(
            F.sequence(lo, i - 1),
            lambda j: F.when(
                F.element_at(
                    vmap, F.substr(w, j + 1, i - j)
                ).isNotNull(),
                F.element_at(acc, (j + 1).cast("int"))
                * F.element_at(vmap, F.substr(w, j + 1, i - j)),
            ).otherwise(F.lit(_MISS)),
        )
        return F.array_append(acc, F.array_max(cands))

    return F.aggregate(F.sequence(F.lit(1), F.length(w)), init, step)


def viterbi_pieces(
    w: Column, vocab: dict[str, float], max_piece_len: int = 4
) -> Column:
    """The Viterbi segmentation of one word column under ``vocab`` —
    ``array<string>`` in reading order. Ties break to the SMALLEST
    split point at each RIGHT-TO-LEFT backtrack step (= the longest
    trailing piece), mirrored by the oracle's row_number ORDER BY j
    per position. Words containing characters outside the
    vocab still segment (all-miss positions fall back to the first
    candidate) — deterministic, though their scores are the _MISS
    sentinel."""
    vmap = _vocab_map(vocab)
    scores = _viterbi_scores(w, vmap, max_piece_len)
    init = F.struct(
        F.length(w).alias("pos"),
        F.array().cast("array<string>").alias("pieces"),
    )

    def cand(j, pos):
        return F.when(
            F.element_at(vmap, F.substr(w, j + 1, pos - j)).isNotNull(),
            F.element_at(scores, (j + 1).cast("int"))
            * F.element_at(vmap, F.substr(w, j + 1, pos - j)),
        ).otherwise(F.lit(_MISS))

    def step(acc, _):
        pos = acc["pos"]
        lo = F.greatest(pos - max_piece_len, F.lit(0))
        target = F.element_at(scores, (pos + 1).cast("int"))
        best_j = F.aggregate(
            F.sequence(lo, pos - 1),
            F.lit(-1),
            lambda cur, j: F.when(cur >= 0, cur)
            .when(cand(j, pos) == target, j.cast("int"))
            .otherwise(cur),
        )
        piece = F.substr(w, best_j + 1, pos - best_j)
        return F.when(pos <= 0, acc).otherwise(
            F.struct(
                best_j.alias("pos"),
                F.array_append(acc["pieces"], piece).alias("pieces"),
            )
        )

    walked = F.aggregate(
        F.sequence(F.lit(1), F.length(w)), init, step
    )
    return F.reverse(walked["pieces"])


def em_round(
    words: DataFrame,
    vocab: dict[str, float],
    max_piece_len: int = 4,
) -> dict[str, float]:
    """One hard-EM round: Viterbi counts over the distinct-word
    relation (frequency-weighted), then the smoothed M-step. One
    vocab-sized collect."""
    used = words.select(
        "freq",
        F.explode(
            viterbi_pieces(F.col("word"), vocab, max_piece_len)
        ).alias("piece"),
    )
    rows = (
        used.groupBy("piece").agg(F.sum("freq").alias("c")).collect()
    )
    counts = {r["piece"]: int(r["c"]) for r in rows}
    chars = [p for p in vocab if len(p) == 1]
    total = float(sum(counts.values()) + len(chars))
    out = {}
    for p in vocab:
        c = counts.get(p, 0)
        if len(p) == 1:
            out[p] = (c + 1) / total
        elif c > 0:
            out[p] = c / total
    return out


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = 4,
    rounds: int = 2,
) -> dict[str, float]:
    """Seed + ``rounds`` hard-EM rounds -> {piece: probability}."""
    words = word_freqs(docs, text_col).localCheckpoint()
    vocab = seed_vocab(words, vocab_size, max_piece_len)
    for _ in range(rounds):
        vocab = em_round(words, vocab, max_piece_len)
    return vocab


def word_piece_counts(
    words: DataFrame,
    vocab: dict[str, float],
    max_piece_len: int = 4,
) -> DataFrame:
    """(word, n_pieces) under the trained vocab — the relation corpus
    token-counting broadcasts onto exploded tokens (never re-running
    Viterbi per document)."""
    return words.select(
        "word",
        F.size(
            viterbi_pieces(F.col("word"), vocab, max_piece_len)
        ).alias("n_pieces"),
    )
