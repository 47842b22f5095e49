"""Distributed WordPiece tokenizer training + JVM longest-match
encoding (r11) — the BERT-family tokenizer, completing the trained
tokenizer triple next to BPE (operators/bpe.py, GPT-2 family) and
unigram-LM (operators/unigram.py, SentencePiece/Llama/T5 family).

WordPiece (Schuster & Nakajima, *Japanese and Korean Voice Search*,
ICASSP 2012; the BERT tokenizer of Devlin et al. 2019) differs from
BPE in exactly two places, and this module shares the rest of the
BPE scaffold's scale shape:

- **Merge choice is likelihood-scored, not count-scored**: the pair
  picked each iteration maximizes ``count(ab) / (count(a)*count(b))``
  — the corpus-likelihood gain of fusing the pair — instead of raw
  ``count(ab)``. Ties break on (a, b) lexicographically, so training
  is deterministic and the DuckDB oracle replays every iteration.
- **Encoding is greedy longest-match-first (max-munch)**, not merge
  replay: non-initial pieces carry the ``##`` continuation prefix and
  a word with no viable segmentation becomes a single ``[UNK]`` — the
  exact `WordpieceTokenizer` algorithm of the BERT reference
  implementation.

Scale shape (the operators/bpe.py discipline):

- ONE corpus-sized shuffle total (the word-frequency count); every
  training iteration runs over the (word, freq, symbols) VOCABULARY
  relation — two vocabulary-sized aggregations (pair counts + symbol
  counts) and a ONE-ROW collect (the argmax pair).
- The merge rewrite is the same greedy non-overlapping ``aggregate``
  fold (a merged piece ``a + strip##(b)`` can never equal ``a`` — b
  contributes at least one char — nor ``b`` — ``##`` alone is never a
  symbol — so a single left-to-right pass cannot chain).
- The encoder is a pure JVM fold: per word, at most ``len(word)``
  greedy steps, each probing piece lengths ``maxlen..1`` against the
  vocabulary literal — no Python, no shuffle, scan-local. (Production
  tokenizers use a trie; the bounded literal probe is the
  Column-expression equivalent for the oracle-checkable contract —
  the constant factor is ``maxlen * |vocab|`` comparisons inside
  whole-stage codegen.)
- The only driver-side state is the trained vocabulary itself
  (alphabet + one piece per merge) — bounded by construction, the
  same bounded-collect budget as the BPE merge list and the k-means
  centroids in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators.bpe import word_freq

UNK = "[UNK]"
CONT = "##"


def wp_symbols(col: Column | str) -> Column:
    """Initial WordPiece symbol sequence of a word: first char bare,
    every following char with the ``##`` continuation prefix
    ('word' -> ['w', '##o', '##r', '##d'])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.split(c, ""),
        lambda ch, i: F.when(i == 0, ch).otherwise(
            F.concat(F.lit(CONT), ch)
        ),
    )


def _strip_cont(piece: str) -> str:
    return piece[len(CONT):] if piece.startswith(CONT) else piece


def merge_pair_to(symbols: Column, a: str, b: str, merged: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent
    (a, b) -> ``merged`` as one ``aggregate`` fold — the
    operators/bpe.merge_pair shape generalized to an explicit merged
    symbol (WordPiece fuses ``a + strip##(b)``, not ``a + b``). Safe
    in a single pass: see module docstring."""

    def step(acc, s):
        can = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (s == b)
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.array_append(acc, s))

    return F.aggregate(symbols, F.array().cast("array<string>"), step)


def wordpiece_train(
    docs: DataFrame, text_col: str = "text", merges: int = 8
) -> list[str]:
    """Learn a WordPiece vocabulary from corpus word statistics:
    ``merges`` likelihood-scored pair fusions over the character
    alphabet (with ``##`` continuation marking). Returns the FULL
    ordered vocabulary — the initial alphabet (sorted) followed by
    the merge products in training order — which is what the
    longest-match encoder consumes.

    Each iteration: one vocabulary-sized pair count, one
    vocabulary-sized symbol count, one broadcast-joinable score
    ranking, ONE one-row collect. Score = c(ab) / (c(a) * c(b)) in
    double (both factors cast before the multiply so the product
    cannot overflow long at corpus scale), ties on (a, b) — the
    DuckDB oracle replays the identical arithmetic."""
    vocab = (
        word_freq(docs, text_col)
        .select("word", "freq", wp_symbols("word").alias("symbols"))
        .localCheckpoint()
    )
    alphabet = sorted(
        r["s"]
        for r in vocab.select(
            F.explode("symbols").alias("s")
        ).distinct().collect()
    )
    learned: list[str] = []
    for _ in range(merges):
        two = vocab.filter(F.size("symbols") >= 2)
        pairs = two.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                    F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        ).groupBy("p.a", "p.b").agg(F.sum("freq").alias("cp"))
        singles = (
            vocab.select(
                "freq", F.explode("symbols").alias("s")
            )
            .groupBy("s")
            .agg(F.sum("freq").alias("cs"))
        )
        sa = singles.select(
            F.col("s").alias("a"), F.col("cs").alias("ca")
        )
        sb = singles.select(
            F.col("s").alias("b"), F.col("cs").alias("cb")
        )
        top = (
            pairs.join(F.broadcast(sa), "a")
            .join(F.broadcast(sb), "b")
            .select(
                "a",
                "b",
                (
                    F.col("cp").cast("double")
                    / (
                        F.col("ca").cast("double")
                        * F.col("cb").cast("double")
                    )
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merged = a + _strip_cont(b)
        learned.append(merged)
        vocab = vocab.select(
            "word",
            "freq",
            merge_pair_to(F.col("symbols"), a, b, merged).alias("symbols"),
        )
    return alphabet + learned


def _best_len_probe(vocab: list[str]):
    """Build the longest-match probe for a trained vocabulary: a
    (word, pos, first) -> best-length Column factory. Pieces are
    grouped driver-side by (continuation?, stripped length) so each
    ladder rung probes ONLY the same-length candidates — the per-
    position constant is ~|vocab| comparisons total, not
    maxlen*|vocab| — and the whole probe stays inside whole-stage
    codegen."""
    by_len: dict[tuple[bool, int], list[str]] = {}
    for p in vocab:
        if p == UNK:
            continue
        cont = p.startswith(CONT)
        by_len.setdefault((cont, len(_strip_cont(p))), []).append(p)
    maxlen = max((l for (_, l) in by_len), default=1)

    def best_len(word, pos, first):
        """Longest l in maxlen..1 whose piece at pos is in vocab,
        else 0 — built from SHORTEST to longest so the longest
        match wins."""
        out = F.lit(0)
        for l in range(1, maxlen + 1):
            first_pieces = by_len.get((False, l), [])
            cont_pieces = by_len.get((True, l), [])
            if not first_pieces and not cont_pieces:
                continue
            raw = F.substr(word, pos, F.lit(l))
            in_first = (
                F.array_contains(
                    F.array(*[F.lit(p) for p in first_pieces]), raw
                )
                if first_pieces
                else F.lit(False)
            )
            in_cont = (
                F.array_contains(
                    F.array(
                        *[F.lit(_strip_cont(p)) for p in cont_pieces]
                    ),
                    raw,
                )
                if cont_pieces
                else F.lit(False)
            )
            ok = (F.length(raw) == l) & F.when(
                first, in_first
            ).otherwise(in_cont)
            out = F.when(ok, F.lit(l)).otherwise(out)
        return out

    return best_len


def wordpiece_encode(col: Column | str, vocab: list[str]) -> Column:
    """Greedy longest-match-first WordPiece encoding of ONE WORD
    column -> piece array (the BERT `WordpieceTokenizer` algorithm):
    from the current position try the longest piece first (continuation
    positions probe ``##``-prefixed pieces); a position with no match
    collapses the whole word to ``[UNK]``. Pure JVM fold — at most
    ``len(word)`` steps, each probing ``maxlen..1`` against the
    vocabulary array literal."""
    c = F.col(col) if isinstance(col, str) else col
    best_len = _best_len_probe(vocab)

    def step(acc, _):
        pos = acc["pos"]
        word = acc["word"]
        done = acc["failed"] | (pos > F.length(word))
        first = pos == 1
        bl = best_len(word, pos, first)
        raw = F.substr(word, pos, bl)
        piece = F.when(first, raw).otherwise(F.concat(F.lit(CONT), raw))
        return F.when(done, acc).otherwise(
            F.when(
                bl == 0,
                F.struct(
                    word.alias("word"),
                    (F.length(word) + 1).alias("pos"),
                    F.lit(True).alias("failed"),
                    acc["toks"].alias("toks"),
                ),
            ).otherwise(
                F.struct(
                    word.alias("word"),
                    (pos + bl).alias("pos"),
                    F.lit(False).alias("failed"),
                    F.array_append(acc["toks"], piece).alias("toks"),
                )
            )
        )

    init = F.struct(
        c.alias("word"),
        F.lit(1).alias("pos"),
        F.lit(False).alias("failed"),
        F.array().cast("array<string>").alias("toks"),
    )
    fold = F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        init,
        step,
    )
    return F.when(
        (F.length(c) == 0) | fold["failed"], F.array(F.lit(UNK))
    ).otherwise(fold["toks"])


def wordpiece_count_word(col: Column | str, vocab: list[str]) -> Column:
    """struct(n, unk) for ONE WORD column under greedy longest-match —
    the COUNT-ONLY twin of :func:`wordpiece_encode`: the accumulator
    carries (pos, n, failed) scalars, never the piece array, so each
    fold step is O(1) instead of the array-append copy (O(len) per
    step) — the scan-local cost drops from quadratic to linear in
    word length. [UNK] counts as 1 token."""
    c = F.col(col) if isinstance(col, str) else col
    best_len = _best_len_probe(vocab)

    def step(acc, _):
        pos = acc["pos"]
        word = acc["word"]
        done = acc["failed"] | (pos > F.length(word))
        bl = best_len(word, pos, pos == 1)
        return F.when(done, acc).otherwise(
            F.struct(
                word.alias("word"),
                F.when(bl == 0, F.length(word) + 1)
                .otherwise(pos + bl)
                .alias("pos"),
                (bl == 0).alias("failed"),
                F.when(bl == 0, acc["n"]).otherwise(acc["n"] + 1).alias(
                    "n"
                ),
            )
        )

    init = F.struct(
        c.alias("word"),
        F.lit(1).alias("pos"),
        F.lit(False).alias("failed"),
        F.lit(0).alias("n"),
    )
    fold = F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        init,
        step,
    )
    failed = (F.length(c) > 0) & fold["failed"]
    return F.struct(
        F.when(F.length(c) == 0, F.lit(0))
        .when(failed, F.lit(1))
        .otherwise(fold["n"])
        .alias("n"),
        F.when(failed, F.lit(1)).otherwise(F.lit(0)).alias("unk"),
    )


def wordpiece_token_counts(col: Column | str, vocab: list[str]) -> Column:
    """struct(n_wp_tokens, n_unk_words) of a whole TEXT column as ONE
    fold over its whitespace words — both sums ride the same
    accumulator so the per-word longest-match fold
    (:func:`wordpiece_count_word`) is evaluated exactly once per
    word. All JVM-side; the corpus-wide tokenizer-cost accounting
    path. Select the struct into a named column FIRST, then project
    its fields, so the plan carries one encode pass."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(
        F.split(F.trim(c), r"\s+"), lambda w: F.length(w) > 0
    )

    def step(acc, w):
        s = wordpiece_count_word(w, vocab)
        return F.struct(
            (acc["n"] + s["n"]).alias("n"),
            (acc["unk"] + s["unk"]).alias("unk"),
        )

    return F.aggregate(
        words,
        F.struct(F.lit(0).alias("n"), F.lit(0).alias("unk")),
        step,
    )
