"""Distributed BPE tokenizer training + JVM-side encoding (r9).

The canonical LLM-data tokenizer op (Sennrich et al., *Neural Machine
Translation of Rare Words with Subword Units*, ACL 2016): train
byte-pair merges from corpus statistics, then encode text with the
learned merge list. The repo's existing token counters (whitespace,
BPE-ish regex in operators/text.py) approximate tokenizer cost; this
module trains a REAL merge list and counts real BPE tokens.

Spark-first shape, and why it scales:

- **One corpus-sized shuffle total**: the word-frequency count. BPE
  training then runs on the (word, freq, symbols) VOCABULARY relation
  — |vocab| rows, orders of magnitude smaller than the corpus — so
  each merge iteration shuffles vocabulary-sized data only.
- **Per iteration, the driver receives exactly ONE row** (the argmax
  pair) — the same bounded-collect pattern as the k-means/PQ codebook
  training in operators/similarity.py. No corpus data ever reaches
  the driver.
- **The merge rewrite and the encoder are pure JVM Column
  expressions**: greedy left-to-right non-overlapping pair merging is
  an ``aggregate`` fold over the symbol array (correct because a
  merged token ``a||b`` can never equal ``a`` or ``b``, so a fresh
  merge can't chain inside one pass), and encoding chains the k folds
  — whole-stage codegen, no Python in the data plane.

Determinism: ties in pair counts break lexicographically on (a, b) —
both engines sort (count DESC, a, b) — so training is reproducible
and the DuckDB oracle replays it as k unrolled CTE stages
(oracles._bpe_oracle), the ann_ivf_trained precedent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_SPLIT = r"\s+"


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus-sized
    shuffle of the whole training pipeline."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), WORD_SPLIT)).alias(
                "word"
            )
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def chars(col: Column | str) -> Column:
    """Initial symbol sequence: the word's characters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "")


def merge_pair(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (a, b) -> a||b as
    one ``aggregate`` fold (see module docstring for why a single
    pass cannot chain)."""
    merged = a + b

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


def _train_merges(vocab: DataFrame, merges: int) -> list[tuple[str, str]]:
    """The shared training loop over a (word, freq, symbols)
    vocabulary relation. Each iteration: vocabulary-sized pair count +
    a ONE-ROW collect (the argmax pair, lexicographic tie-break) + a
    JVM fold rewrite of the symbol column."""
    # lineage of k fold layers over a vocabulary relation is cheap for
    # practical k; checkpoint per ~32 merges if training deep
    vocab = vocab.localCheckpoint()
    learned: list[tuple[str, str]] = []
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
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        learned.append((a, b))
        vocab = vocab.select(
            "word", "freq", merge_pair(F.col("symbols"), a, b).alias("symbols")
        )
    return learned


def bpe_train(
    docs: DataFrame, text_col: str = "text", merges: int = 8
) -> list[tuple[str, str]]:
    """Learn ``merges`` pair merges from corpus word statistics over
    whitespace words and a CHARACTER alphabet (the Sennrich 2016
    formulation). Returns the ordered merge list."""
    vocab = word_freq(docs, text_col).select(
        "word", "freq", chars("word").alias("symbols")
    )
    return _train_merges(vocab, merges)


def bpe_encode(col: Column | str, merges: list[tuple[str, str]]) -> Column:
    """Encode ONE WORD column into its BPE symbol array by chaining
    the learned merges — k nested JVM folds, no Python."""
    sym = chars(col)
    for a, b in merges:
        sym = merge_pair(sym, a, b)
    return sym


def bpe_token_count(
    col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """BPE token count of a whole TEXT column: fold over its
    whitespace words, summing each word's encoded symbol count.
    Entirely JVM-side — the scale path for corpus-wide tokenizer cost
    accounting with a real trained tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(
        F.split(F.trim(c), WORD_SPLIT), lambda w: F.length(w) > 0
    )
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.size(bpe_encode(w, merges)),
    )


# ---------------------------------------------------------------------------
# byte-level BPE + regex pre-tokenization (r10 — the GPT-2 formulation)
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenization, simplified to the engine-portable
# subset (identical match semantics in Java regex and RE2, pinned by
# test + oracle): English contractions, space-prefixed letter runs,
# space-prefixed digit runs, space-prefixed punctuation/other runs.
# The leading-space convention is what makes byte-level merges learn
# word-boundary tokens (' the'); whitespace runs themselves are not
# tokens (documented simplification vs GPT-2's \s+ tail branches).
PRETOK_RE = (
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+"
)


def pretokens(col: Column | str) -> Column:
    """Pre-token array of a text column (regexp_extract_all — JVM)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(PRETOK_RE), 0)


def byte_symbols(col: Column | str) -> Column:
    """Initial BYTE-level symbol sequence of a pre-token: the UTF-8
    bytes as two-hex-digit symbols ('caf\\u00e9' -> 63 61 66 C3 A9) —
    the closed byte alphabet that makes the vocabulary total over
    arbitrary input, with a DuckDB-replayable representation
    (hex(encode(word)) on both engines, uppercase in both)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.hex(F.encode(c, "UTF-8")), F.lit(".."), 0)


def pretoken_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over pre-tokens — the byte-level trainer's single
    corpus-sized shuffle."""
    return (
        docs.select(F.explode(pretokens(text_col)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train_bytes(
    docs: DataFrame, text_col: str = "text", merges: int = 8
) -> list[tuple[str, str]]:
    """Byte-level BPE training (VERDICT r9 task 5): pre-tokenize with
    PRETOK_RE, split each pre-token into its UTF-8 byte symbols, then
    run the SAME merge loop as :func:`bpe_train` — one corpus shuffle,
    one-row collects, JVM fold rewrites. Merged symbols are hex-string
    concatenations ('74' + '68' -> '7468'), so the merge list is a
    real byte-pair vocabulary closed over arbitrary bytes."""
    vocab = pretoken_freq(docs, text_col).select(
        "word", "freq", byte_symbols("word").alias("symbols")
    )
    return _train_merges(vocab, merges)


def bpe_encode_bytes(
    col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Encode ONE PRE-TOKEN column into its byte-level BPE symbol
    array by chaining the learned merges — k nested JVM folds."""
    sym = byte_symbols(col)
    for a, b in merges:
        sym = merge_pair(sym, a, b)
    return sym


def bpe_token_count_bytes(
    col: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Byte-level BPE token count of a whole TEXT column: fold over
    its pre-tokens, summing each one's encoded symbol count — all
    JVM-side, no Python in the data plane."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        pretokens(c),
        F.lit(0),
        lambda acc, w: acc + F.size(bpe_encode_bytes(w, merges)),
    )
