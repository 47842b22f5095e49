"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python in the hot
path) — at 100 TB these run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny marker-word lists per language — the classic n-gram/stopword
# heuristic, shrunk to deterministic word lookups.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "y", "es"),
}

_WORD_RE = r"[a-zA-Z]+"
_NUM_RE = r"[0-9]+"
# BPE-ish pretokenizer: words, numbers, or single non-space symbols
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def words(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def _marker_pred(markers: tuple[str, ...]):
    # single-arg closure: a two-param lambda would receive the array index
    return lambda w: w.isin(*markers)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker hits per language over the document's word array."""
    toks = words(text)
    return {
        lang: F.size(F.filter(toks, _marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column, default: str = "unk") -> Column:
    """argmax over marker scores; ties break by language name order
    (deterministic); zero hits -> default."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for lang, score in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit(default)
    )


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / word-shape features with a
    composite keep/drop flag (the C4-style cheap filter family)."""
    toks = words(text)
    n_chars = F.length(text)
    n_words = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    all_stop = [w for ms in LANG_MARKERS.values() for w in ms]
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*all_stop)))
    avg_word_len = F.when(
        n_words > 0,
        (F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    keep = (
        (n_words >= 5)
        & (avg_word_len >= 2.0)
        & (avg_word_len <= 12.0)
        & (punct_ratio <= 0.3)
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "avg_word_len": F.round(avg_word_len, 6),
        "keep": keep,
    }


def fingerprint(text: Column, window: int = 4) -> Column:
    """Winnowing-style document fingerprint: minimum md5 over the
    document's word `window`-grams. Robust to local edits; one string per
    doc — groupable for near-dup clustering."""
    toks = words(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))))
    return F.array_min(grams)
