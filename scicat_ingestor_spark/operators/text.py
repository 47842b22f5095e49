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


# ---------------------------------------------------------------------------
# Repetition / hygiene features (the Gopher rule family, Rae et al. 2021)
# ---------------------------------------------------------------------------

def _nonempty_trimmed(parts: Column) -> Column:
    """Trim each split part and drop empties — normalizes the split-edge
    semantics (trailing/leading empties) so both engines agree."""
    return F.filter(
        F.transform(parts, lambda x: F.trim(x)), lambda x: F.length(x) > 0
    )


def _frac(num: Column, den: Column) -> Column:
    return F.round(
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
    )


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style repetition and symbol-noise signals, all as pure
    Column expressions (scan-speed at 100 TB; zero Python, zero shuffle).

    - dup_line_frac / dup_para_frac: 1 - distinct/total over non-empty
      trimmed lines (split '\\n') and paragraphs (split '\\n\\n').
    - top_word_frac: share of tokens taken by the single most frequent
      word (the 1-gram version of Gopher's top-n-gram rule). Computed
      as the longest equal-run of the SORTED token array (one
      array_sort + one linear aggregate fold) — document-local, inside
      whole-stage codegen. The r1-r10 form filtered the token array
      once per DISTINCT token (O(distinct x tokens) per document); the
      sorted-run form computes the identical integer in O(tokens log
      tokens) and cut the corpus_prep_full_e2e repetition stage ~4x at
      sf0.1 (r11 optimization round, guide §1.2 "per-task work").
    - symbol_word_ratio: '#' or '...' occurrences per word (Gopher's
      symbol-to-word rule).
    - bullet_line_frac / ellipsis_line_frac: lines starting with a
      bullet (-, *) / ending with '...'.
    - keep_gopher: the composite gate at the published thresholds
      (dup lines <= 30%, dup paragraphs <= 30%, top word <= 20%,
      symbols/word <= 10%, bullets <= 90%, ellipsis <= 30%).
    """
    lines = _nonempty_trimmed(F.split(text, r"\n"))
    paras = _nonempty_trimmed(F.split(text, r"\n\n"))
    toks = _nonempty_trimmed(F.split(F.lower(text), r"\s+"))
    n_lines = F.size(lines)
    n_paras = F.size(paras)
    n_words = F.size(toks)
    dup_line_frac = _frac(n_lines - F.size(F.array_distinct(lines)), n_lines)
    dup_para_frac = _frac(n_paras - F.size(F.array_distinct(paras)), n_paras)
    # longest equal-run over the sorted tokens == max per-token count.
    # The init sentinel "" cannot collide: _nonempty_trimmed guarantees
    # every token is non-empty. Empty array -> init passes through ->
    # best = 0, matching the old coalesce(array_max(...), 0) edge.
    top_count = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_word_frac = _frac(top_count, n_words)
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), 0))
    symbol_word_ratio = _frac(n_symbols, n_words)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^[-*]")))
    n_ellipsis = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$")))
    bullet_line_frac = _frac(n_bullet, n_lines)
    ellipsis_line_frac = _frac(n_ellipsis, n_lines)
    keep = (
        (dup_line_frac <= 0.30)
        & (dup_para_frac <= 0.30)
        & (top_word_frac <= 0.20)
        & (symbol_word_ratio <= 0.10)
        & (bullet_line_frac <= 0.90)
        & (ellipsis_line_frac <= 0.30)
    )
    return {
        "dup_line_frac": dup_line_frac,
        "dup_para_frac": dup_para_frac,
        "top_word_frac": top_word_frac,
        "symbol_word_ratio": symbol_word_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "keep_gopher": keep,
    }


# PII patterns, deliberately in the Java-regex ∩ RE2 common subset (no
# lookarounds, no backrefs) so Spark and the DuckDB oracle match char
# for char. Scrub order matters (an email eats its own digits before the
# phone pass): counts are taken per-pattern on the ORIGINAL text,
# replacements applied sequentially in list order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{6,}\d", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Matches per PII class on the raw text."""
    return {
        name: F.regexp_count(text, F.lit(pat)) for name, pat, _ in PII_PATTERNS
    }


def pii_scrub(text: Column) -> Column:
    """Redact all PII classes, sequentially in PII_PATTERNS order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


# ---------------------------------------------------------------------------
# Unicode script profiling (r11) — the langid complement
# ---------------------------------------------------------------------------
#
# Codepoint-range census per document: the cheap structural signal
# real pipelines (CCNet's script gate, FineWeb's language buckets)
# read BEFORE any model — catches wrong-script contamination, mixed-
# script spam, and digit-heavy boilerplate that a trained classifier
# only sees probabilistically. Ranges are explicit BMP literals so
# Java regex and RE2 agree exactly; counts come from the
# length-minus-stripped trick (one regexp_replace per script, all
# codegen).

SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-zÀ-ɏ]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("digit", "[0-9]"),
)


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script codepoint counts (+ total chars) of a text column —
    length(t) - length(t with the script class stripped)."""
    out = {"n_chars": F.length(text)}
    for name, cls in SCRIPT_RANGES:
        out[name] = F.length(text) - F.length(
            F.regexp_replace(text, cls, "")
        )
    return out


def dominant_script(counts: dict[str, Column]) -> Column:
    """First script in SCRIPT_RANGES order whose count >= every
    other's — the deterministic priority-order argmax both engines
    spell identically (ties resolve to the earlier-listed script);
    'none' when no script char occurs at all."""
    names = [n for n, _ in SCRIPT_RANGES]
    expr = F.lit("none")
    for name in reversed(names):
        is_max = F.lit(True)
        for other in names:
            if other != name:
                is_max = is_max & (counts[name] >= counts[other])
        expr = F.when((counts[name] > 0) & is_max, F.lit(name)).otherwise(
            expr
        )
    return expr
