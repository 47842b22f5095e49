"""Data selection for pretraining corpora: DSIR importance weights and
a trained logistic-regression quality classifier.

Two published data-selection methods the hygiene family (operators/
text.py) doesn't cover:

- **DSIR** (Xie et al. 2023, *Data Selection for Language Models via
  Importance Resampling*): score every raw document by how much its
  hashed-n-gram distribution looks like a TARGET domain —
  ``sum over doc n-grams of log(p_target[bucket] / p_raw[bucket])``
  with Laplace-smoothed bucket probabilities. The standard cheap
  domain-matching selector (used to pick Pile-like subsets of CC).
- **Quality classifier** (the GPT-3-report recipe): train logistic
  regression on engineered text features distinguishing a curated
  positive set from the raw crawl, then score everything and keep by
  threshold. Training here is full-batch gradient descent with a
  fixed iteration count — deterministic given the data, so the DuckDB
  oracle replays every iteration as unrolled CTE stages (the
  bpe_train precedent).

Scale shape:

- DSIR: two bounded-cardinality aggregations build the (n_buckets)-row
  probability tables; the log-ratio vector collects ONCE (bounded,
  n_buckets doubles — the codebook pattern) and rides every task as a
  literal array, so scoring is a scan-local JVM fold over each doc's
  n-grams. No per-doc shuffle.
- Classifier: per GD iteration ONE aggregation produces the
  (n_features+1) gradient sums; the driver sees one row per iteration
  (the BPE argmax pattern). Scoring with the trained weights is a
  pure Column expression.

Portability: bucket hashing is md5-based (the repo's engine-portable
hash convention — operators/dedup.py); all float outputs round at the
query layer (the PSI/pagerank convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def ngram_list(text: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (unlike dedup.word_shingles,
    which is distinct) — DSIR counts every occurrence."""
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    # guard: sequence(1, 0) is DESCENDING in Spark (the word_shingles
    # trap), so short docs return an EMPTY gram list explicitly
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def hash_bucket(gram: Column, n_buckets: int) -> Column:
    """Engine-portable bucket: first 8 md5 hex chars as an integer,
    mod n_buckets (DuckDB: conv-free via from_hex arithmetic in the
    oracle's CTE)."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast(
        "long"
    ) % n_buckets


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = 64,
) -> list[float]:
    """The DSIR importance vector: Laplace-smoothed log(p_target/p_raw)
    per hashed-n-gram bucket. Two bounded aggregations + one bounded
    collect (n_buckets doubles)."""
    import math

    def counts(df: DataFrame) -> dict[int, int]:
        rows = (
            df.select(
                F.explode(ngram_list(F.col(text_col), n)).alias("g")
            )
            .select(hash_bucket(F.col("g"), n_buckets).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {int(r["b"]): int(r["c"]) for r in rows}

    ct, cr = counts(target), counts(raw)
    tt, tr = sum(ct.values()), sum(cr.values())
    out = []
    for b in range(n_buckets):
        pt = (ct.get(b, 0) + 1.0) / (tt + n_buckets)
        pr = (cr.get(b, 0) + 1.0) / (tr + n_buckets)
        out.append(math.log(pt / pr))
    return out


def dsir_score(
    text: Column, log_ratios: list[float], n: int = 2
) -> Column:
    """Per-document DSIR importance weight: fold the doc's hashed
    n-grams over the broadcast log-ratio literal — scan-local JVM."""
    n_buckets = len(log_ratios)
    lut = F.array(*[F.lit(float(v)) for v in log_ratios])
    grams = ngram_list(text, n)
    return F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.element_at(lut, (hash_bucket(g, n_buckets) + 1).cast("int")),
    )


# ---------------------------------------------------------------------------
# logistic-regression quality classifier
# ---------------------------------------------------------------------------

N_QUALITY_FEATURES = 4


def quality_features(text: Column) -> list[Column]:
    """The engineered feature vector (fixed order, both engines):
    log1p(token count), mean word length, alpha-word ratio, and mean
    log1p(word frequency rank proxy) -> here simply the fraction of
    words longer than 7 chars (a cheap rare-word proxy). Deterministic
    closed forms a SQL oracle replays exactly."""
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    n = F.size(toks)
    nd = n.cast("double")
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double")
    alpha = F.size(
        F.filter(toks, lambda w: w.rlike("^[a-z]+$"))
    ).cast("double")
    long_w = F.size(
        F.filter(toks, lambda w: F.length(w) > 7)
    ).cast("double")
    safe = F.greatest(nd, F.lit(1.0))
    return [
        F.log1p(nd),
        total_len / safe,
        alpha / safe,
        long_w / safe,
    ]


def _dot(ws: list[float], xs: list[Column]) -> Column:
    z = F.lit(float(ws[0]))  # bias
    for w, x in zip(ws[1:], xs):
        z = z + F.lit(float(w)) * x
    return z


def train_quality_lr(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    iterations: int = 8,
    lr: float = 0.5,
) -> list[float]:
    """Full-batch gradient descent for logistic regression on
    :func:`quality_features`, zero-initialized — deterministic given
    the corpus, so the oracle replays every iteration. Per iteration:
    ONE aggregation (n_features+1 gradient sums + the count), one-row
    collect (the BPE/codebook bounded-collect pattern). Returns
    [bias, w1..w4]."""
    xs = quality_features(F.col(text_col))
    y = F.col(label_col).cast("double")
    base = docs.select(
        y.alias("_y"),
        *[xs[i].alias(f"_x{i}") for i in range(len(xs))],
    )
    base = base.localCheckpoint()
    w = [0.0] * (len(xs) + 1)
    for _ in range(iterations):
        z = _dot(w, [F.col(f"_x{i}") for i in range(len(xs))])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = (p - F.col("_y")).alias("_e")
        agg = base.select(
            err,
            *[F.col(f"_x{i}") for i in range(len(xs))],
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_e").alias("g0"),
            *[
                F.sum(F.col("_e") * F.col(f"_x{i}")).alias(f"g{i + 1}")
                for i in range(len(xs))
            ],
        ).collect()[0]
        n = float(agg["n"])
        w = [
            w[j] - lr * float(agg[f"g{j}"]) / n
            for j in range(len(w))
        ]
    return w


def quality_probability(text: Column, weights: list[float]) -> Column:
    """Score a text column with trained weights — pure Column
    expression, scan-local."""
    z = _dot(weights, quality_features(text))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
