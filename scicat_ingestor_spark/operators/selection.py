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


# ---------------------------------------------------------------------------
# trained language identification (r11, VERDICT r10 task 1)
# ---------------------------------------------------------------------------
#
# The fastText-class recipe CCNet/RefinedWeb/FineWeb use, built from
# the two halves this module already owns: hashed char-n-gram features
# (the DSIR bucket hash) + oracle-replayable full-batch gradient
# descent (the quality-classifier precedent), extended one-vs-rest to
# C classes. The marker-word scorer in operators/text.py remains the
# cheap fallback; this is the trained path.
#
# Scale shape: training builds the dense per-doc histograms
# RELATIONALLY (explode -> two hash aggregations — codegen'd JVM, not
# an interpreted per-element fold) and localCheckpoints them once;
# each GD iteration is one posexplode aggregation collapsing to
# n_buckets rows x C classes + a 1-row bias aggregate — the
# bounded-collect pattern. A 100 TB deployment trains on a bounded
# labeled sample (as every real langid model does) and SCORES the
# corpus scan-locally: one md5 per char-n-gram, then a C-way
# weight-table fold per doc — no shuffle, no Python.


def char_ngram_list(text: Column, n: int = 3) -> Column:
    """Char n-grams (with multiplicity) of the lowercased trimmed
    text, spaces included — the fastText feature alphabet. Empty
    array below n chars (the sequence(1,0)-descends guard)."""
    t = F.lower(F.trim(text))
    idx = F.sequence(F.lit(1), F.length(t) - (n - 1))
    return F.when(
        F.length(t) >= n,
        F.transform(idx, lambda i: F.substr(t, i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


def langid_buckets(
    text: Column, n_buckets: int = 64, n: int = 3
) -> Column:
    """Hashed char-n-gram bucket ids, ``array<long>`` — ONE md5 per
    gram. Select this as its own column before scoring so the hash
    pass materializes once, not per class."""
    return F.transform(
        char_ngram_list(text, n), lambda g: hash_bucket(g, n_buckets)
    )


def langid_feature_table(
    docs: DataFrame,
    id_col: str,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 64,
    n: int = 3,
) -> DataFrame:
    """(_id, _lang, _x) training-feature table: the dense NORMALIZED
    histogram x[b] = count_b / n_grams as ``array<double>``, built
    relationally (explode -> count -> map_from_entries) so the heavy
    lifting is two codegen'd hash aggregations. Gram-less docs (under
    n chars) keep an all-zero histogram via explode_outer."""
    bks = docs.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lang"),
        F.explode_outer(
            langid_buckets(F.col(text_col), n_buckets, n)
        ).alias("_b"),
    )
    cnt = bks.groupBy("_id", "_lang", "_b").agg(
        F.count(F.lit(1)).alias("_c")
    )
    hist = cnt.groupBy("_id", "_lang").agg(
        F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("_b").isNotNull(),
                    F.struct(F.col("_b"), F.col("_c")),
                )
            )
        ).alias("_m"),
        F.sum(
            F.when(F.col("_b").isNotNull(), F.col("_c")).otherwise(
                F.lit(0)
            )
        ).alias("_tot"),
    )
    tot = F.greatest(F.col("_tot").cast("double"), F.lit(1.0))
    x = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("long")).cast("double"),
            F.lit(0.0),
        )
        / tot,
    )
    return hist.select("_id", "_lang", x.alias("_x"))


def _langid_dot(x_col: Column, w: list[float], bias: float) -> Column:
    """bias + sum_i x[i]*w[i], folded in POSITION ORDER 0..n-1 over
    the dense feature array (the training-loop float path)."""
    w_lit = F.array(*[F.lit(float(v)) for v in w])
    return F.aggregate(
        F.zip_with(x_col, w_lit, lambda a, b: a * b),
        F.lit(float(bias)),
        lambda acc, v: acc + v,
    )


def train_langid_lr(
    docs: DataFrame,
    id_col: str,
    label_col: str,
    text_col: str = "text",
    classes: list[str] | None = None,
    n_buckets: int = 64,
    n: int = 3,
    iterations: int = 4,
    lr: float = 1.0,
) -> dict[str, tuple[float, list[float]]]:
    """One-vs-rest logistic regression over
    :func:`langid_feature_table`, zero-initialized full-batch GD —
    deterministic given the corpus, so the oracle replays every
    iteration as unrolled CTE stages. Per iteration: ONE posexplode
    aggregation (n_buckets rows x C residual sums) + one 1-row bias
    aggregate, each a bounded collect. Returns
    {class: (bias, weights)}."""
    if classes is None:
        classes = sorted(
            r[0] for r in docs.select(label_col).distinct().collect()
        )
    feats = langid_feature_table(
        docs, id_col, label_col, text_col, n_buckets, n
    ).localCheckpoint()
    n_docs = float(feats.count())
    w = {c: (0.0, [0.0] * n_buckets) for c in classes}
    for _ in range(iterations):
        resids = []
        for c in classes:
            z = _langid_dot(F.col("_x"), w[c][1], w[c][0])
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            y = (F.col("_lang") == c).cast("double")
            resids.append((p - y).alias(f"_r_{c}"))
        base = feats.select(*resids, F.col("_x"))
        bias_row = base.agg(
            *[F.sum(f"_r_{c}").alias(f"g_{c}") for c in classes]
        ).collect()[0]
        grad_rows = (
            base.select(
                *[F.col(f"_r_{c}") for c in classes],
                F.posexplode("_x").alias("pos", "val"),
            )
            .groupBy("pos")
            .agg(
                *[
                    F.sum(F.col(f"_r_{c}") * F.col("val")).alias(
                        f"g_{c}"
                    )
                    for c in classes
                ]
            )
            .collect()
        )
        g = {r["pos"]: r for r in grad_rows}
        new_w = {}
        for c in classes:
            bias = w[c][0] - lr * float(bias_row[f"g_{c}"]) / n_docs
            ws = [
                w[c][1][i] - lr * float(g[i][f"g_{c}"]) / n_docs
                if i in g
                else w[c][1][i]
                for i in range(n_buckets)
            ]
            new_w[c] = (bias, ws)
        w = new_w
    return w


def langid_scores(
    x: Column, weights: dict[str, tuple[float, list[float]]]
) -> Column:
    """Per-class logits (sorted class order) as ``array<double>``
    from a DENSE features column (:func:`langid_feature_table`'s
    ``_x``): the same position-ordered dot product as training — one
    float path for training, scoring, and the oracle. 64 fold steps
    per doc per class; the per-gram work (md5 + count) happened in
    the feature table's codegen'd aggregations, never here."""
    return F.array(
        *[
            _langid_dot(x, ws, bias)
            for _, (bias, ws) in sorted(weights.items())
        ]
    )


def langid_predict(
    x: Column, weights: dict[str, tuple[float, list[float]]]
) -> Column:
    """argmax class over :func:`langid_scores`; ties break to the
    FIRST class in sorted order (array_position finds the first
    maximum), mirroring the oracle's ORDER BY score DESC, class."""
    classes = F.array(*[F.lit(c) for c in sorted(weights)])
    scores = langid_scores(x, weights)
    pos = F.array_position(scores, F.array_max(scores)).cast("int")
    return F.element_at(classes, pos)
