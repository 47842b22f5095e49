"""Data-selection operators: DSIR importance weights and the trained
logistic-regression quality classifier — both pinned against serial
reference implementations (the pagerank/bpe test pattern)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import selection

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark engines shuffle data across the cluster"),
    (2, "the quick brown fox"),
    (3, "completely different legal boilerplate text here"),
    (4, "the quick spark fox shuffles engines"),
    (5, "one"),  # single word: zero bigrams
]


def _bigrams(text: str) -> list[str]:
    toks = [w for w in text.lower().strip().split() if w]
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram: str, m: int = 64) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % m


def test_dsir_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    target = df.filter(F.col("doc_id") < 2)
    raw = df.filter(F.col("doc_id") >= 2)
    ratios = selection.dsir_log_ratios(target, raw, n_buckets=64)

    # serial reference
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for i, t in DOCS:
        for g in _bigrams(t):
            d = ct if i < 2 else cr
            d[_bucket(g)] = d.get(_bucket(g), 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    exp = [
        math.log(
            ((ct.get(b, 0) + 1.0) / (tt + 64))
            / ((cr.get(b, 0) + 1.0) / (tr + 64))
        )
        for b in range(64)
    ]
    assert all(abs(a - b) < 1e-12 for a, b in zip(ratios, exp))

    got = {
        r["doc_id"]: r["s"]
        for r in raw.select(
            "doc_id",
            selection.dsir_score(F.col("text"), ratios).alias("s"),
        ).collect()
    }
    for i, t in DOCS[2:]:
        want = sum(exp[_bucket(g)] for g in _bigrams(t))
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)
    assert got[5] == 0.0  # zero bigrams -> zero score, not garbage


def test_quality_lr_matches_reference(spark):
    rows = [(i, t, 1 if len(t) > 30 else 0) for i, t in DOCS]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    w = selection.train_quality_lr(df, "label", iterations=5, lr=0.5)

    def feats(text: str) -> list[float]:
        toks = [x for x in text.lower().strip().split() if x]
        n = float(len(toks))
        safe = max(n, 1.0)
        return [
            math.log1p(n),
            sum(len(x) for x in toks) / safe,
            sum(1 for x in toks if x.isalpha() and x.islower()) / safe,
            sum(1 for x in toks if len(x) > 7) / safe,
        ]

    data = [(feats(t), float(lb)) for _, t, lb in rows]
    ws = [0.0] * 5
    for _ in range(5):
        grads = [0.0] * 5
        for x, y in data:
            z = ws[0] + sum(w_ * x_ for w_, x_ in zip(ws[1:], x))
            e = 1.0 / (1.0 + math.exp(-z)) - y
            grads[0] += e
            for j in range(4):
                grads[j + 1] += e * x[j]
        ws = [ws[j] - 0.5 * grads[j] / len(data) for j in range(5)]
    assert all(abs(a - b) < 1e-9 for a, b in zip(w, ws)), (w, ws)

    got = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id",
            selection.quality_probability(F.col("text"), w).alias("p"),
        ).collect()
    }
    for (i, t, _), (x, _y) in zip(rows, data):
        z = ws[0] + sum(w_ * x_ for w_, x_ in zip(ws[1:], x))
        assert abs(got[i] - 1.0 / (1.0 + math.exp(-z))) < 1e-9
    # the feature-correlated labels actually separate: every long doc
    # outscores every short one after training
    longs = [got[i] for i, t, lb in rows if lb == 1]
    shorts = [got[i] for i, t, lb in rows if lb == 0]
    assert min(longs) > max(shorts)
