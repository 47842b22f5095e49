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


def _char_trigrams(text: str) -> list[str]:
    t = text.lower().strip(" ")
    return [t[i : i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []


def _langid_ref_train(rows, classes, k=4, lr=1.0, m=64):
    """Serial NumPy-free reference of train_langid_lr: dense
    normalized histograms + one-vs-rest full-batch GD."""
    feats = []
    for _id, lang, text in rows:
        hist = [0.0] * m
        grams = _char_trigrams(text)
        for g in grams:
            hist[_bucket(g, m)] += 1.0
        tot = max(float(len(grams)), 1.0)
        feats.append((lang, [v / tot for v in hist]))
    n = float(len(feats))
    w = {c: (0.0, [0.0] * m) for c in classes}
    for _ in range(k):
        new_w = {}
        for c in classes:
            gb = 0.0
            gw = [0.0] * m
            for lang, x in feats:
                z = w[c][0]
                for i in range(m):
                    z += x[i] * w[c][1][i]
                p = 1.0 / (1.0 + math.exp(-z))
                r = p - (1.0 if lang == c else 0.0)
                gb += r
                for i in range(m):
                    gw[i] += r * x[i]
            new_w[c] = (
                w[c][0] - lr * gb / n,
                [w[c][1][i] - lr * gw[i] / n for i in range(m)],
            )
        w = new_w
    return w


def test_langid_lr_matches_reference(spark):
    """train_langid_lr reproduces the serial reference bit-close
    (<1e-9 — Spark sums over partitions reorder float adds), and
    langid_predict classifies a separable held-out set correctly."""
    corpus = [
        (0, "aaa", "der hund läuft über die straße heute wieder"),
        (1, "bbb", "the dog runs across the street again today"),
        (2, "aaa", "über allen gipfeln ist ruh in allen wipfeln"),
        (3, "bbb", "over all the hilltops there is calm and rest"),
        (4, "aaa", "die straße ist heute wieder voller hunde"),
        (5, "bbb", "the street is again full of dogs today"),
    ]
    df = spark.createDataFrame(
        corpus, "doc_id long, lang string, text string"
    )
    got = selection.train_langid_lr(
        df, "doc_id", "lang", classes=["aaa", "bbb"], iterations=4
    )
    ref = _langid_ref_train(corpus, ["aaa", "bbb"])
    for c in ("aaa", "bbb"):
        assert abs(got[c][0] - ref[c][0]) < 1e-9
        assert all(
            abs(a - b) < 1e-9 for a, b in zip(got[c][1], ref[c][1])
        )
    held = spark.createDataFrame(
        [
            (10, "aaa", "die hunde läuft über die straße"),
            (11, "bbb", "the dogs run across the street"),
        ],
        "doc_id long, lang string, text string",
    )
    feats = selection.langid_feature_table(held, "doc_id", "lang")
    pred = {
        r["_id"]: r["p"]
        for r in feats.select(
            "_id", selection.langid_predict(F.col("_x"), got).alias("p")
        ).collect()
    }
    assert pred == {10: "aaa", 11: "bbb"}


def test_langid_predict_tie_breaks_to_first_class(spark):
    """Identical per-class weights -> identical scores -> the FIRST
    class in sorted order wins (the oracle's ORDER BY z DESC, class)."""
    w = {"zzz": (0.5, [0.0] * 64), "aaa": (0.5, [0.0] * 64)}
    df = spark.createDataFrame([(1, "x", "any text at all")],
                               "doc_id long, lang string, text string")
    feats = selection.langid_feature_table(df, "doc_id", "lang")
    got = feats.select(
        selection.langid_predict(F.col("_x"), w).alias("p")
    ).collect()[0]["p"]
    assert got == "aaa"


def test_langid_feature_table_gramless_doc(spark):
    """A doc under 3 chars keeps an all-zero histogram (explode_outer
    path) instead of vanishing from the table."""
    df = spark.createDataFrame(
        [(1, "x", "ab"), (2, "y", "abcd")],
        "doc_id long, lang string, text string",
    )
    feats = {
        r["_id"]: r["_x"]
        for r in selection.langid_feature_table(
            df, "doc_id", "lang"
        ).collect()
    }
    assert len(feats) == 2
    assert feats[1] == [0.0] * 64
    assert abs(sum(feats[2]) - 1.0) < 1e-12  # 2 grams, normalized
