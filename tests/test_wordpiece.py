"""WordPiece training + longest-match encoding (r11): serial
reference parity for both halves, the [UNK] collapse, continuation
prefixing, and likelihood-vs-count divergence from BPE."""

from __future__ import annotations

from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import wordpiece


def _train_ref(words: dict[str, int], merges: int):
    """Serial twin of wordpiece_train: likelihood-scored merges over
    ##-marked character symbols, (a, b) tie-break."""
    vocab = {
        w: [w[0]] + ["##" + ch for ch in w[1:]] for w in words
    }
    alphabet = sorted({s for syms in vocab.values() for s in syms})
    learned = []
    for _ in range(merges):
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for w, syms in vocab.items():
            f = words[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        # highest score, ties to lexicographically smallest (a, b)
        best = min(
            pc,
            key=lambda p: (
                -(pc[p] / (float(sc[p[0]]) * float(sc[p[1]]))),
                p[0],
                p[1],
            ),
        )
        a, b = best
        merged = a + (b[2:] if b.startswith("##") else b)
        learned.append(merged)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return alphabet + learned


def _encode_ref(word: str, vocab: list[str]):
    """Serial twin of the BERT WordpieceTokenizer greedy algorithm."""
    vs = set(vocab)
    maxlen = max(
        len(p[2:] if p.startswith("##") else p) for p in vocab
    )
    out, pos = [], 0
    while pos < len(word):
        for l in range(min(maxlen, len(word) - pos), 0, -1):
            raw = word[pos : pos + l]
            piece = raw if pos == 0 else "##" + raw
            if piece in vs:
                out.append(piece)
                pos += l
                break
        else:
            return ["[UNK]"]
    return out


CORPUS = [
    "the unaffable cat sat",
    "the cat sat on the mat",
    "unbearable the the cat",
    "thematic cataclysm sat mat",
]


def test_train_matches_serial_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    words: dict[str, int] = {}
    for t in CORPUS:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    got = wordpiece.wordpiece_train(docs, merges=6)
    assert got == _train_ref(words, 6)
    # merged pieces carry the first symbol's prefix status
    assert all(not p.startswith("##") or len(p) > 2 for p in got)


def test_encode_longest_match_parity(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    vocab = wordpiece.wordpiece_train(docs, merges=6)
    test_words = sorted({w for t in CORPUS for w in t.split()})
    df = spark.createDataFrame([(w,) for w in test_words], "w string")
    got = {
        r["w"]: list(r["enc"])
        for r in df.select(
            "w", wordpiece.wordpiece_encode("w", vocab).alias("enc")
        ).collect()
    }
    for w in test_words:
        assert got[w] == _encode_ref(w, vocab), w
        # roundtrip: concatenating stripped pieces rebuilds the word
        assert "".join(
            p[2:] if p.startswith("##") else p for p in got[w]
        ) == w


def test_unk_collapse_and_counts(spark):
    # vocabulary that cannot spell 'xyz' -> [UNK]; 'ab' segments
    vocab = ["a", "##b", "ab", "b"]
    df = spark.createDataFrame(
        [("ab xyz ab",), ("ab",), ("",)], "text string"
    )
    rows = df.select(
        wordpiece.wordpiece_token_counts("text", vocab).alias("wp")
    ).select(
        F.col("wp.n").alias("t"), F.col("wp.unk").alias("u")
    ).collect()
    # 'ab' -> ['ab'] (longest match beats a+##b), xyz -> [UNK]
    assert (rows[0]["t"], rows[0]["u"]) == (3, 1)
    assert (rows[1]["t"], rows[1]["u"]) == (1, 0)
    assert (rows[2]["t"], rows[2]["u"]) == (0, 0)


def test_wordpiece_differs_from_bpe_on_likelihood(spark):
    # 'aa' occurs often but 'a' is ubiquitous: BPE (raw count) merges
    # ('a','##a') first; WordPiece's likelihood score prefers the
    # rarer-but-reliable ('b','##c') pair of 'bc'.
    rows = [("aa aa aa aa a a a a a a bc bc bc",)]
    docs = spark.createDataFrame(rows, "text string")
    vocab = wordpiece.wordpiece_train(docs, merges=1)
    assert vocab[-1] == "bc"
