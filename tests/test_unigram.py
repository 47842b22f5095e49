"""Unigram-LM tokenizer training (r11): Viterbi segmentation against
a serial reference, deterministic tie-breaks, EM pruning, and the
coverage floor."""

from __future__ import annotations

from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import unigram

MISS = -1.0


def _viterbi_ref(word: str, vocab: dict[str, float], maxp: int = 4):
    """Serial twin of viterbi_pieces: product scores, smallest-split
    tie-break."""
    L = len(word)
    sc = [1.0] + [None] * L
    for i in range(1, L + 1):
        cands = []
        for j in range(max(0, i - maxp), i):
            p = vocab.get(word[j:i])
            cands.append(sc[j] * p if p is not None else MISS)
        sc[i] = max(cands)
    pieces = []
    pos = L
    while pos > 0:
        lo = max(0, pos - maxp)
        for j in range(lo, pos):
            p = vocab.get(word[j:pos])
            cand = sc[j] * p if p is not None else MISS
            if cand == sc[pos]:
                pieces.append(word[j:pos])
                pos = j
                break
    return list(reversed(pieces))


def test_viterbi_matches_reference(spark):
    vocab = {
        "a": 0.1, "b": 0.1, "c": 0.05, "ab": 0.2, "bc": 0.2,
        "abc": 0.02, "abcd": 0.01, "d": 0.1,
    }
    words = ["abc", "abcd", "aabb", "d", "abcabc", "ab"]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        r["word"]: r["p"]
        for r in df.select(
            "word",
            unigram.viterbi_pieces(F.col("word"), vocab).alias("p"),
        ).collect()
    }
    for w in words:
        assert got[w] == _viterbi_ref(w, vocab), w
    # 'abc': ab+c = .2*.05 = .01 vs a+bc = .1*.2 = .02 -> a|bc wins
    assert got["abc"] == ["a", "bc"]


def test_viterbi_tie_breaks_longest_trailing_piece(spark):
    # xy and yx same prob; 'xyx' ties xy|x vs x|yx. The backtrack
    # walks right-to-left choosing the smallest split point at each
    # step -> the LONGEST TRAILING piece wins: x|yx.
    vocab = {"x": 0.1, "y": 0.1, "xy": 0.2, "yx": 0.2}
    df = spark.createDataFrame([("xyx",)], ["word"])
    got = df.select(
        unigram.viterbi_pieces(F.col("word"), vocab).alias("p")
    ).collect()[0]["p"]
    assert got == ["x", "yx"] == _viterbi_ref("xyx", vocab)


def test_unseen_char_still_segments(spark):
    vocab = {"a": 0.5, "b": 0.4}
    df = spark.createDataFrame([("a?b",)], ["word"])
    got = df.select(
        unigram.viterbi_pieces(F.col("word"), vocab).alias("p")
    ).collect()[0]["p"]
    assert "".join(got) == "a?b"  # lossless even off-vocab


def test_em_round_prunes_and_floors(spark):
    docs = spark.createDataFrame(
        [("abab abab ab",), ("abab cd",)], ["text"]
    )
    words = unigram.word_freqs(docs)
    v0 = unigram.seed_vocab(words, vocab_size=8, max_piece_len=4)
    assert all(len(p) <= 4 for p in v0)
    assert {"a", "b", "c", "d"} <= set(v0)
    v1 = unigram.em_round(words, v0)
    # chars never prune, even unused ones keep the Laplace floor
    assert {"a", "b", "c", "d"} <= set(v1)
    assert all(pr > 0 for pr in v1.values())
    # multi-char pieces that the Viterbi never used are gone
    used = set()
    for r in (
        words.select(
            unigram.viterbi_pieces(F.col("word"), v0).alias("p")
        ).collect()
    ):
        used |= set(r["p"])
    assert all(len(p) == 1 or p in used for p in v1)
    # probabilities sum to ~1 over counted mass + floor
    assert abs(sum(v1.values()) - 1.0) < 0.35  # floor shifts mass


def test_word_piece_counts_and_train(spark):
    docs = spark.createDataFrame(
        [("interchange interchange inter change",)], ["text"]
    )
    v = unigram.unigram_train(docs, vocab_size=16, rounds=2)
    words = unigram.word_freqs(docs)
    wpc = {
        r["word"]: r["n_pieces"]
        for r in unigram.word_piece_counts(words, v).collect()
    }
    assert set(wpc) == {"interchange", "inter", "change"}
    assert all(n >= 1 for n in wpc.values())
    # frequent substrings became multi-char pieces: segmentation of
    # the compound is shorter than its character count
    assert wpc["interchange"] < len("interchange")
