"""Distributed Bloom filter build + probe as pure DataFrame ops.

The semi-join-reduction pattern for decontamination at 100 TB: the exact
eval-gram set can be too large to broadcast comfortably (tens of GB of
strings for a large eval suite), but its Bloom filter is ~10 bits per
element regardless of string length. Build the filter WITH A DISTRIBUTED
AGGREGATION (no driver-side pass over the values), ship the packed bit
words to every task as one array literal, and prefilter the corpus gram
stream JVM-side before the exact verify join. No false negatives, so an
exact join on the survivors reproduces the exact-set result bit-for-bit
— the filter only shrinks the join input.

Spark's own runtime bloom-filter join reduction
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
automatically for shuffle joins, but its ``might_contain`` expression is
not exposed to the public function registry (verified on this build), and
it never helps a broadcast-hash join. This module is the explicit,
plannable version: the filter is built once and can gate ANY downstream
scan, including streaming micro-batches.

Everything here is codegen'd Column arithmetic — xxhash64, shift, mask —
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(value: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a value: pmod(xxhash64(value, seed_i), m)."""
    return [F.pmod(F.xxhash64(value, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def build(df: DataFrame, col: str, bits_per_elem: int = 12, k: int = 5):
    """Aggregate ``df[col]``'s values into a Bloom filter.

    Distributed build: each value explodes to k (word_index, bit_mask)
    pairs which bit_or-aggregate per word — one small shuffle keyed on
    word index (≤ m/64 groups), map-side combined. The driver only ever
    sees the finished m/64 packed words (m/8 bytes total), never the
    values.

    Returns (words, m_bits, k) where ``words`` is a list[int] of length
    m_bits // 64.
    """
    n = df.select(F.countDistinct(F.col(col)).alias("n")).collect()[0]["n"]
    m_bits = 64
    while m_bits < max(64, n * bits_per_elem):
        m_bits *= 2
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("pos")
    packed = (
        df.select(pos)
        # shiftleft's shift amount must be a Column-free int in the
        # Python API, so the bit math lives in SQL expressions
        .select(
            F.expr("shiftright(pos, 6)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in packed:
        words[row["word"]] = row["bits"]
    return words, m_bits, k


def probe(df: DataFrame, col: str, words: list[int], m_bits: int, k: int) -> DataFrame:
    """Keep only rows whose ``col`` value MIGHT be in the filter.

    The packed words ride along as ONE array<long> literal column
    (m/8 bytes once per task, not per predicate); the k membership tests
    are element_at + bitwise AND, all inside whole-stage codegen. False
    positives pass (callers verify with an exact join); false negatives
    cannot occur.
    """
    # temp names must not collide with caller columns (withColumn would
    # silently overwrite + drop them): suffix until unique
    suffix = ""
    while any(
        c in df.columns for c in [f"__bf{suffix}", *[f"__p{i}{suffix}" for i in range(k)]]
    ):
        suffix += "_"
    bf, ps = f"__bf{suffix}", [f"__p{i}{suffix}" for i in range(k)]
    out = df.withColumn(bf, F.lit(words))
    for name, p in zip(ps, _positions(F.col(col), m_bits, k)):
        out = out.withColumn(name, p)
    keep = F.lit(True)
    for name in ps:
        keep = keep & F.expr(
            f"(element_at({bf}, CAST(shiftright({name}, 6) AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({name} % 64 AS INT))) != 0"
        )
    return out.filter(keep).drop(bf, *ps)
