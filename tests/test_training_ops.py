"""Invariant tests for the training-pipeline extension operators:
benchmark decontamination and token-budget sequence packing. Value-level
correctness is covered by the DuckDB oracle gate (tools/check_oracle.py);
these assert the semantic invariants the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from scicat_ingestor_spark.queries import (
    _t,
    q_pack_sequences,
    q_text_decontaminate,
)


def test_decontaminate_excludes_eval_split(spark, sf_dir):
    out = q_text_decontaminate(spark, sf_dir).collect()
    assert len(out) > 0  # the shared vocab guarantees some overlap
    for r in out:
        assert r.doc_id % 97 != 0  # eval docs never flag themselves
        assert r.n_hits >= 1


def test_decontaminate_hits_are_real_overlaps(spark, sf_dir):
    # cross-check one flagged doc by recomputing its 4-gram overlap
    # against the eval split with an independent (driver-side) method
    out = q_text_decontaminate(spark, sf_dir)
    flagged = out.orderBy("doc_id").first()
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def grams(text):
        toks = text.lower().split()
        n = 4
        if len(toks) <= n:
            return {" ".join(toks[:n])}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    eval_grams = set()
    for r in docs:
        if r.doc_id % 97 == 0:
            eval_grams |= grams(r.text)
    doc_text = next(r.text for r in docs if r.doc_id == flagged.doc_id)
    assert len(grams(doc_text) & eval_grams) == flagged.n_hits


def test_pack_sequences_partitions_all_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    expected = (
        docs.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    )
    totals = {r.source: r.t for r in expected}
    out = q_pack_sequences(spark, sf_dir).collect()
    per_source: dict[str, list] = {}
    for r in out:
        per_source.setdefault(r.source, []).append(r)
    assert set(per_source) == set(totals)
    for source, bins in per_source.items():
        # bins are contiguous from 0 and jointly conserve the tokens
        assert sorted(b.bin_id for b in bins) == list(range(len(bins)))
        assert sum(b.bin_tokens for b in bins) == totals[source]
        assert all(b.n_docs >= 1 for b in bins)
