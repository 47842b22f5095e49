#!/usr/bin/env python3
"""Regenerate PLANS.md: formatted physical plans for representative
queries, with the scale-relevant facts (pushed filters, read schemas,
join strategies, exchange count) called out per plan.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One representative per family; the full suite's shapes are asserted in
# tests/test_plans.py — this file is the human-readable evidence.
SHOWN = [
    ("ingest_e2e", "end-to-end compiled ingest (scan→filter→variables→joins→dedup→aggregate)"),
    ("ingest_coda_real", "the reference's shipped coda schema, NXS+SC variables"),
    ("q3_top_revenue", "3-table join + aggregate + top-k"),
    ("j4_anti_exists_pid", "anti-join dedup probe"),
    ("dedup_minhash_lsh", "MinHash+LSH candidate pairs"),
    ("ann_ivf_topk", "IVF cell ANN (computed-column assignment, broadcast probe)"),
    ("t8_hourly_rollup", "event-time window rollup"),
    (
        "q21_suppliers_who_kept_waiting",
        "EXISTS + NOT EXISTS lineitem self-joins as LeftSemi/LeftAnti hash joins",
    ),
    (
        "q15_top_supplier",
        "scalar max via 1-row broadcast join (no unpartitioned window)",
    ),
    (
        "q7_volume_shipping",
        "nation-pair trade: both big-join sides semi-reduced by the 2/25 "
        "trade nations before the shuffle",
    ),
    (
        "dedup_incremental",
        "stored-LSH-index probe: LeftSemi vs the corpus index + in-bucket "
        "window + LeftAnti, all increment-sized",
    ),
    (
        "bpe_train_segment",
        "trained-BPE encode: chained JVM aggregate folds over every "
        "document's words (training collected 8 argmax rows at build)",
    ),
    (
        "dedup_remove_spans",
        "ExactSubstr removal: span-hash frequency + as-of coverage "
        "window + doc-keyed reassembly — all linear exchanges",
    ),
    (
        "warc_extract_text",
        "WARC capture -> HTML -> text: scan-local bytes plane "
        "(mapInPandas framing/HTTP), then the whole 6-step extraction "
        "as ONE codegen Project — no Python in the string plane, no "
        "shuffle beyond the parallelism re-split",
    ),
    (
        "events_user_running",
        "per-key ordered-window family on one user_id exchange",
    ),
    (
        "supplier_pareto",
        "global cumulative share WITHOUT a single-partition window: range "
        "exchange + keyed cumsum + triangular-join prefix offsets",
    ),
    (
        "shard_by_token_budget",
        "export sharding: seeded-shuffle range exchange + distributed "
        "token prefix sum + integer-div shard cut (no global window)",
    ),
    (
        "dedup_jaccard_ssjoin",
        "exact similarity join via rarest-first prefix filtering "
        "(candidates only where prefix shingles collide, never n^2)",
    ),
    (
        "text_decontaminate",
        "eval-split n-gram decontamination (broadcast gram set, hits-only shuffle)",
    ),
    (
        "pack_sequences",
        "token-budget sequence packing (shard-key window, one shuffle)",
    ),
    (
        "corpus_prep_e2e",
        "composed corpus prep: quality gate -> decontaminate -> dedup -> pack",
    ),
    (
        "asof_last_click",
        "as-of join via tag-union-window (one shuffle, no range nested loop)",
    ),
    (
        "sitemap_frontier",
        "sitemap-fed frontier: domain-sized discovery joins broadcast; "
        "the big capture side scans once under a broadcast semi filter "
        "+ broadcast anti (never shuffles)",
    ),
    (
        "link_harmonic_hll",
        "HyperBall harmonic centrality: per hop one equi-join + one "
        "partial-aggregatable groupBy-max over sparse HLL register rows",
    ),
    (
        "warc_pdf_extract",
        "application/pdf decode rides the scan-local bytes plane "
        "(mapInPandas), dead-letters per record; downstream is one "
        "codegen Project",
    ),
    (
        "dedup_simhash_hamming",
        "banded 64-bit SimHash: self-join candidates, XOR+bit_count verify",
    ),
    (
        "image_phash_dedup",
        "image dHash over real decoded pixels (scan-local mapInPandas) "
        "-> the same banded-Hamming join machinery as text SimHash -> "
        "broadcast anti survivor fold",
    ),
    (
        "dedup_lines_global",
        "C4-style global line dedup (line-hash window + doc reassembly)",
    ),
    (
        "dedup_semantic",
        "SemDeDup: computed-column cell assignment, in-cell join, broadcast anti",
    ),
    (
        "corpus_prep_full_e2e",
        "full hygiene pipeline: repetition -> pii -> quality -> line dedup "
        "-> decontaminate -> dedup -> pack",
    ),
    ("q6_forecast_revenue", "pure scan-filter-aggregate (all predicates pushed)"),
    ("q10_returned_items", "fact join + group + deterministic top-20 (TakeOrdered)"),
    (
        "ann_ivf_pq_topk",
        "IVFADC: corpus carries (cell, codes) only, cell equi-join cuts "
        "candidates before ADC scoring (codebook tensors constant-folded)",
    ),
    (
        "q8_market_share",
        "widest join chain (7 tables): one big lineitem x orders join, "
        "all dims broadcast, conditional DECIMAL share",
    ),
    (
        "text_tfidf_top",
        "TF-IDF: df via window over term (one shuffle of tf), broadcast N, "
        "TakeOrdered top-20",
    ),
    (
        "ann_knn_join",
        "self-kNN: IVF-cell computed-column assignment, in-cell self-join "
        "reusing ONE materialized exchange, per-vector rank window",
    ),
    (
        "ann_knn_join_nprobe",
        "multi-probe self-kNN: probe side explodes top-2 cells, corpus "
        "side keeps its single cell (no dedup needed)",
    ),
    (
        "dedup_semantic_prototypes",
        "SSL-prototypes pruning: scan-local cosine-to-own-centroid from "
        "the transposed dot fold, per-cell rank window (one shuffle)",
    ),
    (
        "warc_robots_filter",
        "RFC 9309 politeness gate (r10 plan): per-domain rule ARRAY -> "
        "equi BroadcastHashJoin on domain + scan-local longest-match "
        "fold — replaces r9's non-equi BroadcastNestedLoop entirely",
    ),
    (
        "bpe_train_bytes",
        "byte-level BPE encode: regex pre-tokenization + hex-byte "
        "alphabet, chained JVM folds (training collected 8 argmax rows)",
    ),
    (
        "warc_article_extract",
        "article-scoped link-density extraction: the whole per-line "
        "score/gate/join is ONE codegen Project after the scan-local "
        "bytes plane",
    ),
    (
        "link_pagerank",
        "domain PageRank from capture bytes: scan-local link "
        "extraction, per-iteration contribution shuffle + 1-row "
        "broadcast scalars (N, dangling mass) — zero driver collects",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    spark = get_session("explain_plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical plans of representative queries",
        "",
        f"Generated by `python tools/explain_plans.py {sf_dir}` "
        "(regenerate after plan-affecting changes).",
        "",
        "What to look for, per SCALE.md: filters/pruning pushed into the",
        "parquet scan (`PushedFilters`, narrow `ReadSchema`), dimension",
        "joins as `BroadcastHashJoin`, anti-joins broadcast, exactly the",
        "shuffles the operator semantics require, and no Python stages in",
        "relational paths (`mapInPandas` only for the gated readers).",
        "",
    ]
    for name, blurb in SHOWN:
        import contextlib
        import io

        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # the testdata re-split repartition is a test-scale artifact;
        # count real shuffles separately
        # count node-detail headers: each plan node appears exactly once
        # as "(N) <Name>" in the formatted details section
        exchanges = len(re.findall(r"^\(\d+\) (?:Broadcast)?Exchange\b", plan, re.M))
        resplits = len(re.findall(r"REPARTITION_BY_NUM", plan))
        broadcasts = len(re.findall(r"^\(\d+\) BroadcastExchange\b", plan, re.M))
        out += [
            f"## {name}",
            "",
            f"{blurb}.",
            f"Exchanges: {exchanges} total — {broadcasts} broadcast, "
            f"{resplits} test-scale re-split (`ensure_parallelism`, no-op on "
            f"well-split data), {exchanges - broadcasts - resplits} required "
            "by the operator semantics.",
            "",
            "```",
            plan.strip(),
            "```",
            "",
        ]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWN)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
