"""Export-sharding family: deterministic seeded shuffle + token-budget
shard packing (the last step of a training-data pipeline before shard
write-out). Both ride the distributed prefix sum in operators/windows.py
— the invariants here are the ones the SQL oracle cannot see: shard-size
balance, budget-boundary guarantees, determinism across invocations, and
the no-global-window plan shape."""

from pyspark.sql import functions as F

import scicat_ingestor_spark.queries as Q
from scicat_ingestor_spark.operators import windows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_rank_is_row_number_over_total_order(spark):
    df = spark.range(0, 1000).withColumn("k", F.expr("id * 37 % 1000"))
    out = windows.global_rank(df, [F.col("k").asc()], out_col="r")
    rows = {r.k: r.r for r in out.collect()}
    # k is a permutation of 0..999, so rank(k) == k + 1
    assert rows == {k: k + 1 for k in range(1000)}


def test_corpus_shuffle_ranks_and_shard_balance(spark, sf_dir):
    out = Q.q_corpus_shuffle(spark, sf_dir).collect()
    n = len(out)
    assert sorted(r.shuffle_rank for r in out) == list(range(1, n + 1))
    sizes = {}
    for r in out:
        sizes[r.shard_id] = sizes.get(r.shard_id, 0) + 1
    assert set(sizes) == set(range(min(16, n)))
    # round-robin over the shuffled order: shard sizes differ by <= 1
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_corpus_shuffle_deterministic_across_invocations(spark, sf_dir):
    a = {r.doc_id: (r.shuffle_rank, r.shard_id)
         for r in Q.q_corpus_shuffle(spark, sf_dir).collect()}
    b = {r.doc_id: (r.shuffle_rank, r.shard_id)
         for r in Q.q_corpus_shuffle(spark, sf_dir).collect()}
    assert a == b


def test_token_budget_shards_reach_their_boundary(spark, sf_dir):
    budget = 4096
    rows = sorted(
        Q.q_shard_by_token_budget(spark, sf_dir).collect(),
        key=lambda r: r.cum_tokens,
    )
    assert rows[-1].cum_tokens == sum(r.n_tokens for r in rows)
    shard_ids = [r.shard_id for r in rows]
    # contiguous fill: shard ids are nondecreasing along the shuffle
    # order and cover 0..max with no gaps
    assert shard_ids == sorted(shard_ids)
    assert set(shard_ids) == set(range(shard_ids[-1] + 1))
    # every shard except the last crosses its budget boundary: its last
    # doc's cumulative count reaches (s+1)*budget (greedy contiguous
    # fill can under-fill only the final shard)
    last_cum = {}
    for r in rows:
        last_cum[r.shard_id] = r.cum_tokens
    for s, cum in last_cum.items():
        if s != shard_ids[-1]:
            assert cum >= (s + 1) * budget


def test_export_shards_roundtrip(spark, sf_dir, tmp_path):
    """The physical export: every doc lands in exactly one shard dir,
    per-shard token sums match the planner's assignment, and the shard
    count matches the budget math."""
    from scicat_ingestor_spark.operators.sharding import (
        export_shards,
        token_budget_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    export_shards(docs, out, budget=4096)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns) | {"n_tokens", "shard_id"}
    got = {
        r.shard_id: r.total
        for r in back.groupBy("shard_id").agg(F.sum("n_tokens").alias("total")).collect()
    }
    planned = token_budget_shards(docs, budget=4096)
    want = {
        r.shard_id: r.total
        for r in planned.groupBy("shard_id").agg(F.sum("n_tokens").alias("total")).collect()
    }
    assert got == want


def test_export_shards_tolerates_preexisting_n_tokens(spark, sf_dir, tmp_path):
    """Pack-stage output / enriched doc tables already carry n_tokens;
    export_shards must drop the input's copy instead of producing a
    duplicate column that fails the parquet write (ADVICE r6)."""
    from scicat_ingestor_spark.operators.sharding import export_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "n_tokens", F.lit(-1).cast("bigint")  # stale value: must be replaced
    )
    out = str(tmp_path / "shards_pre")
    export_shards(docs, out, budget=4096)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.columns.count("n_tokens") == 1
    assert back.filter(F.col("n_tokens") < 0).count() == 0  # recomputed


def test_corpus_cli_export_shards(spark, sf_dir, tmp_path):
    """CLI endgame: --export-shards drops the pack projection, runs the
    hygiene stages, and writes shard_id= partition directories."""
    import os

    from scicat_ingestor_spark.apps.corpus import main

    out = str(tmp_path / "cli_shards")
    rc = main(
        [
            "--docs", f"{sf_dir}/documents.parquet",
            "--out", str(tmp_path / "unused"),
            "--stage", "quality", "--stage", "pack",
            "--export-shards", out,
            "--shard-budget", "2048",
        ]
    )
    assert rc == 0
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert len(shard_dirs) >= 2
    back = spark.read.parquet(out)
    # pack was dropped in favor of the physical export: text survives
    assert "text" in back.columns and "shard_id" in back.columns


def test_dedup_recall_report_shape_and_bounds(spark, sf_dir):
    """The dedup-candidate recall diagnostic: one row per threshold,
    found <= exact, recall in (0, 1], and at this corpus's dup
    similarity (~0.99) the bands=4/rows=2 config must not miss pairs —
    (1 - s^2)^4 is ~1e-8 at s=0.99, so recall below 1.0 here means the
    candidate path broke, not that LSH got unlucky."""
    rows = Q.q_dedup_recall_report(spark, sf_dir).collect()
    assert {r.threshold for r in rows} <= {0.5, 0.7, 0.9}
    assert rows, "sample must intersect ground-truth dup pairs"
    for r in rows:
        assert 0 < r.n_found <= r.n_exact
        assert r.recall == 1.0


def test_token_budget_shards_match_sequential_model(spark):
    """Model check: the distributed shard packer must agree row-for-row
    with the obvious sequential algorithm (sort by the md5 key, running
    token total, shard = prefix div budget) on randomized corpora —
    including all-empty docs, huge single docs, and budget-exact runs."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from scicat_ingestor_spark.operators.sharding import token_budget_shards

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=300),
            min_size=1,
            max_size=60,
            unique=False,
        ),
        st.sampled_from([7, 64, 100]),
    )
    def check(word_counts, budget):
        rows = [
            (i, " ".join(f"w{j}" for j in range(n)))
            for i, n in enumerate(word_counts)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.cum_tokens, r.shard_id)
            for r in token_budget_shards(df, budget=budget, seed="t").collect()
        }
        # model: whitespace_token_count(F.split(trim, \s+)) counts the
        # empty string as ONE token (split yields [''])
        toks = {i: max(n, 1) for i, n in enumerate(word_counts)}
        order = sorted(
            toks,
            key=lambda i: (hashlib.md5(f"t:{i}".encode()).hexdigest(), i),
        )
        cum = 0
        want = {}
        for i in order:
            prefix = cum
            cum += toks[i]
            want[i] = (toks[i], cum, prefix // budget)
        assert got == want

    check()


def test_prefix_filtered_jaccard_is_exhaustive_under_hot_shingles(spark):
    """The adversarial case for shared-shingle blocking: every doc
    carries the same hot phrase, so naive blocking would form the full
    n^2 product — the prefix filter must dodge that AND still find
    exactly the brute-force pair set."""
    from scicat_ingestor_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    rows = []
    for i in range(120):
        # hot phrase shared by all docs + a cluster-specific body:
        # docs in the same cluster-of-4 are near-identical
        body = " ".join(f"c{i // 4}w{j}" for j in range(12))
        extra = f"v{i % 4}"
        rows.append((i, f"the common header {body} {extra}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 1))}

    sets = {i: shingles(t) for i, t in rows}
    # 0.7 exercises the non-dyadic-threshold FP slack in the prunes
    for thr in (0.5, 0.7):
        got = {
            (r.id_a, r.id_b)
            for r in prefix_filtered_jaccard_pairs(
                df, "text", "doc_id", threshold=thr, shingle_n=2
            ).collect()
        }
        want = set()
        for a in range(120):
            for b in range(a + 1, 120):
                inter = len(sets[a] & sets[b])
                if inter / (len(sets[a]) + len(sets[b]) - inter) >= thr:
                    want.add((a, b))
        assert want, "constructed corpus must contain true near-dup pairs"
        assert got == want


def test_source_drift_psi_separates_stable_from_drifted(spark, tmp_path):
    """PSI semantics on constructed data: a source whose length profile
    is identical across the two snapshots scores near zero; a source
    whose new dump shifted from ~100-char to ~900-char docs scores far
    above the conventional 0.2 act threshold."""
    rows = []
    for i in range(1000):
        rows.append((i, "x", "en", "stable", (i * 13) % 1000))
        drifted = 100 if i % 5 == 0 else 900
        rows.append((i + 100000, "x", "en", "drift", drifted))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: r.psi
        for r in Q.q_source_drift_psi(spark, str(tmp_path)).collect()
    }
    assert got["stable"] < 0.05
    assert got["drift"] > 1.0


def test_duplicate_spans_flags_cross_doc_substrings(spark, tmp_path):
    """Substring-dedup semantics on constructed data: two docs sharing
    a 10-token run have exactly the shared 8-gram windows flagged;
    within-doc repetition alone flags nothing (that is the repetition
    family's business); a unique doc scores zero."""
    shared = " ".join(f"s{j}" for j in range(10))
    rows = [
        (0, shared + " tailA0 tailA1"),
        (1, "headB0 headB1 " + shared),
        (2, " ".join(f"u{j}" for j in range(12))),           # unique
        (3, "r0 r1 r2 r3 r4 r5 r6 r7 r0 r1 r2 r3 r4 r5 r6 r7"),  # self-repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.select("doc_id", "text", F.lit("en").alias("lang"),
                   F.lit("x").alias("source"), F.length("text").alias("n_chars"))
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in Q.q_dedup_duplicate_spans(spark, str(tmp_path)).collect()
    }
    # 12 tokens -> 5 windows of 8; the 10 shared tokens give 3 shared
    # windows per doc
    assert got[0] == (5, 3)
    assert got[1] == (5, 3)
    assert got[2] == (5, 0)
    # 16 tokens -> 9 windows; the repeat makes windows recur WITHIN the
    # doc only, so none are cross-doc duplicated
    assert got[3] == (9, 0)


def test_corpus_cli_guarded_exit_code(spark, tmp_path):
    """handle_exceptions parity for the corpus CLI: a bad input path
    logs through the logging pipeline and exits 1, never a raw trace."""
    from scicat_ingestor_spark.apps.corpus import main

    rc = main(
        ["--docs", str(tmp_path / "nope.parquet"), "--out", str(tmp_path / "o")]
    )
    assert rc == 1


def test_bench_diff_flags_only_out_of_band(tmp_path):
    import json
    import sys

    sys.path.insert(0, "tools")
    from bench_diff import diff, load

    old = {"value": 10.0, "queries": {"a": 1.0, "b": 1.0, "gone": 1.0},
           "build": {"a": 0.2, "b": 0.2}, "exec": {"a": 0.8, "b": 0.8}}
    new = {"value": 11.0, "queries": {"a": 1.1, "b": 2.0, "fresh": 0.5},
           "build": {"a": 0.2, "b": 1.0}, "exec": {"a": 0.9, "b": 1.0}}
    for name, doc in (("old.json", old), ("new.json", new)):
        (tmp_path / name).write_text(json.dumps(doc) + "\n")
    rep = diff(load(str(tmp_path / "old.json")),
               load(str(tmp_path / "new.json")), band=1.3)
    assert [f["query"] for f in rep["flagged"]] == ["b"]
    assert rep["flagged"][0]["build_delta"] == 0.8  # build, not exec, regressed
    assert rep["added"] == ["fresh"] and rep["removed"] == ["gone"]


def test_sharding_plans_have_no_global_window(spark, sf_dir):
    for fn in (Q.q_corpus_shuffle, Q.q_shard_by_token_budget):
        plan = _plan(fn(spark, sf_dir))
        assert "Window" in plan
        assert "No Partition Defined" not in plan
        assert "rangepartitioning" in plan.lower()
