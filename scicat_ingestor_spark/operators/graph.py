"""Link-graph analytics over crawl captures: domain-level PageRank.

The crawl-frontier companion of the WARC family: pages yield out-links
(operators/warc.page_outlinks), distinct (src_domain, dst_domain)
pairs form the domain graph, and PageRank ranks domains for crawl
prioritization / quality weighting — the classic use in web-corpus
pipelines (Common Crawl publishes exactly this as its domain-rank
dataset).

Spark-first shape, and why it scales:

- **No driver collects anywhere.** The two per-iteration scalars
  (node count, dangling mass) ride 1-row DataFrames through broadcast
  cross-joins — the q15_top_supplier pattern — so the loop is pure
  DataFrame algebra end to end.
- **Per iteration: one contribution shuffle** (edges ⋈ ranks grouped
  by dst) over the EDGE relation, plus node-sized maintenance joins.
  At web scale (1e8+ domains, 1e9+ domain edges) every join is a
  plain equi-join AQE can plan; nothing here is quadratic and no
  state ever concentrates on the driver.
- **Determinism for the oracle:** float addition order varies with
  partitioning, so ranks are bit-unstable in the last ulps; queries
  round to 6 decimals on BOTH engines (the PSI/tfidf convention) and
  the DuckDB oracle replays the same damped power iteration as
  unrolled CTE stages (the bpe_train/ann_ivf_trained precedent).

Reference: Page et al. 1999 (the PageRank citation); the dangling-mass
redistribution follows the standard formulation: r'(v) = (1-d)/N +
d * (sum_{u->v} r(u)/deg(u) + dangling_mass/N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_edges(outlinks: DataFrame) -> DataFrame:
    """Distinct cross-domain (src, dst) pairs from a page-outlinks
    relation (columns ``url``, ``link``). Self-edges (intra-domain
    links) are excluded — they dominate raw link counts and carry no
    ranking signal."""
    from scicat_ingestor_spark.operators import warc

    return (
        outlinks.select(
            warc.url_host("url").alias("src"),
            warc.url_host("link").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame, damping: float = 0.85, iterations: int = 4
) -> DataFrame:
    """Damped PageRank over a (src, dst) edge relation -> (node, rank).

    Uniform 1/N init over the node set (sources ∪ destinations);
    each iteration shuffles contributions once (edges ⋈ ranks,
    groupBy dst) and redistributes the dangling mass (rank sitting on
    nodes with no out-edges) uniformly. ``rank`` is the raw double —
    callers round for cross-engine comparison."""
    # pin the loop-invariant relations once and truncate the rank
    # lineage per iteration (the bpe_train localCheckpoint pattern):
    # without this, every iteration's plan re-embeds the whole
    # upstream (capture scan -> link extraction -> ...) per reference
    # and plan size grows combinatorially with the iteration count
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    edges_w = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).localCheckpoint()
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        ranks = ranks.localCheckpoint()
        contrib = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("c"))
        )
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
    return ranks


def harmonic_centrality(edges: DataFrame, max_hops: int = 3) -> DataFrame:
    """Hop-bounded harmonic centrality over a (src, dst) edge relation
    -> (node, harmonic): H(v) = sum over nodes u with directed
    distance d(u -> v) <= max_hops of 1/d — the OTHER published
    Common-Crawl domain rank (r11, VERDICT r10 task 5), reusing the
    PageRank iteration scaffold (localCheckpoint lineage truncation,
    no driver collects).

    Exact truncated BFS: hop k extends only the pairs whose MIN
    distance is k-1 (one equi-join on the edge relation) and a
    groupBy-min folds candidates — per hop one join + one aggregation
    shuffle over the PAIR relation. The pair relation is the scale
    boundary (|reachable pairs within max_hops|, quadratic on dense
    graphs): the web-scale variant replaces it with per-node
    HyperLogLog reachability counters (HyperBall, Boldi & Vigna
    2013 — the estimator Common Crawl's published ranks use); the
    hop-bounded exact form here is the oracle-checkable contract the
    approximation must converge to."""
    edges = edges.localCheckpoint()
    pairs = edges.select(
        "src", "dst", F.lit(1).alias("d")
    )
    for k in range(2, max_hops + 1):
        pairs = pairs.localCheckpoint()
        ext = (
            pairs.filter(F.col("d") == k - 1)
            .alias("p")
            .join(edges.alias("e"), F.col("p.dst") == F.col("e.src"))
            .select(
                F.col("p.src").alias("src"),
                F.col("e.dst").alias("dst"),
                F.lit(k).alias("d"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        pairs = (
            pairs.unionByName(ext)
            .groupBy("src", "dst")
            .agg(F.min("d").alias("d"))
        )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = pairs.groupBy("dst").agg(
        F.sum(F.lit(1.0) / F.col("d")).alias("harmonic")
    )
    return nodes.join(h, nodes["node"] == h["dst"], "left").select(
        "node",
        F.coalesce(F.col("harmonic"), F.lit(0.0)).alias("harmonic"),
    )
