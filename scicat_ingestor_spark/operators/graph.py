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
    # r12 (VERDICT r11 #7, guide §2.4): checkpoint the weighted edge
    # relation PRE-PARTITIONED on the per-iteration join key.
    # localCheckpoint preserves the physical output partitioning in the
    # LogicalRDD, so when the planner picks a shuffle join for
    # edges ⋈ ranks the edge side satisfies the distribution from the
    # checkpoint and ONLY the narrow (node, rank) side moves each
    # iteration — the connected-components operator's pre-partitioned
    # fallback (dedup.py) applied to PageRank. When ranks fits a
    # broadcast (AQE decides at runtime), the partitioning is simply
    # unused; the one build-time shuffle of the edge relation is paid
    # once for `iterations` reuses.
    edges_w = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).repartition("src").localCheckpoint()
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


# deterministic engine-portable HLL (the q_text_vocab_sketch sketch:
# md5 12-bit register index, rho over the next 60 bits, exact decimal
# register sums, one folded float numerator)
_HLL_P = 12
_HLL_M = 1 << _HLL_P
_HLL_NUM = (
    (0.7213 / (1.0 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M * float(1 << 61)
)


def _node_regs(nodes: DataFrame) -> DataFrame:
    """Sparse B_0 counters: each node's HLL contains exactly itself —
    one (node, idx, rho) row per node."""
    h = F.md5(F.col("node"))
    idx = F.conv(F.substring(h, 1, 3), 16, 10).cast("long")
    w = F.conv(F.substring(h, 4, 15), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(w))
    )
    return nodes.select("node", idx.alias("idx"), rho.alias("rho"))


def _hll_estimate(regs: DataFrame) -> DataFrame:
    """(node, est): the vocab-sketch estimator over sparse registers —
    exact integer register math, one float division, linear counting
    below the small-range threshold."""
    sk = regs.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr("CAST(shiftleft(1L, 61 - rho) AS DECIMAL(38,0))")
        ).alias("scaled_present"),
    )
    total = F.col("scaled_present").cast("double") + (
        F.lit(_HLL_M) - F.col("n_present")
    ).cast("double") * F.lit(float(1 << 61))
    e_raw = F.lit(_HLL_NUM) / total
    zeros = F.lit(_HLL_M) - F.col("n_present")
    est = F.when(
        (e_raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return sk.select("node", est.alias("est"))


def harmonic_centrality_hll(
    edges: DataFrame, max_hops: int = 3
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) — the estimator Common Crawl's
    published harmonic ranks actually use, and the WEB-SCALE path the
    exact :func:`harmonic_centrality` contract pins: per node an HLL
    counter of the nodes that REACH it; hop t unions each node's
    counter with its in-neighbors' (sparse (node, idx, rho) rows, so
    the union is one equi-join + one groupBy-max — both map-side
    combinable); H(v) ~= sum_t (|B(v,t)| - |B(v,t-1)|) / t.

    State per node is <= m registers (sparse: <= |reached| rows), so
    the per-hop shuffle is O(|edges| * avg registers) with NO
    quadratic pair relation — the scale difference vs the exact
    operator. Same lineage-truncation discipline as pagerank; the
    sketch is the deterministic engine-portable HLL (vocab-sketch
    convention), so the oracle replays every hop."""
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    regs = _node_regs(nodes).localCheckpoint()
    est_prev = _hll_estimate(regs)
    deltas = None
    for t in range(1, max_hops + 1):
        prop = edges.join(
            regs, regs["node"] == edges["src"]
        ).select(F.col("dst").alias("node"), "idx", "rho")
        regs = (
            regs.unionByName(prop)
            .groupBy("node", "idx")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint()
        )
        est_t = _hll_estimate(regs)
        d = (
            est_t.alias("a")
            .join(est_prev.alias("b"), "node")
            .select(
                "node",
                (
                    (F.col("a.est") - F.col("b.est")) / F.lit(float(t))
                ).alias("delta"),
            )
        )
        deltas = d if deltas is None else deltas.unionByName(d)
        est_prev = est_t
    acc = deltas.groupBy("node").agg(
        F.sum("delta").alias("harmonic_est")
    )
    return nodes.join(acc, "node", "left").select(
        "node",
        F.coalesce(F.col("harmonic_est"), F.lit(0.0)).alias(
            "harmonic_est"
        ),
    )
