"""Link-graph PageRank for frontier prioritization: rank every URL of
the crawled web graph by the classic damped random-surfer model, so the
crawl scheduler can spend its politeness budget on high-centrality
pages first (the priority classes in crawl/rounds.py order
pagination/detail/link mechanically; link-rank is the quality signal a
production frontier blends in on top — cf. the reference's sequential
single-site loop, /root/reference/fetch/fetcher.go, which has no
cross-site prioritization at all).

Implementation is fixed-iteration power iteration over an edge
DataFrame — nothing collects to the driver:

* out-degrees: one groupBy over the (distinct) edge table;
* per iteration: ranks join edges on src (both sides shuffle on src —
  co-partitioned; at scale pre-partition + persist the edge table once
  and every iteration reuses that layout), contributions groupBy dst,
  and the two corpus-wide scalars (node count, dangling mass) ride
  along as broadcast one-row crossJoins — never ``.collect()``;
* dangling mass (nodes with no out-links — item pages here) is
  redistributed uniformly, so total rank stays 1 every iteration.

Lineage grows linearly with iterations; past a handful of rounds cut it
with ``checkpoint_every`` exactly like ops/dedup.connected_components
(localCheckpoint per iteration — the plan, not the data, is what blows
up). The demo runs 3 iterations; rank convergence is geometric in the
damping factor so production crawls run 10-20.

Floats: contributions are summed in engine-dependent order, so ranked
output is rounded (ROUND_DIGITS) for cross-engine comparison — same
convention as the cosine/Jaccard ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
ITERS = 3
ROUND_DIGITS = 6


def pagerank(
    edges: DataFrame,
    iters: int = ITERS,
    damping: float = DAMPING,
    checkpoint_every: int = 4,
) -> DataFrame:
    """edges(src, dst) → (url, link_rank). Duplicate edges collapse
    (a page linking twice votes once — matches the distinct anchor
    semantics of the frontier's own dedup).

    The loop invariants (edge set, out-degrees, node set) are
    materialized ONCE with cut lineage: every iteration references all
    three, so without the cut the plan re-derives the edge table —
    including whatever produced it (here the full corpus parse) — once
    per reference per iteration. ``checkpoint_every=4`` bounds the rank
    chain itself: the dangling-mass scalar of iteration i embeds the
    full rank subtree of iteration i, so an uncut 20-30 iteration run
    (the production setting) grows the plan superlinearly — same trap
    documented at ops/dedup.connected_components."""
    # e eager (cuts whatever produced the edges — the corpus parse —
    # right away); deg/nodes non-eager: they materialize inside the
    # first job that needs them and are block-reused from then on, so
    # no extra upfront jobs are scheduled.
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    deg = (
        e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("url"))
        .unionByName(e.select(F.col("dst").alias("url")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "url", (F.lit(1.0) / F.col("n")).alias("r")
    )
    base = 1.0 - damping  # embedded verbatim in the SQL oracle
    for it in range(iters):
        rd = ranks.join(deg, ranks["url"] == deg["src"], "left").select(
            "url", "r", "deg"
        )
        dangling = rd.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dang")
        )
        shares = rd.filter(F.col("deg").isNotNull()).select(
            F.col("url").alias("s"), (F.col("r") / F.col("deg")).alias("share")
        )
        contrib = (
            e.join(shares, e["src"] == F.col("s"), "inner")
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["url"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_nodes))
            .crossJoin(F.broadcast(dangling))
            .select(
                "url",
                (
                    F.lit(base) / F.col("n")
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dang") / F.col("n"))
                ).alias("r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("url", F.round("r", ROUND_DIGITS).alias("link_rank"))


def corpus_link_edges(spark: SparkSession, spec) -> DataFrame:
    """Derive the link graph of a synthetic corpus the honest way: parse
    every generated page's HTML with the extraction engine and take the
    resolved anchors (spark/extract_udf.parse_pages link_urls — the same
    Arrow pass the crawl's frontier expansion runs). Item pages carry no
    anchors, so they surface as dangling nodes."""
    from ..spark.corpus import generate_pages
    from ..spark.extract_udf import parse_pages

    # Right-size the parse to the corpus: each parse task pays a fixed
    # init (config build, parser setup), so a tiny demo corpus at the
    # session's full parallelism is ~all task overhead (measured 2.24 s
    # → 1.68 s min at sf-demo scale by sizing to ≥8 pages/task);
    # production corpora keep the session's parallelism.
    parts = max(4, min(spark.sparkContext.defaultParallelism,
                       spec.total_pages // 8))
    pages = generate_pages(spark, spec, partitions=parts)
    parsed = parse_pages(pages, spec.config_yaml())
    return (
        parsed.select(
            F.col("url").alias("src"), F.explode_outer("link_urls").alias("dst")
        )
        .filter(F.col("dst").isNotNull())
        .distinct()
    )
