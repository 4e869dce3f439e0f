"""Web-graph operators: link-edge extraction, anchor-text aggregation,
PageRank, and recrawl snapshot deltas.

The reference crawler walks the link graph imperatively (BFS over
``<a href>`` targets, break_checker.py:1379-1421) but never *analyzes*
it; these operators add the graph-analytics layer a Common-Crawl-scale
pipeline builds on the same edges — anchor-text aggregation (the
classic web-IR signal), PageRank for crawl prioritization, and
snapshot deltas for recrawl scheduling.

Scale design (10^10-URL regime):

* :func:`link_edges` parses each page exactly once inside an
  Arrow-batched ``mapInPandas`` (no per-row Python UDFs) and emits slim
  (src, dst, anchor) rows — the corpus-sized html column never crosses
  a shuffle.
* :func:`anchor_stats` is two hash aggregations with map-side partials;
  the first shuffle is keyed on (dst, anchor) — high cardinality, so a
  mega-site dst key is diluted across its distinct anchors before the
  per-dst collapse.
* :func:`pagerank` shuffles the edge list ONCE (hash-partitioned by
  ``src``, persisted) and reuses that partitioning every iteration;
  only the rank table (2 narrow columns, one row per node) moves per
  round.  The dangling-mass term is a 1-row broadcast aggregate — no
  driver-side ``.collect()`` in the loop.  ``localCheckpoint`` after
  each iteration truncates lineage exactly like
  :func:`~breakchecker_spark.operators.dedup.neardup_components`.
* :func:`snapshot_delta` is a single full-outer join on the URL key of
  two fingerprint snapshots — both sides pre-projected to (url, fp), so
  at 100 TB the shuffle moves two ~50-byte columns, not page bodies.
"""

from __future__ import annotations

from typing import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import htmlx

EDGE_SCHEMA = "src string, dst string, anchor string"

_SKIP_SCHEMES = ("mailto:", "tel:", "javascript:", "data:")


def link_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst, anchor) per ``<a href>`` — one harvest pass per page.

    Relative hrefs resolve against the page URL (urllib ``urljoin``,
    the same resolution the reference applies via bs4+urljoin at
    break_checker.py:1387); mailto/tel/javascript/data hrefs are link
    annotations, not graph edges, and are dropped.  Anchor text is the
    whitespace-collapsed character data inside the ``<a>`` element.
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, dsts, anchors = [], [], []
            for src, doc in zip(pdf[url_col], pdf[html_col]):
                if doc is None or src is None:
                    continue
                if isinstance(doc, (bytes, bytearray)):
                    doc = bytes(doc).decode("utf-8", errors="replace")
                for href, text in htmlx.harvest(doc).anchors_with_text:
                    href = href.strip()
                    if not href or href.lower().startswith(_SKIP_SCHEMES):
                        continue
                    try:
                        dst = urljoin(src, href)
                    except ValueError:
                        continue
                    srcs.append(src)
                    dsts.append(dst)
                    anchors.append(text)
            yield pd.DataFrame({"src": srcs, "dst": dsts, "anchor": anchors})

    return pages.select(url_col, html_col).mapInPandas(_gen, schema=EDGE_SCHEMA)


def anchor_stats(
    edges: DataFrame, dst_col: str = "dst", anchor_col: str = "anchor"
) -> DataFrame:
    """Per-target anchor-text aggregation: in-link count, distinct
    anchor count, and the most common anchor text (ties broken by the
    lexicographically largest anchor, so the result is deterministic
    under any execution order — the same MAX-over-struct resolution as
    :func:`~breakchecker_spark.operators.textstats.repetition_stats`).
    """
    per = edges.groupBy(dst_col, anchor_col).agg(F.count("*").alias("cnt"))
    return (
        per.groupBy(dst_col)
        .agg(
            F.sum("cnt").alias("in_links"),
            F.count("*").alias("distinct_anchors"),
            F.max(
                F.struct(F.col("cnt"), F.col(anchor_col).alias("anchor"))
            ).alias("_top"),
        )
        .select(
            dst_col,
            "in_links",
            "distinct_anchors",
            F.col("_top.anchor").alias("top_anchor"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges → (id, rank).

    Semantics: uniform 1/N init; per iteration every node's rank
    becomes ``(1-d)/N + d * (Σ in-contribs + dangling_mass/N)`` where a
    node's contribution is rank/out_degree and dangling_mass is the
    total rank parked on nodes with no out-edges (redistributed
    uniformly — the standard stochastic-matrix completion).  Multi-
    edges contribute multiply; self-loops are kept.  Σ rank = 1 is
    preserved every iteration.

    The edge list is hash-partitioned by ``src`` once and persisted;
    each iteration shuffles only the (id, rank) table into that
    partitioning.  Whether a node is dangling is STATIC, so it is
    computed once into the persisted nodes table; the per-iteration
    dangling mass is then a pure aggregate over the checkpointed rank
    table (no join, no driver collect) attached as a broadcast 1-row
    cross join.  ``localCheckpoint`` after every iteration keeps each
    round a single flat job whose inputs are all materialized RDDs.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .join(deg.withColumnRenamed("src", "id"), "id", "left")
        .select("id", F.col("out_deg").isNull().alias("dang"))
    )
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    adj = e.join(deg, "src").repartition(par, "src").persist()
    nodes = nodes.persist()
    n = nodes.count()  # one bounded scalar (graph order), outside the loop
    if n == 0:
        adj.unpersist()
        nodes.unpersist()
        return nodes.select("id", F.lit(0.0).alias("rank"))

    ranks = nodes.select("id", "dang", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("dang"), F.col("rank"))), F.lit(0.0)
            ).alias("dm")
        )
        contrib = (
            adj.join(
                ranks.select(F.col("id").alias("src"), "rank"), "src"
            )
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "dang",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    nodes.unpersist()
    return ranks.select("id", "rank")


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Recrawl delta between two crawl snapshots → (url, status).

    ``status`` ∈ {new, gone, changed, unchanged} from a full-outer join
    of content fingerprints on the URL key.  Feed the output to
    :func:`recrawl_priority` to order the next crawl's frontier.
    """
    o = old.select(F.col(url_col).alias("url"), F.col(fp_col).alias("_old_fp"))
    nw = new.select(F.col(url_col).alias("url"), F.col(fp_col).alias("_new_fp"))
    status = (
        F.when(F.col("_old_fp").isNull(), F.lit("new"))
        .when(F.col("_new_fp").isNull(), F.lit("gone"))
        .when(F.col("_old_fp") == F.col("_new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(nw, "url", "full_outer").select("url", status.alias("status"))


def recrawl_priority(delta: DataFrame) -> DataFrame:
    """Recrawl scheduling order over a :func:`snapshot_delta` output:
    changed pages first (content is moving), then new (never-fetched
    discoveries), then unchanged (staleness refresh); gone URLs leave
    the frontier entirely."""
    pri = (
        F.when(F.col("status") == "changed", F.lit(0))
        .when(F.col("status") == "new", F.lit(1))
        .otherwise(F.lit(2))
    )
    return delta.filter(F.col("status") != "gone").withColumn(
        "priority", pri.cast("int")
    )
