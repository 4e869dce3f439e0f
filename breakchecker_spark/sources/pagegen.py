"""Deterministic synthetic Common-Crawl-style pages table (seeded).

Benchmark/test input per FIXTURES.md: a crawlable web under one org
(``bench.example``) with

* heap-numbered link tree (children of page i are B·i+1 … B·i+B) so
  every page is reachable from page 0 and BFS depth is log_B(n);
* skewed host distribution — one mega-host owns ~30% of URLs
  (exercises salted politeness + AQE skew handling);
* extractable payload: ~30% of pages carry an org email, ~20% a
  ``+30`` E.164 phone, a few tracking-param duplicate links and
  out-of-scope links that the canonicalizer must drop.

Everything derives from the page index via fixed arithmetic — no RNG
state, so any scale regenerates identically (seed is the formula).
"""

from __future__ import annotations

import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas

ORG = "bench.example"
N_HOSTS = 64  # host 0 is the mega-host
# High fan-out keeps BFS round count low (100k pages in 3 waves), so
# the fixed per-round commit latency amortizes over large frontiers —
# the regime a real cluster crawl runs in.
BRANCH = 100
_TS0 = datetime.datetime(2025, 1, 1)


def host_of(i: int) -> str:
    if i % 10 < 3:  # ~30% of URLs on the mega-host
        return f"h0.{ORG}"
    return f"h{1 + (i * 2654435761) % (N_HOSTS - 1)}.{ORG}"


def url_of(i: int) -> str:
    if i == 0:
        return f"https://h0.{ORG}/"
    return f"https://{host_of(i)}/p{i}"


def _filler(i: int, blocks: int) -> str:
    """Deterministic realistic markup filler (~700 bytes per block).

    Common-Crawl pages average tens of KB of nested markup; the bench's
    minimal pages leave the crawl I/O-bound, so the scaling run uses
    this profile to measure the compute-bound regime a real corpus
    produces. Pure arithmetic of (i, j) — no RNG state.
    """
    out = []
    for b in range(blocks):
        words = " ".join(
            f"word{(i * 37 + b * 131 + j) % 997} lorem ipsum" for j in range(16)
        )
        items = "".join(f"<li>item {j} of block {b}</li>" for j in range(6))
        out.append(
            f'<div class="s{b % 7}"><h3>Section {b}</h3><p>{words}'
            f' <a href="#frag{b}">anchor</a> &amp; entity &#x2014;</p>'
            f"<ul>{items}</ul></div>"
        )
    return "".join(out)


def _render(i: int, n_pages: int, filler_blocks: int = 0) -> str:
    links = []
    for j in range(BRANCH * i + 1, BRANCH * i + BRANCH + 1):
        if j < n_pages:
            links.append(f'<a href="{url_of(j)}">child {j}</a>')
    if i % 7 == 0 and BRANCH * i + 1 < n_pages:
        # near-duplicate link: tracking params the canonicalizer strips
        links.append(
            f'<a href="{url_of(BRANCH * i + 1)}?utm_source=bench&gclid=x{i}">dup</a>'
        )
    if i % 11 == 0:
        links.append('<a href="https://outside.org/nope">out of scope</a>')
    body = [f"<p>page {i} of the bench corpus lorem spark frontier crawl</p>"]
    if i % 10 < 3:
        body.append(f"<p>contact user{i}@{ORG} for details</p>")
    if i % 10 in (3, 4):
        body.append(f"<p>call +30 21{i % 100_000_000:08d} now</p>")
    if filler_blocks:
        body.append(_filler(i, filler_blocks))
    return (
        f"<html><head><title>page {i}</title></head><body>"
        + "".join(links)
        + "".join(body)
        + "</body></html>"
    )


def generate_pages(
    spark: SparkSession, n_pages: int, partitions: int = 32, filler_blocks: int = 0
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas HTML render.

    ``filler_blocks`` ≈ 0.7 KB of realistic markup each (0 = minimal
    bench pages; ~40 ≈ a 30 KB Common-Crawl-like page).
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from breakchecker_spark.functions import htmlx

        for pdf in batches:
            ids = pdf["id"].tolist()
            htmls = [_render(i, n_pages, filler_blocks) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [url_of(i) for i in ids],
                    "warc_ts": [_TS0 + datetime.timedelta(seconds=i) for i in ids],
                    "html": [h.encode("utf-8") for h in htmls],
                    "text": [htmlx.page_text(h) for h in htmls],
                    "lang": ["en"] * len(ids),
                }
            )

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        # Interleave ids across partitions before rendering: the
        # heap-numbered tree puts every link-rich interior page
        # (i < n/BRANCH, 100 links each) inside the FIRST range
        # partition, so a range layout makes one downstream extraction
        # task carry the whole canonicalize workload (measured: 4.96 s
        # straggler vs 0.7 s siblings, guide §2 skew). A real corpus
        # is not sorted by out-degree; a round-robin deal of the ids
        # (8-byte rows, pre-render, untimed) restores an even file
        # layout. Explicit numPartitions keeps AQE from coalescing it.
        .repartition(partitions)
        .mapInPandas(_gen, schema=schemas.PAGES)
    )


def materialize(
    spark: SparkSession,
    n_pages: int,
    path: str,
    partitions: int = 32,
    filler_blocks: int = 0,
) -> str:
    """Write the pages table to parquet (idempotent cache)."""
    import os

    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_pages(spark, n_pages, partitions, filler_blocks).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def seeds_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(f"h0.{ORG}", "https")], schema=schemas.SEEDS)
