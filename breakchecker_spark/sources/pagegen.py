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


def _render(i: int, n_pages: int) -> str:
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
    return (
        f"<html><head><title>page {i}</title></head><body>"
        + "".join(links)
        + "".join(body)
        + "</body></html>"
    )


def generate_pages(
    spark: SparkSession, n_pages: int, partitions: int = 32
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas HTML render."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from breakchecker_spark.functions import htmlx

        for pdf in batches:
            ids = pdf["id"].tolist()
            htmls = [_render(i, n_pages) for i in ids]
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
        .mapInPandas(_gen, schema=schemas.PAGES)
    )


def materialize(spark: SparkSession, n_pages: int, path: str, partitions: int = 32) -> str:
    """Write the pages table to parquet (idempotent cache)."""
    import os

    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_pages(spark, n_pages, partitions).write.mode("overwrite").parquet(path)
    return path


def seeds_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(f"h0.{ORG}", "https")], schema=schemas.SEEDS)
