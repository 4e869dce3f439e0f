"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``breakchecker_spark`` (see SURVEY.md §2 for
the operator inventory this covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from breakchecker_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the crawl engine end-to-end — the iterative BFS
    frontier loop (bloom-prefiltered seen membership, struct-key
    dedup, depth gate) over a link graph derived from the sf0.001
    documents table; hash-gated against a DuckDB WITH RECURSIVE
    oracle in the correctness run."""
    sf_dir = "/root/testdata/sf0.001"
    return _q.crawl_frontier_bfs(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
