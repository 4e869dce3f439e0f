"""The BFS crawl loop vs a DuckDB WITH RECURSIVE oracle (r3 verdict #1).

`crawl_frontier_bfs` runs the REAL run_crawl loop over a link graph
derived from the documents parquet; DuckDB recomputes the reachable
set and min-depth attribution with a recursive CTE. Byte-equality here
is the same check the driver's correctness gate performs.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from breakchecker_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_bfs_crawl_matches_recursive_oracle(spark):
    df = q.QUERIES["crawl_frontier_bfs"](spark, SF_DIR)
    got = [(r["url"], r["depth"]) for r in df.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(q.ORACLES["crawl_frontier_bfs"]).fetchall()

    assert got == want
    # sanity: the depth gate actually bit (graph deeper than max_depth)
    assert max(d for _, d in got) == q._BFS_DEPTH
    assert len(got) > 1


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_bfs_budget_crawl_matches_round_simulation_oracle(spark):
    """run_crawl with per-host budgets + robots vs the DuckDB oracle
    that simulates the rounds literally (r4 verdict item #4): robots
    drop at dequeue, per-host (depth, url)-ordered top-k, deferred
    carry-over pinning discovery depth, enqueue anti-joins."""
    df = q.QUERIES["crawl_frontier_bfs_budget"](spark, SF_DIR)
    got = [(r["url"], r["depth"]) for r in df.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(q.ORACLES["crawl_frontier_bfs_budget"]).fetchall()

    assert got == want
    assert len(got) > 1
    # robots actually bit: no host-a URL whose id starts with '1'
    assert not any(
        u.startswith("https://a.docs.example/p1") for u, _ in got
    )
    # both hosts crawled
    hosts = {u.split("/")[2] for u, _ in got}
    assert hosts == {"a.docs.example", "b.docs.example"}
