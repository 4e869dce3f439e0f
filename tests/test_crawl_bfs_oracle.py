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
