"""PageRank N→4N scaling supplement (edge-traversals/sec metric).

Same controls as scaling_crawl.py (fresh JVM per level, materialized
shared input, interleaved pairs, median of per-pair ratios,
SPARK_GRAFT_APC ActiveProcessorCount pinning) but times the iterative
web-graph operator, evidencing that the round-5 graph additions scale
like the crawl loop: the per-iteration work (edge⋈rank join + two hash
aggregations) is shuffle/CPU-bound and embarrassingly parallel, while
the per-iteration fixed job cost amortizes as the graph grows — the
same shape as the crawl's per-round commit floor.

Metric: edge-traversals/sec = edges × iterations / wall-clock.
Output equality across levels is asserted via an order-insensitive
checksum of the rounded rank vector.

Usage: python scripts/scaling_webgraph.py [n_small] [n_nodes] [n_pairs] [iters]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from breakchecker_spark.session import get_spark
from breakchecker_spark.operators import webgraph

cpus = {cpus}
n_nodes = {n_nodes}
iters = {iters}
extra = {{"spark.driver.memory": "32g",
          "spark.sql.files.maxPartitionBytes": "8m"}}
if os.environ.get("SPARK_GRAFT_APC") == "1":
    extra["spark.driver.extraJavaOptions"] = f"-XX:ActiveProcessorCount={{cpus}}"
    extra["spark.python.worker.reuse"] = "true"
spark = get_spark(app_name=f"scalewg{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 4), extra_conf=extra)

path = os.path.join({repo!r}, ".bench", f"graph_{{n_nodes}}")
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    did = F.col("id")
    (spark.range(n_nodes)
        .select(did.alias("src"), F.explode(F.array(
            (did * 7 + 1) % n_nodes,
            (did * 3 + 2) % n_nodes,
            (did * 5 + 3) % n_nodes)).alias("dst"))
        .write.mode("overwrite").parquet(path))
edges = spark.read.parquet(path)
n_edges = edges.count()  # warms the page cache too

t0 = time.time()
ranks = webgraph.pagerank(edges, iterations=iters)
# order-insensitive checksum over the rounded rank vector: proves the
# two levels computed the identical result, and materializes the loop
chk = ranks.agg(F.sum(F.crc32(F.concat_ws(":", "id",
        F.round(F.col("rank") * n_nodes, 6)))).alias("c")).collect()[0]["c"]
secs = time.time() - t0
print("SCALERESULT " + json.dumps({{
    "cpus": cpus, "n_nodes": n_nodes, "n_edges": n_edges, "iters": iters,
    "checksum": int(chk), "pagerank_seconds": round(secs, 2),
    "edge_traversals_per_sec": round(n_edges * iters / secs, 1),
}}))
"""


def run_level(cpus: int, n_nodes: int, iters: int) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, n_nodes=n_nodes, iters=iters)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        # 240M-edge local[1] legs exceed an hour; default keeps the old
        # bound, SPARK_GRAFT_LEVEL_TIMEOUT raises it for big sweeps
        timeout=int(os.environ.get("SPARK_GRAFT_LEVEL_TIMEOUT", "3600")),
        env=dict(os.environ),
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            return json.loads(line[len("SCALERESULT "):])
    raise RuntimeError(
        f"no result from local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    n_big = n_small * 4

    pairs = []
    for i in range(n_pairs):
        s = run_level(n_small, n_nodes, iters)
        b = run_level(n_big, n_nodes, iters)
        assert s["checksum"] == b["checksum"], "levels diverged"
        pairs.append((s, b))
        print(json.dumps({"pair": i, "small_s": s["pagerank_seconds"],
                          "big_s": b["pagerank_seconds"]}), flush=True)

    eff = statistics.median(
        (b["edge_traversals_per_sec"] / s["edge_traversals_per_sec"]) / 4
        for s, b in pairs
    )
    report = {
        "n": n_small, "4n": n_big, "n_nodes": n_nodes, "iters": iters,
        "pairs": [{"small": s, "big": b} for s, b in pairs],
        "scaling_efficiency_pagerank": round(eff, 3),
    }
    with open(os.path.join(REPO, "BENCH", "scaling_webgraph.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
