#!/usr/bin/env python
"""Phase-profile the bench crawl replay (guide §1): mirrors
bench.py:run_crawl_bench exactly (same pagegen corpus, same CrawlConfig)
with SPARK_GRAFT_DEBUG_TIMING honored, min-of-N, and per-run phase
timings on stderr.  NOT part of the frozen bench.

Usage: python scripts/crawl_profile.py [--pages 100000] [--n 2]
           [--classic] [--warm-pages 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
from breakchecker_spark.session import get_spark
from breakchecker_spark.sources import pagegen


def one_crawl(spark, n_pages: int, tmp_root: str, pre_extract: bool) -> dict:
    import hashlib

    stamp = hashlib.sha1(open(pagegen.__file__, "rb").read()).hexdigest()[:12]
    pages_path = os.path.join(tmp_root, f"pages_{n_pages}_{stamp}")
    if not os.path.isdir(pages_path):
        pagegen.materialize(spark, n_pages, pages_path)
    pages = spark.read.parquet(pages_path)
    seeds = pagegen.seeds_df(spark)
    ckpt = os.path.join(tmp_root, f"ckpt_{n_pages}_{time.time_ns()}")
    cfg = CrawlConfig(
        scope_host=pagegen.ORG,
        max_depth=12,
        use_bloom=True,
        bloom_parts=32,
        bloom_expected_per_part=max(n_pages // 16, 1000),
        checkpoint_dir=ckpt,
        run_id="bench",
        pre_extract=pre_extract,
    )
    t0 = time.time()
    res = run_crawl(spark, seeds, pages, cfg)
    n_visited = res.summary["num_endpoints"]
    t_cnt = time.time()
    n_ids = res.contacts.count()
    print(f"TIMING contacts.count: {time.time() - t_cnt:.2f}s", file=sys.stderr)
    secs = time.time() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "crawl_seconds": round(secs, 2),
        "visited": n_visited,
        "identifiers": n_ids,
        "rounds": res.rounds,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--warm-pages", type=int, default=1000)
    ap.add_argument("--classic", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_BENCH_TMP",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench"),
    )
    extra = {"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g")}
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.dir"] = ev_dir
    spark = get_spark(
        app_name="crawl_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf=extra,
    )
    pre = not args.classic
    # warmup (same as bench.py)
    one_crawl(spark, max(args.warm_pages, 200), tmp_root, pre_extract=pre)
    runs = []
    for i in range(args.n):
        print(f"=== run {i} ===", file=sys.stderr)
        r = one_crawl(spark, args.pages, tmp_root, pre_extract=pre)
        print(f"=== run {i}: {r}", file=sys.stderr)
        runs.append(r)
    print(json.dumps({"pages": args.pages, "pre_extract": pre, "runs": runs,
                      "best": min(r["crawl_seconds"] for r in runs)}))


if __name__ == "__main__":
    main()
