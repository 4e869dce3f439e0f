#!/usr/bin/env python
"""Interleaved same-JVM A/B of crawl-loop variants (guide §1.3): runs
the bench crawl (100k pages, pre-extract) alternating config variants
A,B,A,B,... in ONE warm JVM so weather hits both arms equally.

Usage: python scripts/crawl_ab.py [--pages 100000] [--rounds 3]
           [--knob probe_min_candidates --a 50000 --b 0]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
from breakchecker_spark.session import get_spark
from breakchecker_spark.sources import pagegen


def one_crawl(spark, n_pages: int, tmp_root: str, **cfg_over) -> float:
    stamp = hashlib.sha1(open(pagegen.__file__, "rb").read()).hexdigest()[:12]
    pages_path = os.path.join(tmp_root, f"pages_{n_pages}_{stamp}")
    if not os.path.isdir(pages_path):
        pagegen.materialize(spark, n_pages, pages_path)
    pages = spark.read.parquet(pages_path)
    seeds = pagegen.seeds_df(spark)
    ckpt = os.path.join(tmp_root, f"ckpt_ab_{time.time_ns()}")
    cfg = CrawlConfig(
        scope_host=pagegen.ORG,
        max_depth=12,
        use_bloom=True,
        bloom_parts=32,
        bloom_expected_per_part=max(n_pages // 16, 1000),
        checkpoint_dir=ckpt,
        run_id="bench",
        pre_extract=True,
        **cfg_over,
    )
    t0 = time.time()
    res = run_crawl(spark, seeds, pages, cfg)
    res.contacts.count()
    secs = time.time() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return round(secs, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--knob", default="probe_min_candidates")
    ap.add_argument("--a", type=int, default=50_000)
    ap.add_argument("--b", type=int, default=0)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_BENCH_TMP",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench"),
    )
    spark = get_spark(
        app_name="crawl_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g")},
    )
    # warm both arms
    one_crawl(spark, 1000, tmp_root, **{args.knob: args.a})
    one_crawl(spark, 1000, tmp_root, **{args.knob: args.b})

    a_times, b_times = [], []
    for i in range(args.rounds):
        a_times.append(one_crawl(spark, args.pages, tmp_root, **{args.knob: args.a}))
        print(f"A[{i}] ({args.knob}={args.a}): {a_times[-1]}", file=sys.stderr)
        b_times.append(one_crawl(spark, args.pages, tmp_root, **{args.knob: args.b}))
        print(f"B[{i}] ({args.knob}={args.b}): {b_times[-1]}", file=sys.stderr)
    print(json.dumps({
        "knob": args.knob, "a": args.a, "b": args.b, "pages": args.pages,
        "a_times": a_times, "b_times": b_times,
        "a_min": min(a_times), "b_min": min(b_times),
    }))


if __name__ == "__main__":
    main()
