#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1) — NOT the frozen
driver bench.  Times individual declared queries with the noop sink
(min-of-N in one warm JVM), labels jobs, and optionally dumps
``explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python bench_extra.py [--sf /root/testdata/sf1.0] [--n 2]
        [--plans plans/r06 --suffix before] [query ...]

Prints one JSON line: {"sf_dir": ..., "queries": {name: sec}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from breakchecker_spark import queries as Q
from breakchecker_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--n", type=int, default=2, help="executions per query; min is reported")
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    ap.add_argument("--plans", default=None, help="directory to dump explain() text into")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="*", help="subset; default = all registered")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g")},
    )

    names = args.queries or list(Q.QUERIES)
    for nm in names:
        if nm not in Q.QUERIES:
            raise SystemExit(f"unknown query: {nm}")

    if not args.no_warm and os.path.isdir(args.warm_sf):
        for nm in names:
            spark.sparkContext.setJobDescription(f"warm:{nm}")
            Q.QUERIES[nm](spark, args.warm_sf).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)

    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for nm in names:
        best = None
        samples[nm] = []
        for i in range(args.n):
            df = Q.QUERIES[nm](spark, args.sf)
            spark.sparkContext.setJobDescription(f"time:{nm}#{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            samples[nm].append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        times[nm] = round(best, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = Q.QUERIES[nm](spark, args.sf)
            with open(os.path.join(args.plans, f"{nm}_{args.suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        print(f"## {nm}: {times[nm]} {samples[nm]}", file=sys.stderr)

    print(json.dumps({
        "sf_dir": args.sf,
        "n": args.n,
        "queries": times,
        "samples": samples,
        "total": round(sum(times.values()), 2),
    }))


if __name__ == "__main__":
    main()
