#!/usr/bin/env python
"""Interleaved same-JVM A/B of the small-corpus jaccard count-join
(guide §1.3): current plan (post-agg broadcast n-attach) vs v2
(n carried through the join + exact length-bound prune before the pair
aggregation: J >= t requires t*max(n_a,n_b) <= min(n_a,n_b), so the
prune drops only pairs the final jaccard filter would drop anyway).

Also asserts the two plans return IDENTICAL rows first.

Usage: python scripts/jaccard_ab.py [--sf /root/sfbig] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from breakchecker_spark.operators import dedup
from breakchecker_spark.session import get_spark


def plan_v1(df, threshold=0.5):
    return dedup.jaccard_pairs(df, "doc_id", "text", threshold=threshold)


def plan_v2(df, threshold=0.5, k=3):
    sh = df.select(
        F.col("doc_id").alias("id"), dedup.shingles(F.col("text"), k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("id", "n_sh", F.explode("sh").alias("shingle"))
    aa = ex.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle"
    ).hint("SHUFFLE_HASH")
    bb = ex.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
    ).hint("SHUFFLE_HASH")
    t = F.lit(threshold)
    counted = (
        aa.join(
            bb,
            (aa["shingle"] == bb["shingle"])
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") * t <= F.col("n_b"))
            & (F.col("n_b") * t <= F.col("n_a")),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return counted.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/sfbig")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="jaccard_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g")},
    )
    df = spark.read.parquet(os.path.join(args.sf, "documents.parquet"))

    if not args.skip_equality:
        a = {tuple(r) for r in plan_v1(df).collect()}
        b = {tuple(r) for r in plan_v2(df).collect()}
        assert a == b, f"plans disagree: {len(a)} vs {len(b)} rows"
        print(f"EQUAL: {len(a)} pairs", file=sys.stderr)

    def timed(fn):
        d = fn(df)
        t0 = time.time()
        d.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # warm both
    timed(plan_v1); timed(plan_v2)
    v1, v2 = [], []
    for i in range(args.rounds):
        v1.append(timed(plan_v1))
        print(f"v1[{i}]: {v1[-1]}", file=sys.stderr)
        v2.append(timed(plan_v2))
        print(f"v2[{i}]: {v2[-1]}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "v1": v1, "v2": v2,
                      "v1_min": min(v1), "v2_min": min(v2)}))


if __name__ == "__main__":
    main()
