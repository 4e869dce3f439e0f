"""Is the crawl's staging phase core-bound or storage-bound?

Writes an identical ~contacts-round-sized parquet delta (rows
pre-materialized in memory, so ONLY the write path is timed) at two
parallelism levels in fresh JVMs, interleaved. If wall time does not
improve with cores, the phase is memory-bus/storage-bound — the
component a single-box scaling measurement cannot parallelize but a
real N→4N cluster (per-node disks) does.

Usage: python scripts/write_bandwidth_probe.py [n_rows] [n_pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from breakchecker_spark.session import get_spark

cpus = {cpus}
n = {n_rows}
spark = get_spark(app_name=f"wprobe{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 4))
# contacts-shaped rows, pre-materialized via cache so the timer sees
# only shuffle+encode+write
df = (spark.range(n)
      .select((F.col("id") % 997).alias("h"),
              F.concat(F.lit("email"), (F.col("id") % 2)).alias("kind"),
              F.concat(F.lit("user"), F.col("id"), F.lit("@example.gr")).alias("identifier"),
              F.concat(F.lit("https://www.example.gr/p"), F.col("id")).alias("source_url"),
              (F.col("id") % 12).cast("int").alias("depth"))
      .cache())
df.count()
out = os.path.join({repo!r}, ".bench", f"wprobe_{{cpus}}")
t0 = time.time()
(df.repartition(F.col("h") % 32)
   .write.mode("overwrite").option("compression", "snappy").parquet(out))
secs = time.time() - t0
size = sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(out) for f in fs)
shutil.rmtree(out, ignore_errors=True)
print("WPROBE " + json.dumps({{"cpus": cpus, "rows": n, "secs": round(secs, 2),
                               "mb": round(size / 1e6, 1)}}))
"""


def run_level(cpus: int, n_rows: int) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, n_rows=n_rows)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("WPROBE "):
            return json.loads(line[len("WPROBE "):])
    raise RuntimeError(f"no result: {out.stdout[-500:]} {out.stderr[-500:]}")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pairs = []
    for i in range(n_pairs):
        s = run_level(2, n_rows)
        b = run_level(8, n_rows)
        pairs.append((s, b))
        print(json.dumps({"pair": i, "local2_s": s["secs"], "local8_s": b["secs"],
                          "mb": s["mb"]}), flush=True)
    med = statistics.median(s["secs"] / b["secs"] / 4 for s, b in pairs)
    print(json.dumps({"write_scaling_efficiency_2to8": round(med, 3),
                      "pairs": pairs}))


if __name__ == "__main__":
    main()
