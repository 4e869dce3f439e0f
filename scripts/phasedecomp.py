"""Per-phase crawl decomposition at one parallelism level.

Runs one 50k-page crawl replay with SPARK_GRAFT_DEBUG_TIMING=1 in a
child JVM, parses the TIMING lines, and prints phase sums — the tool
behind the scaling-residual analysis in BENCH/BASELINE.md (which phase
stops scaling between local[N] and local[4N]).

Usage: python scripts/phasedecomp.py <cpus> [n_pages] [filler] [pre_extract 0/1]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from breakchecker_spark.session import get_spark
from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
from breakchecker_spark.sources import pagegen

cpus = {cpus}
n_pages = {n_pages}
spark = get_spark(app_name=f"decomp{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 4),
                  extra_conf={{"spark.driver.memory": "32g",
                               "spark.sql.files.maxPartitionBytes": "8m"}})
pages_path = os.path.join({repo!r}, ".bench", f"pages_{{n_pages}}_f{filler}")
pagegen.materialize(spark, n_pages, pages_path, filler_blocks={filler})
pages = spark.read.parquet(pages_path)
pages.select(F.sum(F.length("html")), F.sum(F.length("text"))).collect()
seeds = pagegen.seeds_df(spark)
ckpt = tempfile.mkdtemp(prefix="decomp_ckpt_")
cfg = CrawlConfig(scope_host=pagegen.ORG, max_depth=12, use_bloom=True,
                  bloom_parts=32, bloom_expected_per_part=max(n_pages // 16, 1000),
                  checkpoint_dir=ckpt, run_id=f"decomp{{cpus}}",
                  pre_extract={pre_extract})
t0 = time.time()
res = run_crawl(spark, seeds, pages, cfg)
visited = res.summary["num_endpoints"]
secs = time.time() - t0
shutil.rmtree(ckpt, ignore_errors=True)
print("DECOMPRESULT " + json.dumps({{"cpus": cpus, "secs": round(secs, 1),
                                     "visited": visited}}))
"""


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    filler = int(sys.argv[3]) if len(sys.argv) > 3 else 160
    pre_extract = (sys.argv[4] != "0") if len(sys.argv) > 4 else True
    env = dict(os.environ, SPARK_GRAFT_DEBUG_TIMING="1")
    code = _CHILD.format(
        repo=REPO, cpus=cpus, n_pages=n_pages, filler=filler,
        pre_extract=pre_extract,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, env=env,
    )
    result = None
    for line in out.stdout.splitlines():
        if line.startswith("DECOMPRESULT "):
            result = json.loads(line[len("DECOMPRESULT "):])
    phases: dict[str, float] = {}
    for m in re.finditer(r"TIMING (?:r\d+ )?(.+?): ([0-9.]+)s", out.stderr):
        phases[m.group(1)] = round(phases.get(m.group(1), 0.0) + float(m.group(2)), 1)
    print(json.dumps({"cpus": cpus, "pre_extract": pre_extract,
                      "result": result, "phase_sums": phases}))
    if result is None:
        sys.exit(out.stderr[-2000:] or "no result")


if __name__ == "__main__":
    main()
