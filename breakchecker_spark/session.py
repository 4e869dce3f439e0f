"""SparkSession factory tuned for the crawl/extract workload.

Local-mode defaults match the sandbox (local[32], single JVM); the same
builder is what a ``spark-submit --py-files`` deployment would use on a
real cluster — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "breakchecker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with AQE + Arrow enabled.

    * AQE handles runtime partition coalescing and skew-join splitting
      (mega-host skew in the frontier).
    * Arrow powers the pandas-UDF extraction hot path.
    * shuffle partitions default to the core count — at cluster scale
      this is set to ~2-3× total cores by the submitter.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]") if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(int(n), 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound Arrow batch size by ROWS so wide binary columns (30 KB+
        # page payloads) keep per-task in-flight memory ~tens of MB;
        # the 10k default puts ~300 MB per task in flight on real pages
        # and inverts core scaling via GC pressure.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )  # runtime row-level join prefilter
        # ZGC: 30 KB page payloads churn the heap; G1 burned ~3x the
        # CPU in GC at 32 concurrent tasks (measured 1200 -> 2235
        # pages/s switching to ZGC on the heavy-corpus extraction).
        .config(
            "spark.driver.extraJavaOptions",
            (extra_conf or {}).pop("spark.driver.extraJavaOptions", "-XX:+UseZGC"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
