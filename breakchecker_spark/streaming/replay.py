"""Structured Streaming replay of the pages table (SURVEY.md §2.9 stretch).

The batch BFS loop is the primary engine (the crawl is a terminating
computation); this module covers the streaming-shaped workloads a
production deployment runs alongside it:

* ``stream_extract_contacts`` — an unbounded extraction pipeline:
  ``readStream`` over the pages table (file source, one warc_ts batch
  at a time), the same vectorized extraction as the batch path,
  ``writeStream.foreachBatch`` into an append sink. Exactly-once via
  checkpointLocation; ``Trigger.AvailableNow`` drains a static corpus
  and is how tests assert stream ≡ batch.
* ``windowed_contact_counts`` — tumbling-window counts with a
  watermark for late pages (event time = warc_ts).

No custom stateful operator is needed for reference parity —
``applyInPandasWithState`` would slot in here if per-host crawl-rate
tracking ever needs true streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..operators import extract


def stream_pages(spark: SparkSession, pages_path: str, per_trigger_files: int = 4):
    """File-source stream over a parquet pages directory."""
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", per_trigger_files)
        .parquet(pages_path)
    )


def stream_extract_contacts(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    checkpoint: str,
    scope_host: str,
    default_region: str | None,
    org_domain: str,
    available_now: bool = True,
):
    """Continuously extract contacts from arriving pages.

    Returns the StreamingQuery; callers ``awaitTermination()``. Each
    micro-batch runs the identical extraction operators as the batch
    engine — parity by construction.
    """
    stream = stream_pages(spark, pages_path).withColumn("depth", F.lit(0))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _, contacts, _, caches = extract.process_pages(
            batch_df.select("url", "depth", "html", "text"),
            scope_host,
            default_region,
            org_domain,
        )
        contacts.write.mode("append").parquet(out_path)
        for df in caches:
            df.unpersist()

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_contact_counts(
    pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window page counts by language with late-data watermark.

    Streaming aggregation shape (event time = warc_ts); pair with
    ``writeStream.outputMode("append")`` so only closed windows emit.
    """
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"),
            "lang", "n_pages",
        )
    )
