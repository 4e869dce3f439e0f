"""Explicit StructTypes for every table the engine touches.

The reference keeps all of these as implicit in-memory Python shapes
(SURVEY.md §1 table D1-D13); here every one is a typed DataFrame schema
so plans are stable and checkpointable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The web, materialized (BASELINE.json input_hint).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Crawl entry points (reference: live-host map, break_checker.py:376-405).
SEEDS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("scheme", T.StringType(), False),
    ]
)

# BFS frontier (reference: deque[(url, depth)], break_checker.py:1326).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
    ]
)

# URL-seen state (reference: visited/_queued/_seen_keys sets,
# break_checker.py:1222-1226). key_hash = xxhash64(struct_key_str) is
# the membership key; the struct_key string itself is NOT persisted —
# it is derivable from url and would dominate the staged bytes per
# round (measured r2→r3: the biggest non-scaling phase locally).
URL_SEEN = T.StructType(
    [
        T.StructField("key_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# Extracted contacts before dedup (reference D7/D8).
CONTACTS = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'email' | 'phone'
        T.StructField("identifier", T.StringType(), False),
        T.StructField("source_url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# Breach database (replaces HIBP/LeakCheck APIs; FIXTURES.md §4).
BREACH_DB = T.StructType(
    [
        T.StructField("identifier", T.StringType(), False),
        T.StructField("breach", T.StringType(), False),
    ]
)

# Robots gating (north-rule addition; FIXTURES.md §3).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefix", T.StringType(), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

# Per-round crawl metrics (north rule; reference D10).
METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)

# Per-partition commit lineage (north rule: "per-partition lineage +
# metrics checkpoint"): one row per (staged table version, partition
# dir) per atomic commit, with file/row/byte counts — the Iceberg
# manifest-entry-stats analogue. Written driver-side from parquet
# footers (plans/checkpoint.py LINEAGE_ARROW mirrors this); audited
# against live files by CheckpointStore.verify_integrity().
LINEAGE = T.StructType(
    [
        T.StructField("round", T.LongType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("partition", T.StringType(), False),
        T.StructField("files", T.LongType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)
