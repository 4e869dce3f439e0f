"""Custom stateful streaming operator: per-host crawl-rate tracking.

Demonstrates the ``applyInPandasWithState`` path (the task's designated
mechanism for custom stateful operators): as pages stream in, the
operator keeps per-host running state — total pages, total bytes, and
the last-seen warc_ts — and emits one updated row per host per
micro-batch. A production politeness controller would feed these rates
back into the per-host budget table.

State schema: (n_pages long, n_bytes long, last_ts timestamp).
Output: (host, n_pages, n_bytes, last_seen) — update semantics.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..functions import udfs

STATE_SCHEMA = "n_pages long, n_bytes long, last_ts timestamp"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("n_pages", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("last_seen", T.TimestampType(), True),
    ]
)


def _track(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_pages, n_bytes, last_ts = (
        state.get if state.exists else (0, 0, None)
    )
    for pdf in pdfs:
        n_pages += len(pdf)
        n_bytes += int(pdf["n_bytes"].sum())
        batch_max = pdf["warc_ts"].max()
        if last_ts is None or (batch_max is not None and batch_max > last_ts):
            last_ts = batch_max
    state.update((int(n_pages), int(n_bytes), last_ts))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "n_pages": [n_pages],
            "n_bytes": [n_bytes],
            "last_seen": [last_ts],
        }
    )


def host_rate_tracker(pages_stream: DataFrame) -> DataFrame:
    """Streaming per-host totals via applyInPandasWithState.

    Input: a pages stream (url, warc_ts, html, ...). Output mode must
    be ``update``; each micro-batch emits the refreshed totals for the
    hosts it touched, with state carried across batches.
    """
    keyed = pages_stream.select(
        udfs.url_host(F.col("url")).alias("host"),
        F.col("warc_ts"),
        F.length("html").cast("long").alias("n_bytes"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
