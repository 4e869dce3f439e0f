"""Breach matching: broadcast hash join replacing per-identifier APIs.

The reference looks up each email against HIBP (6 s pacing) and each
phone against LeakCheck (3/1.2 s window) —
/root/reference/break_checker.py:1458-1563, loops 1777-1792. Here the
breach database is a DataFrame and the lookup is one left join:

* small breach table  → ``broadcast()`` hash join (no shuffle);
* huge breach table   → shuffle hash join with Spark's runtime bloom
  filter (spark.sql.optimizer.runtime.bloomFilter.enabled) pre-killing
  non-matching identifiers.

Not-found identifiers keep an empty breach list, matching the
reference's "not found → []" behavior (bc:1487-1490). Breach-name
order within a group is pinned to sorted (the reference preserves
first-API-response order, which is nondeterministic across runs —
SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def match_breaches(
    contacts: DataFrame,
    breach_db: DataFrame,
    broadcast_db: bool = True,
) -> DataFrame:
    """(kind, identifier, source_url, depth, breaches array<string>).

    ``contacts``: deduped contact rows; ``breach_db``: (identifier,
    breach) with possible duplicate pairs (deduped here, matching the
    reference's order-preserving dedup intent, bc:1548).
    """
    db = breach_db.select("identifier", "breach").distinct()
    if broadcast_db:
        db = F.broadcast(db)
    joined = contacts.join(db, "identifier", "left")
    return (
        joined.groupBy("kind", "identifier", "source_url", "depth")
        .agg(
            F.coalesce(
                F.sort_array(F.collect_set("breach")),
                F.array().cast("array<string>"),
            ).alias("breaches")
        )
    )
