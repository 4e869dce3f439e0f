"""Per-host politeness budget, robots gating, and skew-safe host capping.

North-rule additions — the reference has only a global concurrency cap
(/root/reference/break_checker.py:1329-1335) and no robots handling;
the semantics preserved from the reference are *which* URLs are
eventually seen, not the scheduling. With an unlimited budget these
operators are identity transforms, which is how reference-parity tests
run.

Skew: a mega-host (30%+ of the frontier) would funnel its entire
candidate set through one window partition. The cap therefore runs in
two phases:

1. salted pre-cap — window over ``(host, salt)`` where
   ``salt = pmod(xxhash64(url), n_salts)``; keeps ≤ budget rows per
   salt bucket, so no single task ever sees more than one bucket;
2. exact cap — window over ``host`` on the pre-capped set, which is now
   ≤ n_salts × budget rows per host.

Deferred rows (rank > budget) stay in the frontier for the next round
(carry-over), preserving BFS completeness under any budget.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window, functions as F


def apply_robots(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop candidates whose path starts with a disallowed prefix.

    ``candidates`` needs ``url`` and ``host`` columns; ``robots`` is
    (host, disallow_prefix[, crawl_delay]). Prefix match runs on the
    URL's path component (FIXTURES.md §3).
    """
    if robots is None:
        return candidates
    from ..functions import udfs

    with_path = candidates.withColumn("_path", udfs.url_path(F.col("url")))
    blocked = (
        with_path.join(F.broadcast(robots.select("host", "disallow_prefix")), "host")
        .filter(F.col("_path").startswith(F.col("disallow_prefix")))
        .select("url")
        .distinct()
    )
    return with_path.join(blocked, "url", "left_anti").drop("_path")


def host_budget_split(
    frontier: DataFrame,
    budget: int | None,
    n_salts: int = 16,
    host_budgets: DataFrame | None = None,
) -> Tuple[DataFrame, DataFrame]:
    """(eligible, deferred): at most ``budget`` URLs per host this round.

    Order within a host is (depth, url) — the deterministic analog of
    the reference's sorted enqueue order (break_checker.py:1403, 1416).
    ``budget=None`` means unlimited (reference parity mode).
    ``host_budgets`` (host, budget) overrides the flat budget per host —
    derived from robots crawl_delay (see :func:`crawl_delay_budgets`).
    """
    if budget is None and host_budgets is None:
        return frontier, frontier.limit(0)

    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int")
    )
    if host_budgets is not None:
        salted = salted.join(
            F.broadcast(host_budgets.select("host", F.col("budget").alias("_b"))),
            "host",
            "left",
        ).withColumn(
            "_b",
            F.coalesce(
                F.col("_b"),
                F.lit(budget).cast("int") if budget is not None else F.lit(None),
            ),
        )
    else:
        salted = salted.withColumn("_b", F.lit(budget).cast("int"))
    # null budget (no robots row, no flat default) = unlimited host
    limit = F.coalesce(F.col("_b"), F.lit(2**31 - 1))

    pre = Window.partitionBy("host", "_salt").orderBy("depth", "url")
    salted = salted.withColumn("_pre_rank", F.row_number().over(pre))
    survivors = salted.filter(F.col("_pre_rank") <= limit)
    spilled = salted.filter(F.col("_pre_rank") > limit)

    exact = Window.partitionBy("host").orderBy("depth", "url")
    ranked = survivors.withColumn("_rank", F.row_number().over(exact))
    helper_cols = ("_salt", "_pre_rank", "_rank", "_b")
    eligible = ranked.filter(F.col("_rank") <= limit).drop(*helper_cols)
    deferred_from_exact = ranked.filter(F.col("_rank") > limit).drop(*helper_cols)
    deferred = deferred_from_exact.unionByName(spilled.drop("_salt", "_pre_rank", "_b"))
    return eligible, deferred


def parse_robots_txt(robots_bodies: DataFrame) -> DataFrame:
    """Raw robots.txt bodies → the rules table the robots gate eats.

    Input: (host, body) — one fetched robots.txt per host. Output:
    (host, disallow_prefix, crawl_delay), the schema
    :func:`apply_robots` / :func:`crawl_delay_budgets` consume.

    RFC 9309-lite, deterministic: ``#`` comments stripped; field names
    case-insensitive; consecutive ``User-agent`` lines stack onto one
    group; a ``User-agent`` line after rules starts a new group. Only
    groups naming ``*`` apply (the replay crawler is a generic agent —
    per-agent overrides are out of scope, documented). Empty
    ``Disallow:`` means allow-all and emits nothing. A host whose
    matching groups carry only a crawl-delay emits one row with a null
    prefix (startswith(null) is null → never blocks).

    Arrow-batched mapInPandas: parsing is per-row Python, but it runs
    once per *host*, not per URL — at 10^10 URLs the robots table is
    ~|hosts| rows, and this stage is a rounding error next to the
    fetch join.
    """
    import pandas as pd

    def _parse_one(host: str, body: str) -> list[tuple]:
        groups: list[tuple[list[str], list[str], float | None]] = []
        agents: list[str] = []
        rules: list[str] = []
        delay: float | None = None
        in_rules = False

        def _flush():
            nonlocal agents, rules, delay, in_rules
            if agents:
                groups.append((agents, rules, delay))
            agents, rules, delay, in_rules = [], [], None, False

        for raw_line in (body or "").splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if in_rules:
                    _flush()
                agents.append(value.lower())
            elif field == "disallow":
                in_rules = True
                if value:
                    rules.append(value)
            elif field == "crawl-delay":
                in_rules = True
                try:
                    delay = float(value)
                except ValueError:
                    pass
        _flush()

        out: list[tuple] = []
        host_delay: float | None = None
        prefixes: list[str] = []
        for agents_g, rules_g, delay_g in groups:
            if "*" not in agents_g:
                continue
            prefixes.extend(rules_g)
            if delay_g is not None and host_delay is None:
                host_delay = delay_g
        for p in prefixes:
            out.append((host, p, host_delay))
        if not prefixes and host_delay is not None:
            out.append((host, None, host_delay))
        return out

    def _parse(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for host, body in zip(pdf["host"], pdf["body"]):
                rows.extend(_parse_one(host, body))
            yield pd.DataFrame(
                rows, columns=["host", "disallow_prefix", "crawl_delay"]
            )

    return robots_bodies.select("host", "body").mapInPandas(
        _parse, schema="host string, disallow_prefix string, crawl_delay double"
    )


def crawl_delay_budgets(
    robots: DataFrame, round_seconds: float, max_budget: int = 10_000
) -> DataFrame:
    """(host, budget) from robots crawl_delay (FIXTURES.md §3).

    Model: one crawl round represents ``round_seconds`` of polite
    wall-clock per host, so a host allowing one fetch per
    ``crawl_delay`` seconds gets ``max(1, floor(round_seconds /
    crawl_delay))`` URLs per round. Hosts without a delay row fall back
    to the flat budget in :func:`host_budget_split`.
    """
    return (
        robots.filter(F.col("crawl_delay").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("_delay"))
        .select(
            "host",
            F.least(
                F.greatest(
                    F.floor(F.lit(round_seconds) / F.col("_delay")), F.lit(1)
                ),
                F.lit(max_budget),
            )
            .cast("int")
            .alias("budget"),
        )
    )
