"""The crawl engine: level-synchronous BFS frontier loop over a pages table.

Reimplements the reference's async BFS crawler
(/root/reference/break_checker.py:1319-1421) as iterative DataFrame
rounds. Each round:

1. **dequeue** — the reference re-checks the seen set at dequeue time
   (bc:1338-1346) to close its async enqueue/visit race; this loop is
   level-synchronous and enforces the same set semantics at ENQUEUE
   (step 5), which makes ``frontier ∩ url_seen = ∅`` an invariant —
   the dequeue re-check is provably the identity and is skipped
   (see the step-1 comment in run_crawl for the induction);
2. **robots gate + politeness budget** — north-rule additions; eligible
   rows are capped per host (skew-safe two-phase window), deferred rows
   carry over at the same depth;
3. **visit** — eligible rows join the seen set (the reference adds to
   ``visited`` *before* fetching, bc:1344-1346 — misses still count);
4. **fetch = join** — the frontier joins the pages table on URL
   (replacing live HTTP, bc:742-839);
5. **extract + expand** — vectorized extraction produces contacts and
   canonical link candidates at depth+1 (enqueue-time checks: depth
   gate, within-round struct-key dedup pinned to min (depth, url),
   anti-join vs seen and vs queued — bc:1397-1421);
6. **commit** — frontier / url_seen / contacts / metrics checkpoint
   atomically; a killed run resumes from the last commit. Reading state
   back from the checkpoint also truncates plan lineage, keeping
   per-round shuffle count flat as depth grows.

Determinism pins (SURVEY.md §7): all seeds start at depth 0 together;
within a round, candidate dedup order is (depth, url); the reference's
completion-order races are replaced by these total orders, so the
URL-seen *set* per depth matches the reference exactly.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import contacts as contacts_fn
from ..functions import udfs
from ..operators import extract, politeness, seen
from .checkpoint import CheckpointStore

_DEBUG_TIMING = os.environ.get("SPARK_GRAFT_DEBUG_TIMING", "") == "1"

# metrics deltas are written driver-side with pyarrow (no Spark job);
# types mirror plans.crawl's metrics schema exactly
import pyarrow as _pa

_METRICS_ARROW = _pa.schema(
    [
        ("run_id", _pa.string()),
        ("round", _pa.int32()),
        ("metric", _pa.string()),
        ("value", _pa.int64()),
    ]
)


def _tlog(label: str, t0: float) -> float:
    """Per-phase stderr timing, enabled by SPARK_GRAFT_DEBUG_TIMING=1."""
    now = time.time()
    if _DEBUG_TIMING:
        print(f"TIMING {label}: {now - t0:.2f}s", file=sys.stderr)
    return now


@dataclass
class CrawlConfig:
    scope_host: str
    max_depth: int = 3
    host_budget: Optional[int] = None  # None = unlimited (reference parity)
    # when set (and robots carries crawl_delay), each round models this
    # many seconds of polite per-host wall clock: budget_host =
    # floor(round_seconds / crawl_delay) — politeness.crawl_delay_budgets
    round_seconds: Optional[float] = None
    use_bloom: bool = True
    bloom_parts: int = 32
    bloom_expected_per_part: int = 100_000
    # url_seen bucket count: deltas are written directory-partitioned
    # by pmod(key_hash, seen_buckets); the exact membership check never
    # shuffles the seen side (operators/seen.py). 0 disables the
    # bucketed layout.
    seen_buckets: int = 32
    # collect survivors' bucket list and push an explicit bucket IN
    # partition filter into the seen scan (one extra driver action per
    # round; worth it when the seen scan dominates — huge seen table,
    # narrow rounds)
    prune_seen_buckets: bool = False
    # exact-membership strategy: "broadcast" = shuffle-free two-step
    # broadcast confirm (the 10^10-key path); "anti" = plain anti-join
    # (AQE broadcasts the seen side while it is small)
    seen_join: str = "broadcast"
    # broadcast-safety guard: fall back to "anti" for a round whose
    # bloom-surviving candidates exceed this (None disables)
    seen_broadcast_max_rows: Optional[int] = 4_000_000
    # skip the bloom-probe cogroup stage when the round's driver-known
    # candidate bound is at or below this (seen.filter_new
    # probe_min_candidates); 0 = always probe
    probe_min_candidates: int = 50_000
    # compact append tables (url_seen/contacts/metrics) every this many
    # rounds once they hold that many delta versions — the Iceberg
    # rewrite_data_files maintenance analogue. 0 disables.
    compact_every: int = 16
    # Replay-scale mode: run ONE extraction pass over the whole pages
    # table up front (extract.preextract_pages) and join each round's
    # frontier against the slim per-page (links, contacts, drops) table
    # instead of re-scanning + re-extracting raw pages every round.
    # Results are identical (tests/test_crawl_e2e.py equality matrix);
    # the classic mode models live fetching, where pages at depth d+1
    # don't exist until round d ran. At Common-Crawl replay scale the
    # per-round full-corpus rescan is the dominant non-scaling cost —
    # pre-extraction pays it once, embarrassingly parallel.
    pre_extract: bool = False
    checkpoint_dir: Optional[str] = None
    # on resume, audit every live table version's parquet footers
    # against the committed per-partition lineage before trusting the
    # checkpoint (CheckpointStore.verify_integrity); raises on mismatch
    verify_checkpoint: bool = False
    run_id: str = "run0"
    max_rounds: int = 1000
    default_region: Optional[str] = None  # derived from scope TLD when None
    org_domain: Optional[str] = None  # derived from scope host when None

    def __post_init__(self) -> None:
        if self.default_region is None:
            self.default_region = contacts_fn.region_for_domain(self.scope_host)
        if self.org_domain is None:
            self.org_domain = contacts_fn.registered_domain(self.scope_host)


@dataclass
class CrawlResult:
    url_seen: DataFrame
    contacts: DataFrame  # deduped (kind, identifier, source_url, depth)
    metrics: DataFrame  # (run_id, round, metric, value)
    rounds: int
    summary: dict = field(default_factory=dict)
    # per-partition commit lineage (round, table, version, partition,
    # files, rows, bytes) — populated only for checkpointed runs
    lineage: Optional[DataFrame] = None


def _fetch_key(url_col):
    """Join key against the pages table: bare-host URLs get a root slash.

    The reference's live fetch treats ``https://h`` and ``https://h/``
    identically (HTTP GET of "/"); the pages table stores the canonical
    slashed form, so only the frontier side needs normalizing.
    """
    return F.when(url_col.rlike("^https?://[^/]+$"), F.concat(url_col, F.lit("/"))).otherwise(
        url_col
    )


def _dedup_frontier(frontier: DataFrame) -> DataFrame:
    """One representative URL per struct key, pinned to min (depth, url).

    A single groupBy subsumes the reference's URL-level ``_queued``
    guard (bc:1417-1420): identical URLs share a struct key, so the
    min-(depth, url) pick keeps exactly one row — one shuffle, not two.
    """
    best = frontier.groupBy("struct_key").agg(
        F.min_by(
            F.struct("url", "depth", "host", "key_hash"), F.struct("depth", "url")
        ).alias("b")
    )
    return best.select(
        F.col("b.url").alias("url"),
        F.col("b.depth").alias("depth"),
        F.col("b.host").alias("host"),
        "struct_key",
        F.col("b.key_hash").alias("key_hash"),
    )


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """(host, scheme) → depth-0 frontier rows ``scheme://host``.

    Seed URLs are intentionally *not* canonicalized — the reference
    enqueues them raw (bc:1326, 1760).
    """
    f = seeds.select(
        F.concat(F.col("scheme"), F.lit("://"), F.lower(F.col("host"))).alias("url"),
        F.lit(0).alias("depth"),
        F.lower(F.col("host")).alias("host"),
    )
    return seen.with_struct_key(f)


def run_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame | None,
    config: CrawlConfig,
    robots: DataFrame | None = None,
    dead_hosts: DataFrame | None = None,
    resume: bool = False,
    fetcher: "Callable[[DataFrame], DataFrame] | None" = None,
) -> CrawlResult:
    """Run (or resume) the BFS crawl; returns final state DataFrames.

    ``dead_hosts`` (host string) models the reference's two-strikes
    dead-host set (break_checker.py:566-568, 803-806): frontier rows on
    those hosts are skipped before the fetch join (broadcast anti-join)
    — in replay, fetch failures only exist if the caller supplies them.

    ``fetcher`` switches the engine to LIVE mode: instead of joining
    the frontier against a pages table, each round's eligible rows
    (url, host, depth) are handed to the callable — normally
    ``sources.fetcher.fetch_pages`` — which returns FETCH_SCHEMA rows.
    Fetch failures behave exactly like replay join misses (visited but
    yielding nothing), and refused hosts accumulate into the dead-host
    anti-join with the reference's two-strikes rule. Live mode requires
    the classic round structure (``pre_extract=False``): pages at
    depth d+1 cannot be pre-extracted before round d discovers them.
    Dead-host strike counts are per-run in-memory state, like the
    reference's globals — a resumed run starts its counts fresh.
    """
    if fetcher is not None and config.pre_extract:
        raise ValueError(
            "live fetch requires classic mode (pre_extract=False): "
            "pages at depth d+1 don't exist until round d fetched them"
        )
    if fetcher is None and pages is None:
        raise ValueError("either a pages table or a fetcher is required")
    store = CheckpointStore(config.checkpoint_dir) if config.checkpoint_dir else None

    seen_schema = "key_hash long, url string, depth int"
    if config.seen_buckets:
        seen_schema += ", bucket int"
    empty_seen = spark.createDataFrame([], seen_schema)
    empty_contacts = spark.createDataFrame(
        [], "kind string, identifier string, source_url string, depth int"
    )
    empty_metrics = spark.createDataFrame(
        [], "run_id string, round int, metric string, value long"
    )

    start_round = 0
    bloom_table = None
    if resume and store is not None and store.manifest() is not None:
        if config.verify_checkpoint:
            problems = store.verify_integrity()
            if problems:
                raise RuntimeError(
                    "checkpoint integrity check failed — live data files "
                    f"disagree with committed lineage: {problems[:5]}"
                    + (f" (+{len(problems) - 5} more)" if len(problems) > 5 else "")
                )
        start_round = store.last_round() + 1
        frontier = store.read(spark, "frontier")
        url_seen = store.read(spark, "url_seen")
        ckpt_buckets = store.manifest().get("seen_buckets", 0)
        want_buckets = config.seen_buckets or 0
        if url_seen is not None and ckpt_buckets != want_buckets:
            # Checkpoint written under a different bucket modulus (or a
            # legacy manifest without the field): on-disk bucket values
            # no longer equal pmod(key_hash, N), so the (bucket,
            # key_hash) membership semi-join would silently miss seen
            # keys and re-crawl them. Re-derive the column and stage a
            # one-time rewrite, published atomically with this round's
            # commit (a kill before that leaves the old state intact).
            if "bucket" in url_seen.columns:
                url_seen = url_seen.drop("bucket")
            if want_buckets:
                url_seen = url_seen.withColumn(
                    "bucket",
                    F.pmod(F.col("key_hash"), F.lit(want_buckets)).cast("int"),
                )
            rb_path = store.stage_rewrite(
                "url_seen",
                url_seen,
                f"{start_round}rb",
                partition_by=(
                    "bucket"
                    if want_buckets and config.prune_seen_buckets
                    else None
                ),
            )
            import glob as _glob

            if _glob.glob(
                os.path.join(rb_path, "**", "*.parquet"), recursive=True
            ):
                url_seen = spark.read.parquet(rb_path)
        all_contacts = store.read(spark, "contacts")
        metrics = store.read(spark, "metrics")
        bloom_table = store.read(spark, "bloom") if config.use_bloom else None
        if config.use_bloom and bloom_table is None and url_seen is not None:
            # (bloom keys are key_hash only — bucketing changes above
            # don't invalidate a committed filter)
            # Checkpoint was written with use_bloom=False. The round loop
            # ORs per-round deltas into the running filter, so a None
            # start would make round-1's delta-only bloom masquerade as
            # covering the whole resumed url_seen — bloom-negative rows
            # would skip the exact anti-join and re-crawl seen URLs.
            # Rebuild once from the full seen set before entering the loop.
            bloom_table = seen.build_bloom(
                url_seen, config.bloom_parts, config.bloom_expected_per_part
            ).localCheckpoint(eager=True)
    else:
        if store is not None and store.manifest() is not None:
            # fresh run over a dirty checkpoint dir: drop the old state,
            # or the append-table manifest would leak prior-run versions
            store.reset()
        frontier = _dedup_frontier(seeds_to_frontier(seeds))
        url_seen = empty_seen
        all_contacts = empty_contacts
        metrics = empty_metrics

    # url_seen physical layout: bucket DIRECTORIES exist to serve the
    # opt-in scan pruning (prune_seen_buckets); without it they cost
    # one file per bucket per round for nothing — the bucket membership
    # column itself is staged either way (r6, guide §6 file sizing).
    _seen_layout = (
        "bucket" if config.seen_buckets and config.prune_seen_buckets else None
    )
    host_budgets = None
    if robots is not None and config.round_seconds is not None:
        host_budgets = politeness.crawl_delay_budgets(robots, config.round_seconds)

    pages_slim = (
        pages.select("url", "html", "text") if pages is not None else None
    )
    # live-mode dead-host feedback: per-host refused strike counts
    # (reference _DEAD_HOST_FAILS/_DEAD_HOSTS, bc:564-568)
    _dead_fails: dict = {}
    _dead_set: set = set()
    pre = None
    if config.pre_extract:
        # one extraction pass, persisted for the whole run (the rounds
        # consume slim rows only; deterministic, so resume recomputes
        # it rather than checkpointing raw-page-derived state).
        # Materialized eagerly: the pass is the run's biggest single
        # job and this keeps it out of round-0's phase accounting.
        t_pre = time.time()
        pre = extract.preextract_pages(
            pages_slim, config.scope_host, config.default_region, config.org_domain
        ).withColumnRenamed("url", "_fk").persist()
        pre.count()
        _tlog("pre-extract pass", t_pre)
    rounds_run = start_round
    frontier_rows = -1  # unknown → check lazily
    if resume and store is not None and store.manifest() is not None:
        frontier_rows = store.manifest().get("frontier_rows", -1)

    for round_no in range(start_round, config.max_rounds):
        if frontier_rows == 0 or (frontier_rows < 0 and frontier.isEmpty()):
            break
        rounds_run = round_no + 1
        t0 = time.time()

        round_caches: list = []
        # 1. dequeue-time seen re-check — structurally a NO-OP in this
        # engine, so it is skipped (r6, guide §2.1 "remove the shuffle
        # outright"). The reference re-checks at dequeue
        # (bc:1338-1346) because its async queue can hold entries
        # enqueued before their key was marked seen; this loop is
        # level-synchronous and every frontier is built by
        # _build_frontier_next, which anti-joins candidates against
        # ``url_seen_next`` — exactly the url_seen the same commit
        # publishes — and carries politeness-deferred rows whose keys
        # are disjoint from that round's ``new_seen`` (eligible and
        # deferred partition the frontier, and only eligible rows are
        # marked seen). Hence ``frontier ∩ url_seen = ∅`` holds
        # inductively for every mode (replay / classic / live, with or
        # without budgets, fresh or resumed — frontier and url_seen
        # are committed atomically by the same manifest), and the
        # per-round filter_new probe + broadcast confirm + re-dedup
        # recomputed an identity. Seeds are deduped at entry
        # (seeds_to_frontier → _dedup_frontier) and filter_new only
        # ever removes rows, so the frontier is also struct_key-unique
        # by construction — no re-dedup needed either. Verified by the
        # crawl e2e equality matrix and the round-simulating DuckDB
        # oracles (crawl_frontier_bfs / _preextract / _budget).
        live = frontier

        # 2. robots gate (dropped, not deferred) + per-host budget
        live = politeness.apply_robots(live, robots)
        eligible, deferred = politeness.host_budget_split(
            live, config.host_budget, host_budgets=host_budgets
        )
        eligible = eligible.cache()

        # 3. mark visited BEFORE the fetch join (bc:1344-1346).
        # struct_key is intentionally not persisted: key_hash carries
        # membership, url/depth carry reporting — the string key would
        # double the staged bytes per round for nothing.
        new_seen = eligible.select("key_hash", "url", "depth")
        if config.seen_buckets:
            new_seen = new_seen.withColumn(
                "bucket",
                F.pmod(F.col("key_hash"), F.lit(config.seen_buckets)).cast("int"),
            )
        url_seen_next = url_seen.unionByName(new_seen)

        # 4. fetch = left join against the pages table. Dead hosts are
        # suppressed at the fetch, not the frontier — the reference
        # marks the URL visited and then fails the fetch (bc:1344-1346,
        # 766-768), so dead-host URLs count as endpoints but yield
        # nothing and expand nothing.
        fetch_input = eligible
        if dead_hosts is not None:
            fetch_input = fetch_input.join(
                F.broadcast(dead_hosts.select("host")), "host", "left_anti"
            )
        keyed_input = fetch_input.withColumn("_fk", _fetch_key(F.col("url")))
        if pre is None:
            if fetcher is not None:
                # LIVE fetch: host-partitioned distributed HTTP GET of
                # this round's eligible rows (sources/fetcher.py).
                # Cached — the strike-count action below materializes
                # it once; extraction then reads the cache instead of
                # re-hitting the network.
                fetched_full = fetcher(
                    fetch_input.select("url", "host", "depth")
                ).cache()
                round_caches.append(fetched_full)
                for row in (
                    fetched_full.filter(F.col("error") == "refused")
                    .groupBy("host")
                    .count()
                    .collect()
                ):
                    _dead_fails[row["host"]] = (
                        _dead_fails.get(row["host"], 0) + row["count"]
                    )
                newly_dead = sorted(
                    h
                    for h, n in _dead_fails.items()
                    if n >= 2 and h not in _dead_set
                )
                if newly_dead:
                    _dead_set.update(newly_dead)
                    nd = spark.createDataFrame(
                        [(h,) for h in newly_dead], "host string"
                    )
                    dead_hosts = (
                        nd
                        if dead_hosts is None
                        else dead_hosts.select("host").unionByName(nd)
                    )
                # error rows keep html/text null — identical to replay
                # join misses: visited, yield nothing, expand nothing
                fetched = fetched_full.select("url", "depth", "html", "text")
            else:
                fetched = keyed_input.join(
                    pages_slim.withColumnRenamed("url", "_fk"), "_fk", "left"
                ).select("url", "depth", "html", "text")

        # incremental bloom: OR a delta filter over only this round's new
        # keys into the running filter — the full seen table is never
        # rescanned. Built before candidate filtering so the (much
        # larger) enqueue-time anti-join is bloom-prefiltered too.
        bloom_next = None
        if config.use_bloom:
            if bloom_table is None:
                bloom_next = seen.build_bloom(
                    new_seen, config.bloom_parts, config.bloom_expected_per_part
                )
            else:
                # r6: one cogrouped add stage instead of build-delta +
                # OR-merge (two chained applyInPandas barriers) — the
                # resulting bitsets are bit-identical (seen.bloom_add)
                bloom_next = seen.bloom_add(
                    bloom_table,
                    new_seen,
                    config.bloom_parts,
                    config.bloom_expected_per_part,
                )
            # two consumers (bloom staging write + the enqueue-time
            # probe cogroup): cache so the applyInPandas OR-merge runs
            # once — it is a handful of bitset rows
            bloom_next = bloom_next.cache()
            round_caches.append(bloom_next)

        # 5. extract + expand — classic: pandas-UDF extraction over this
        # round's fetched raw pages; pre-extract: a slim join against
        # the one-pass table (no raw-page scan, no per-round UDF stage)
        if pre is None:
            link_cands, round_contacts, drops, caches = extract.process_pages(
                fetched, config.scope_host, config.default_region, config.org_domain
            )
        else:
            from pyspark.sql import Observation

            # INNER join deliberately: frontier URLs with no page are
            # already in url_seen (marked before the fetch) and a
            # pre-extract row can't exist for them — they contribute no
            # links/contacts/drops either way. Inner keeps the frontier
            # side broadcastable (AQE picks broadcast from the cached
            # eligible stats), so the persisted pre table is scanned,
            # never shuffled, each round — the seen-join property again.
            drop_obs = Observation()
            # "nl" rides along for free: the total links emitted this
            # round upper-bounds the enqueue-time candidate set, so the
            # broadcast guard inside the frontier build can skip its
            # dedicated count job whenever the bound is under the
            # threshold (r4 verdict item #2: per-round fixed cost).
            joined = keyed_input.join(pre, "_fk").observe(
                drop_obs,
                F.coalesce(F.sum("emails_dropped"), F.lit(0)).alias("ed"),
                F.coalesce(F.sum("phones_dropped"), F.lit(0)).alias("pd"),
                F.coalesce(F.sum(F.size("links")), F.lit(0)).alias("nl"),
            ).cache()
            round_caches.append(joined)
            # links carry (url, host, skey) from the one-pass
            # extraction (pure functions of the link url, so the
            # distinct set is unchanged) — the per-round candidate
            # build below is then pure Catalyst: no url_host /
            # struct_key Python stages inside any round (r6).
            link_cands = (
                joined.select(
                    F.explode("links").alias("_l"),
                    (F.col("depth") + 1).alias("depth"),
                )
                .select("_l.url", "_l.host", "_l.skey", "depth")
                .distinct()
            )
            round_contacts = joined.select(
                "url", "depth", F.explode("contacts").alias("_c")
            ).select(
                F.col("_c.kind").alias("kind"),
                F.col("_c.identifier").alias("identifier"),
                F.col("url").alias("source_url"),
                "depth",
            )
            drops = extract.PreDrops(drop_obs)
            caches = []
        # host/skey were computed per link in the extraction stage
        # (pre-extract pass or the fused per-round classic stage, r6);
        # only the JVM-side key_hash projection remains per round —
        # no url_host / struct_key Python stages in either mode
        pre_candidates = (
            link_cands.filter(F.col("depth") <= config.max_depth)
            .withColumnRenamed("skey", "struct_key")
            .withColumn("key_hash", F.xxhash64("struct_key"))
            # same column order as seen.with_struct_key produced —
            # filter_new's cogroup schemas are order-sensitive
            .select("url", "depth", "host", "struct_key", "key_hash")
        )

        def _build_frontier_next(candidate_bound: int | None = None) -> DataFrame:
            """Enqueue-time checks: not seen, not already queued.

            ``candidate_bound``: an upper bound on the candidate rows
            when the caller knows one (pre-extract mode observes the
            round's total link count in-band on the contacts staging
            job) — below the broadcast threshold the guard then costs
            no count job at all.
            """
            candidates = seen.filter_new(
                pre_candidates,
                url_seen_next,
                bloom_next,
                config.bloom_parts,
                seen_buckets=config.seen_buckets or None,
                cache_registry=round_caches,
                strategy=config.seen_join,
                prune_buckets=config.prune_seen_buckets,
                max_broadcast_rows=config.seen_broadcast_max_rows,
                candidate_bound=candidate_bound,
                probe_min_candidates=config.probe_min_candidates,
            )
            if config.host_budget is None and host_budgets is None:
                # no deferrals possible — skip the anti-join and union
                return _dedup_frontier(candidates.select(*deferred.columns))
            anti = candidates.join(deferred.select("url"), "url", "left_anti")
            return _dedup_frontier(
                deferred.unionByName(anti.select(*deferred.columns))
            )

        # 6. stage + atomic commit (also truncates lineage via read-back).
        # Row counts come from the staged parquet footers — no count jobs.
        tt = _tlog(f"r{round_no} plan", t0)

        def _metric_rows(n_eligible: int, n_contacts: int) -> list[tuple]:
            """Driver-side metric tuples; call only after the contacts
            plan has materialized (DropCounters.get blocks on it)."""
            rows = [
                (config.run_id, round_no, "frontier_urls", n_eligible),
                (config.run_id, round_no, "contacts_extracted", n_contacts),
                (config.run_id, round_no, "round_millis",
                 int((time.time() - t0) * 1000)),
            ]
            rows += [
                (config.run_id, round_no, metric, int(value))
                for metric, value in drops.get()
            ]
            return rows

        if store is not None:
            if config.compact_every and (round_no + 1) % config.compact_every == 0:
                # Iceberg-style maintenance: fold accumulated deltas
                # into one version per append table before this round's
                # delta stages on top (kill-safe — publishes with the
                # round's atomic commit; old dirs gc'd after).
                store.compact(
                    spark,
                    "url_seen",
                    round_no,
                    partition_by=_seen_layout,
                    min_versions=config.compact_every,
                )
                store.compact(
                    spark, "contacts", round_no, min_versions=config.compact_every
                )
                store.compact(
                    spark, "metrics", round_no, min_versions=config.compact_every
                )
                store.compact(
                    spark, "lineage", round_no, min_versions=config.compact_every
                )
                tt = _tlog(f"r{round_no} compact", t0)
            # Stage contacts first: it materializes every shared cache
            # (eligible, harvested pages, contact rows). The remaining
            # tables then read caches only, so they stage concurrently
            # (separate driver threads → overlapping Spark jobs).
            n_contacts = store.stage_append("contacts", round_contacts, round_no)
            tt = _tlog(f"r{round_no} stage contacts n={n_contacts}", tt)

            if pre is None:
                # Classic mode: build the next frontier in the MAIN
                # thread, after contacts staging has materialized the
                # page/extraction caches — the broadcast-guard count
                # inside filter_new then reads warm caches. Running it
                # concurrently with the other staging threads instead
                # oversubscribes the pandas-UDF workers (measured: 46 s
                # vs ~3 s for the same round).
                frontier_df = _build_frontier_next()
                tt = _tlog(f"r{round_no} frontier plan+guard", tt)
            else:
                # Pre-extract mode: the rounds carry no extraction
                # UDFs, so the frontier build (probe + anti-join +
                # dedup) can run INSIDE the staging pool, overlapping
                # the url_seen/bloom writes instead of serializing a
                # 2-3 s job between them (r4 verdict item #2). The
                # in-band link-count bound usually removes the guard's
                # dedicated count job entirely.
                cand_bound = int(drop_obs.get["nl"])

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=4) as pool:
                f_seen = pool.submit(
                    store.stage_append,
                    "url_seen",
                    new_seen,
                    round_no,
                    _seen_layout,
                )
                if pre is None:
                    f_frontier = pool.submit(
                        store.stage_replace, "frontier", frontier_df, round_no
                    )
                else:
                    f_frontier = pool.submit(
                        lambda: store.stage_replace(
                            "frontier", _build_frontier_next(cand_bound), round_no
                        )
                    )
                f_bloom = (
                    pool.submit(store.stage_replace, "bloom", bloom_next, round_no)
                    if bloom_next is not None
                    else None
                )
                n_eligible = f_seen.result()
                frontier_rows = f_frontier.result()
                if f_bloom is not None:
                    f_bloom.result()
            tt = _tlog(
                f"r{round_no} stage seen={n_eligible} frontier={frontier_rows} bloom",
                tt,
            )
            store.stage_append_rows(
                "metrics",
                [
                    dict(zip(("run_id", "round", "metric", "value"), r))
                    for r in _metric_rows(n_eligible, n_contacts)
                ],
                _METRICS_ARROW,
                round_no,
            )
            tt = _tlog(f"r{round_no} stage metrics", tt)
            store.commit(
                round_no,
                {
                    "run_id": config.run_id,
                    "frontier_rows": frontier_rows,
                    # bucket modulus the url_seen layout was written
                    # with — validated on resume (rebucket on mismatch)
                    "seen_buckets": config.seen_buckets or 0,
                },
            )
            store.gc()  # drop compacted-away / orphan version dirs
            frontier = store.read(spark, "frontier")
            url_seen = store.read(spark, "url_seen")
            all_contacts = store.read(spark, "contacts")
            metrics = store.read(spark, "metrics")
            if bloom_next is not None:
                bloom_table = store.read(spark, "bloom")
        else:
            # keep lineage bounded without a store
            n_eligible = eligible.count()
            n_contacts = round_contacts.count()
            frontier = _build_frontier_next(
                int(drop_obs.get["nl"]) if pre is not None else None
            ).localCheckpoint(eager=True)
            frontier_rows = -1
            url_seen = url_seen_next.localCheckpoint(eager=True)
            all_contacts = all_contacts.unionByName(round_contacts).localCheckpoint(
                eager=True
            )
            metrics = metrics.unionByName(
                spark.createDataFrame(
                    _metric_rows(n_eligible, n_contacts),
                    schema=empty_metrics.schema,
                )
            ).localCheckpoint(eager=True)
            if bloom_next is not None:
                bloom_table = bloom_next.localCheckpoint(eager=True)
        eligible.unpersist()
        for df in caches:
            df.unpersist()
        for df in round_caches:
            df.unpersist()

    if pre is not None:
        # every round's state was materialized (store read-back or
        # eager localCheckpoint), so nothing returned still depends on
        # the persisted pre-extraction table
        pre.unpersist()
    t_tail = time.time()
    deduped = extract.dedup_contacts(all_contacts)
    if store is not None and store.manifest() is not None:
        # endpoint count from the committed parquet footers — no Spark
        # job (url_seen rows are exactly the visited endpoints)
        n_endpoints = store.table_rows("url_seen") or 0
    else:
        n_endpoints = url_seen.count()
    t_tail = _tlog("tail endpoints", t_tail)
    summary = {
        "num_endpoints": n_endpoints,
        # r6: shrink before the Python stage — substring_index(url,'/',3)
        # keeps scheme://netloc verbatim (netloc ends at the first '/',
        # '?' or '#', and neither query nor fragment affects the parsed
        # hostname), so url_host over the ≤|hosts×schemes| distinct
        # prefixes equals url_host over every visited URL; the pandas
        # UDF no longer scans the full url_seen table.
        "num_subdomains": url_seen.select(
            F.substring_index(F.col("url"), "/", 3).alias("u")
        )
        .distinct()
        .select(udfs.url_host(F.col("u")).alias("h"))
        .distinct()
        .count(),
        "rounds": rounds_run,
    }
    t_tail = _tlog("tail subdomains", t_tail)
    lineage = (
        store.read(spark, "lineage")
        if store is not None and store.manifest() is not None
        else None
    )
    return CrawlResult(url_seen, deduped, metrics, rounds_run, summary, lineage)
