"""End-to-end crawl replay: distributed engine vs pure-Python oracle.

The oracle (breakchecker_spark/oracle.py) implements the reference
crawler's observable semantics (break_checker.py:1319-1444) with the
pinned determinism rules; these tests assert the Spark engine produces
the identical URL-seen set (with depths), contacts with first-source
attribution, under no-budget, budgeted, robots-gated, bloom-on/off and
kill/resume conditions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from breakchecker_spark import oracle, schemas
from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
from tests import fixture_web


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(fixture_web.pages_rows(), schema=schemas.PAGES).cache()


@pytest.fixture(scope="module")
def seeds_df(spark):
    return spark.createDataFrame(fixture_web.SEEDS, schema=schemas.SEEDS)


def _sim(max_depth, budget=None, robots=None):
    pages = fixture_web.build_pages()
    texts = {
        u: (fixture_web.htmlx.page_text(h) if not u.endswith(".js") else h)
        for u, h in pages.items()
    }
    return oracle.simulate_crawl(
        pages,
        fixture_web.SEEDS,
        fixture_web.SCOPE,
        max_depth,
        host_budget=budget,
        robots=robots,
        page_texts=texts,
    )


def _engine_visited(result):
    return {
        (r["url"], r["depth"]) for r in result.url_seen.select("url", "depth").collect()
    }


def _engine_contacts(result):
    rows = result.contacts.collect()
    emails = {r["identifier"]: (r["depth"], r["source_url"]) for r in rows if r["kind"] == "email"}
    phones = {r["identifier"]: (r["depth"], r["source_url"]) for r in rows if r["kind"] == "phone"}
    return emails, phones


@pytest.mark.parametrize(
    "use_bloom,pre_extract", [(False, False), (True, False), (True, True)]
)
def test_full_crawl_matches_oracle(spark, pages_df, seeds_df, use_bloom, pre_extract):
    cfg = CrawlConfig(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=use_bloom,
                      bloom_parts=4, bloom_expected_per_part=1000,
                      pre_extract=pre_extract)
    result = run_crawl(spark, seeds_df, pages_df, cfg)
    sim = _sim(max_depth=3)

    assert _engine_visited(result) == set(sim.visited.items())
    emails, phones = _engine_contacts(result)
    assert emails == sim.emails
    assert phones == sim.phones


def test_pre_extract_equals_classic_with_budget_and_robots(
    spark, pages_df, seeds_df
):
    """Pre-extract mode must be output-identical to the classic loop
    under the adversarial configs too: politeness carry-over rounds
    (deferred rows re-join later frontiers) and robots gating. Metrics
    (incl. the per-round drop counters, which pre-extract aggregates
    via a different mechanism) must also match round for round."""
    robots_rows = [("example.com", "/deep", 1.0)]
    robots_df = spark.createDataFrame(robots_rows, schema=schemas.ROBOTS)
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3, host_budget=1,
                use_bloom=True, bloom_parts=4, bloom_expected_per_part=1000)
    a = run_crawl(spark, seeds_df, pages_df, CrawlConfig(**base), robots=robots_df)
    b = run_crawl(
        spark, seeds_df, pages_df, CrawlConfig(**base, pre_extract=True),
        robots=robots_df,
    )
    assert _engine_visited(a) == _engine_visited(b)
    assert _engine_contacts(a) == _engine_contacts(b)
    ma = sorted(
        map(tuple, a.metrics.select("round", "metric", "value")
            .filter(F.col("metric") != "round_millis").collect())
    )
    mb = sorted(
        map(tuple, b.metrics.select("round", "metric", "value")
            .filter(F.col("metric") != "round_millis").collect())
    )
    assert ma == mb
    assert a.rounds == b.rounds > 4


def test_depth_gate(spark, pages_df, seeds_df):
    cfg = CrawlConfig(scope_host=fixture_web.SCOPE, max_depth=1, use_bloom=False)
    result = run_crawl(spark, seeds_df, pages_df, cfg)
    sim = _sim(max_depth=1)
    assert _engine_visited(result) == set(sim.visited.items())
    # the depth-4 page's email must never appear
    emails, _ = _engine_contacts(result)
    assert "never-reached@example.com" not in emails
    assert all(d <= 1 for _, (d, _) in emails.items())


def test_expected_semantic_facts(spark, pages_df, seeds_df):
    """Hard-coded facts independent of the oracle implementation."""
    cfg = CrawlConfig(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=False)
    result = run_crawl(spark, seeds_df, pages_df, cfg)
    emails, phones = _engine_contacts(result)

    # extraction positives
    assert "info@example.com" in emails
    assert "ceo@example.com" in emails  # html entity decoded
    assert "jobs@example.com" in emails and "talent@example.com" in emails
    assert "recruit@example.com" in emails  # mailto cc list
    assert "sales@example.com" in emails  # <wrapped>
    assert "js_owner@example.com" in emails  # from .js raw content
    assert "esc@example.com" in emails  # \\u0040 decoded
    assert "team@sub.example.com" in emails  # same org, subdomain
    assert "orders@example.com" in emails  # via link-discovered subdomain
    # negatives
    assert "partner@gmail.com" not in emails  # out of org
    assert "secret@example.com" not in emails  # out-of-scope host never fetched
    assert "never-reached@example.com" not in emails  # depth gate
    assert not any(e.endswith("png") or e.endswith("jpeg") for e in emails)

    # phones: + prefixed valid; no-region nationals dropped; js phone dropped
    assert "2125550123" in phones and "2125550124" in phones
    assert "2125550199" in phones
    assert "2101234567" in phones  # +30 → GR national
    assert "2125550888" not in phones  # js file: phones suppressed
    assert "2125550125" not in phones  # national form, no default region for .com

    # subdomain discovery via BFS link
    hosts = {
        r["url"].split("://")[1].split("/")[0]
        for r in result.url_seen.select("url").collect()
    }
    assert "shop.example.com" in hosts
    assert not any(h.endswith("outside.org") for h in hosts)
    # summary's shrunken distinct-host job equals the full per-URL set
    assert result.summary["num_subdomains"] == len(hosts)

    # struct-key collapse: /contact never visited alongside /contact.html
    urls = {r["url"] for r in result.url_seen.select("url").collect()}
    assert "https://example.com/contact.html" in urls
    assert "https://example.com/contact" not in urls


def test_politeness_budget_carryover(spark, pages_df, seeds_df):
    cfg = CrawlConfig(
        scope_host=fixture_web.SCOPE, max_depth=3, host_budget=1, use_bloom=False
    )
    result = run_crawl(spark, seeds_df, pages_df, cfg)
    sim = _sim(max_depth=3, budget=1)
    assert _engine_visited(result) == set(sim.visited.items())
    emails, phones = _engine_contacts(result)
    assert emails == sim.emails and phones == sim.phones
    # budget=1 must take strictly more rounds than depth+1
    assert result.rounds > 4


def test_robots_gating(spark, pages_df, seeds_df):
    robots_rows = [("example.com", "/deep", 1.0), ("shop.example.com", "/cart", 1.0)]
    robots_df = spark.createDataFrame(robots_rows, schema=schemas.ROBOTS)
    cfg = CrawlConfig(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=False)
    result = run_crawl(spark, seeds_df, pages_df, cfg, robots=robots_df)
    sim = _sim(max_depth=3, robots=[("example.com", "/deep"), ("shop.example.com", "/cart")])
    assert _engine_visited(result) == set(sim.visited.items())
    urls = {u for u, _ in _engine_visited(result)}
    assert not any("/deep" in u for u in urls)
    assert not any("/cart" in u for u in urls)
    emails, _ = _engine_contacts(result)
    assert "cart-help@example.com" not in emails


def test_resume_equals_uninterrupted(spark, pages_df, seeds_df, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=False)

    # uninterrupted run
    full = run_crawl(spark, seeds_df, pages_df, CrawlConfig(**base))

    # killed after 2 rounds, then resumed
    cfg_kill = CrawlConfig(**base, checkpoint_dir=ckpt, max_rounds=2)
    run_crawl(spark, seeds_df, pages_df, cfg_kill)
    cfg_resume = CrawlConfig(**base, checkpoint_dir=ckpt)
    resumed = run_crawl(spark, seeds_df, pages_df, cfg_resume, resume=True)

    assert _engine_visited(resumed) == _engine_visited(full)
    assert _engine_contacts(resumed) == _engine_contacts(full)


def test_pre_extract_resume_equals_uninterrupted(
    spark, pages_df, seeds_df, tmp_path
):
    """Kill/resume under pre_extract: the pre-extraction table is
    deterministic from pages, so resume recomputes it and the final
    state must equal the uninterrupted run."""
    ckpt = str(tmp_path / "ckpt_pre")
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=True,
                bloom_parts=4, bloom_expected_per_part=1000, pre_extract=True)

    full = run_crawl(spark, seeds_df, pages_df, CrawlConfig(**base))
    cfg_kill = CrawlConfig(**base, checkpoint_dir=ckpt, max_rounds=2)
    run_crawl(spark, seeds_df, pages_df, cfg_kill)
    cfg_resume = CrawlConfig(**base, checkpoint_dir=ckpt)
    resumed = run_crawl(spark, seeds_df, pages_df, cfg_resume, resume=True)

    assert _engine_visited(resumed) == _engine_visited(full)
    assert _engine_contacts(resumed) == _engine_contacts(full)


def test_resume_bloom_on_over_bloomless_checkpoint(spark, pages_df, seeds_df, tmp_path):
    """Resume with use_bloom=True over a checkpoint written with
    use_bloom=False: the filter must be rebuilt from the full url_seen,
    or round-1's delta-only bloom would mark resumed-seen URLs as
    'definitely new' and re-crawl them (ADVICE r1, crawl.py:174)."""
    ckpt = str(tmp_path / "ckpt_bloomless")
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3)

    full = run_crawl(
        spark, seeds_df, pages_df, CrawlConfig(**base, use_bloom=False)
    )

    cfg_kill = CrawlConfig(**base, use_bloom=False, checkpoint_dir=ckpt, max_rounds=2)
    run_crawl(spark, seeds_df, pages_df, cfg_kill)
    cfg_resume = CrawlConfig(
        **base, use_bloom=True, bloom_parts=4, bloom_expected_per_part=1000,
        checkpoint_dir=ckpt,
    )
    resumed = run_crawl(spark, seeds_df, pages_df, cfg_resume, resume=True)

    assert _engine_visited(resumed) == _engine_visited(full)
    # no duplicate url_seen rows (re-crawl symptom)
    n = resumed.url_seen.count()
    assert n == resumed.url_seen.select("key_hash").distinct().count()
    assert _engine_contacts(resumed) == _engine_contacts(full)


def test_resume_rebuckets_on_seen_buckets_change(
    spark, pages_df, seeds_df, tmp_path
):
    """Resume under a different ``seen_buckets`` than the checkpoint
    was written with: on-disk bucket values used the old modulus, so
    the (bucket, key_hash) membership semi-join would silently miss
    seen keys and re-crawl them (ADVICE r2). The manifest records the
    modulus and resume re-derives the column."""
    ckpt = str(tmp_path / "ckpt_rebucket")
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=True,
                bloom_parts=4, bloom_expected_per_part=1000)

    full = run_crawl(spark, seeds_df, pages_df, CrawlConfig(**base, seen_buckets=4))

    cfg_kill = CrawlConfig(**base, seen_buckets=4, checkpoint_dir=ckpt, max_rounds=2)
    run_crawl(spark, seeds_df, pages_df, cfg_kill)
    cfg_resume = CrawlConfig(**base, seen_buckets=16, checkpoint_dir=ckpt)
    resumed = run_crawl(spark, seeds_df, pages_df, cfg_resume, resume=True)

    assert _engine_visited(resumed) == _engine_visited(full)
    n = resumed.url_seen.count()
    assert n == resumed.url_seen.select("key_hash").distinct().count()
    assert _engine_contacts(resumed) == _engine_contacts(full)
    # every row's bucket matches the new modulus
    from pyspark.sql import functions as F

    bad = resumed.url_seen.filter(
        F.col("bucket") != F.pmod(F.col("key_hash"), F.lit(16)).cast("int")
    ).count()
    assert bad == 0


def test_resume_rebucket_landing_on_compaction_round(
    spark, pages_df, seeds_df, tmp_path
):
    """Resume with a changed seen_buckets where the FIRST resumed round
    is also a compaction round: compaction must defer to the staged
    rebucket instead of clobbering it with old-modulus data (ADVICE
    r3, crawl.py/checkpoint.py). host_budget=1 stretches the crawl so
    round 5 exists; (5+1) % compact_every==0 with 5 ≥ min_versions
    fires the url_seen compact exactly when the rebucket is pending."""
    ckpt = str(tmp_path / "ckpt_rb_compact")
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3, host_budget=1,
                use_bloom=True, bloom_parts=4, bloom_expected_per_part=1000)

    full = run_crawl(
        spark, seeds_df, pages_df,
        CrawlConfig(**base, seen_buckets=4, compact_every=3),
    )
    assert full.rounds > 5

    cfg_kill = CrawlConfig(
        **base, seen_buckets=4, compact_every=3, checkpoint_dir=ckpt,
        max_rounds=5,
    )
    run_crawl(spark, seeds_df, pages_df, cfg_kill)
    cfg_resume = CrawlConfig(
        **base, seen_buckets=16, compact_every=3, checkpoint_dir=ckpt
    )
    resumed = run_crawl(spark, seeds_df, pages_df, cfg_resume, resume=True)

    assert _engine_visited(resumed) == _engine_visited(full)
    n = resumed.url_seen.count()
    assert n == resumed.url_seen.select("key_hash").distinct().count()
    assert _engine_contacts(resumed) == _engine_contacts(full)
    from pyspark.sql import functions as F

    bad = resumed.url_seen.filter(
        F.col("bucket") != F.pmod(F.col("key_hash"), F.lit(16)).cast("int")
    ).count()
    assert bad == 0


def test_resume_buckets_over_bucketless_checkpoint(
    spark, pages_df, seeds_df, tmp_path
):
    """Legacy checkpoint written with seen_buckets=0 resumed under the
    bucketed default: the missing ``bucket`` column must be derived,
    not crash unionByName (ADVICE r2)."""
    ckpt = str(tmp_path / "ckpt_bucketless")
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=True,
                bloom_parts=4, bloom_expected_per_part=1000)

    full = run_crawl(spark, seeds_df, pages_df, CrawlConfig(**base, seen_buckets=8))

    cfg_kill = CrawlConfig(**base, seen_buckets=0, checkpoint_dir=ckpt, max_rounds=2)
    run_crawl(spark, seeds_df, pages_df, cfg_kill)
    cfg_resume = CrawlConfig(**base, seen_buckets=8, checkpoint_dir=ckpt)
    resumed = run_crawl(spark, seeds_df, pages_df, cfg_resume, resume=True)

    assert _engine_visited(resumed) == _engine_visited(full)
    assert _engine_contacts(resumed) == _engine_contacts(full)


def test_metrics_recorded(spark, pages_df, seeds_df):
    cfg = CrawlConfig(scope_host=fixture_web.SCOPE, max_depth=2, use_bloom=False)
    result = run_crawl(spark, seeds_df, pages_df, cfg)
    m = {r["metric"] for r in result.metrics.select("metric").distinct().collect()}
    assert {"frontier_urls", "contacts_extracted", "emails_dropped", "phones_dropped"} <= m
    total_frontier = (
        result.metrics.filter(F.col("metric") == "frontier_urls")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert total_frontier == result.summary["num_endpoints"]


def test_fused_preextract_equals_chained(spark, pages_df):
    """r6: preextract_pages is one fused mapInPandas stage; its rows
    (incl. per-page link ORDER and exact drop counts) must equal the
    chained pandas-UDF composition it replaced."""
    from breakchecker_spark.operators import extract

    from urllib.parse import urlparse

    from breakchecker_spark.functions import urlnorm

    args = (fixture_web.SCOPE, "GR", fixture_web.SCOPE)
    fused = extract.preextract_pages(pages_df, *args)
    chained = extract.preextract_pages_chained(pages_df, *args)
    ra = sorted(
        (r.asDict(recursive=True) for r in fused.collect()),
        key=lambda r: r["url"],
    )
    rb = sorted(
        (r.asDict(recursive=True) for r in chained.collect()),
        key=lambda r: r["url"],
    )
    assert len(ra) == len(rb)
    n_links = 0
    for x, y in zip(ra, rb):
        # links carry (url, host, skey); the url sequence must equal
        # the chained output exactly, and host/skey must equal the
        # url_host / struct_key_str pure functions of each link url
        for link in x["links"]:
            assert link["host"] == (urlparse(link["url"]).hostname or "").lower()
            assert link["skey"] == urlnorm.struct_key_str(link["url"])
            n_links += 1
        x = dict(x, links=[link["url"] for link in x["links"]])
        assert x == y
    assert n_links > 0
    # no chained python runners on the hot path: exactly one
    # MapInPandas / python-eval node in the fused plan
    import re

    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"MapInPandas", plan)) == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_fused_process_pages_equals_chained(spark, pages_df):
    """r6: the classic/live per-round extraction is one fused
    mapInPandas stage; its outputs (link candidate set incl. carried
    host/skey, contact rows, exact drop counts) must equal the chained
    pandas-UDF pipeline it replaced."""
    from urllib.parse import urlparse

    from breakchecker_spark.functions import urlnorm
    from breakchecker_spark.operators import extract

    fetched = pages_df.select(
        "url", F.lit(2).alias("depth"), "html", "text"
    )
    args = (fixture_web.SCOPE, "GR", fixture_web.SCOPE)
    links_f, contacts_f, drops_f, caches_f = extract.process_pages(fetched, *args)
    links_c, contacts_c, drops_c, caches_c = extract.process_pages_chained(
        fetched, *args
    )
    rows_f = links_f.collect()
    rows_c = links_c.collect()
    assert {(r["url"], r["depth"]) for r in rows_f} == {
        (r["url"], r["depth"]) for r in rows_c
    }
    for r in rows_f:
        assert r["host"] == (urlparse(r["url"]).hostname or "").lower()
        assert r["skey"] == urlnorm.struct_key_str(r["url"])
    cf = sorted(map(tuple, contacts_f.collect()))
    cc = sorted(map(tuple, contacts_c.collect()))
    assert cf == cc and len(cf) > 0
    assert sorted(drops_f.get()) == sorted(drops_c.get())
    for df_ in caches_f + caches_c:
        df_.unpersist()
    # one Python stage in the fused round plan
    plan = links_f._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
