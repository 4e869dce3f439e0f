"""Direct tests for the two-phase skew-safe politeness cap."""

import pytest
from pyspark.sql import functions as F

from breakchecker_spark.operators import politeness


@pytest.fixture(scope="module")
def skewed_frontier(spark):
    # mega-host with 5000 URLs, two small hosts with 10 each
    mega = spark.range(5000).select(
        F.concat(F.lit("https://mega.x/p"), "id").alias("url"),
        F.lit(0).alias("depth"),
        F.lit("mega.x").alias("host"),
    )
    small = spark.range(10).select(
        F.concat(F.lit("https://a.x/p"), "id").alias("url"),
        F.lit(0).alias("depth"),
        F.lit("a.x").alias("host"),
    ).unionByName(
        spark.range(10).select(
            F.concat(F.lit("https://b.x/p"), "id").alias("url"),
            (F.col("id") % 3).cast("int").alias("depth"),
            F.lit("b.x").alias("host"),
        )
    )
    return mega.unionByName(small).cache()


def test_budget_exact_per_host(spark, skewed_frontier):
    eligible, deferred = politeness.host_budget_split(skewed_frontier, budget=7)
    counts = {
        r["host"]: r["n"]
        for r in eligible.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"mega.x": 7, "a.x": 7, "b.x": 7}
    assert eligible.count() + deferred.count() == skewed_frontier.count()
    # nothing lost, nothing duplicated
    assert (
        eligible.select("url").unionByName(deferred.select("url")).distinct().count()
        == skewed_frontier.count()
    )


def test_budget_picks_min_depth_url(spark, skewed_frontier):
    eligible, _ = politeness.host_budget_split(skewed_frontier, budget=3)
    b_rows = sorted(
        (r["depth"], r["url"])
        for r in eligible.filter(F.col("host") == "b.x").collect()
    )
    all_b = sorted(
        (r["depth"], r["url"])
        for r in skewed_frontier.filter(F.col("host") == "b.x").collect()
    )
    assert b_rows == all_b[:3]  # deterministic (depth, url) order


def test_unlimited_budget_identity(spark, skewed_frontier):
    eligible, deferred = politeness.host_budget_split(skewed_frontier, budget=None)
    assert deferred.count() == 0
    assert eligible.count() == skewed_frontier.count()


def test_budget_larger_than_host(spark, skewed_frontier):
    eligible, deferred = politeness.host_budget_split(skewed_frontier, budget=100)
    counts = {
        r["host"]: r["n"]
        for r in eligible.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a.x"] == 10 and counts["b.x"] == 10 and counts["mega.x"] == 100


def test_crawl_delay_budgets(spark):
    robots = spark.createDataFrame(
        [("slow.x", "/", 30.0), ("slow.x", "/p", 10.0), ("fast.x", "/", 0.5),
         ("nodelay.x", "/", None)],
        "host string, disallow_prefix string, crawl_delay double",
    )
    budgets = {
        r["host"]: r["budget"]
        for r in politeness.crawl_delay_budgets(robots, round_seconds=60.0).collect()
    }
    # max delay per host wins; floor(60/30)=2, floor(60/0.5)=120
    assert budgets == {"slow.x": 2, "fast.x": 120}


def test_variable_budget_split(spark, skewed_frontier):
    budgets = spark.createDataFrame([("mega.x", 5), ("a.x", 2)], "host string, budget int")
    eligible, deferred = politeness.host_budget_split(
        skewed_frontier, budget=None, host_budgets=budgets
    )
    counts = {
        r["host"]: r["n"]
        for r in eligible.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    # unlisted host (b.x) is unlimited when flat budget is None
    assert counts == {"mega.x": 5, "a.x": 2, "b.x": 10}
    assert eligible.count() + deferred.count() == skewed_frontier.count()


def test_variable_budget_with_flat_fallback(spark, skewed_frontier):
    budgets = spark.createDataFrame([("mega.x", 5)], "host string, budget int")
    eligible, _ = politeness.host_budget_split(
        skewed_frontier, budget=4, host_budgets=budgets
    )
    counts = {
        r["host"]: r["n"]
        for r in eligible.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"mega.x": 5, "a.x": 4, "b.x": 4}


def test_crawl_with_round_seconds(spark):
    from breakchecker_spark import schemas
    from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
    from tests import fixture_web

    pages = spark.createDataFrame(fixture_web.pages_rows(), schema=schemas.PAGES)
    seeds = spark.createDataFrame(fixture_web.SEEDS, schema=schemas.SEEDS)
    robots = spark.createDataFrame(
        [("example.com", "/never-matches", 30.0)], schema=schemas.ROBOTS
    )
    cfg = CrawlConfig(
        scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=False, round_seconds=30.0
    )
    res = run_crawl(spark, seeds, pages, cfg, robots=robots)
    # budget floor(30/30)=1 for example.com → more rounds than depth+1,
    # but the final visited set equals the unbudgeted crawl
    full = run_crawl(
        spark, seeds, pages,
        CrawlConfig(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=False),
    )
    got = {(r["url"], r["depth"]) for r in res.url_seen.collect()}
    want = {(r["url"], r["depth"]) for r in full.url_seen.collect()}
    assert got == want
    assert res.rounds > full.rounds


ROBOTS_FIXTURE = """
# global rules
User-agent: *
Disallow: /private
Disallow: /tmp/   # trailing comment
Crawl-delay: 2.5
Disallow:

User-agent: Googlebot
Disallow: /only-google

User-agent: BadBot
User-agent: *
Disallow: /also-global
"""


def test_parse_robots_txt_rules(spark):
    bodies = spark.createDataFrame(
        [
            ("a.x", ROBOTS_FIXTURE),
            ("b.x", "User-agent: *\nCrawl-delay: 10\n"),
            ("c.x", "User-agent: Googlebot\nDisallow: /x\n"),
            ("d.x", ""),
        ],
        "host string, body string",
    )
    rows = politeness.parse_robots_txt(bodies).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(
            (r["disallow_prefix"], r["crawl_delay"])
        )
    # a.x: both *-groups apply (stacked agents incl. BadBot+*); the
    # Googlebot-only group does not; empty Disallow emits nothing
    assert sorted(by_host["a.x"]) == [
        ("/also-global", 2.5),
        ("/private", 2.5),
        ("/tmp/", 2.5),
    ]
    # b.x: delay-only group → one null-prefix row carrying the delay
    assert by_host["b.x"] == [(None, 10.0)]
    # c.x (agent-specific only) and d.x (empty) emit nothing
    assert "c.x" not in by_host and "d.x" not in by_host


def test_parsed_robots_feed_the_gate(spark):
    """parse_robots_txt output plugs straight into apply_robots and
    crawl_delay_budgets."""
    bodies = spark.createDataFrame(
        [("h.x", "User-agent: *\nDisallow: /no\nCrawl-delay: 5\n")],
        "host string, body string",
    )
    rules = politeness.parse_robots_txt(bodies)
    cands = spark.createDataFrame(
        [
            ("https://h.x/no/page", 0, "h.x"),
            ("https://h.x/yes", 0, "h.x"),
        ],
        "url string, depth int, host string",
    )
    kept = {r["url"] for r in politeness.apply_robots(cands, rules).collect()}
    assert kept == {"https://h.x/yes"}
    budgets = {
        r["host"]: r["budget"]
        for r in politeness.crawl_delay_budgets(rules, round_seconds=20).collect()
    }
    assert budgets == {"h.x": 4}
