"""Sitemap ingestion: robots directives, urlset/index parse, seeding.

Beyond-reference seed source (the reference seeds only from config,
break_checker.py:1743-1760); these pin the RFC 9309 Sitemap-line
extraction, optional-field alignment, entity unescaping, bounded
index expansion, and the scope filter on derived seeds.
"""

import pytest
from pyspark.sql import functions as F

from breakchecker_spark.sources import sitemap as sm

_URLSET_HDR = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
)


def test_sitemap_urls_from_robots(spark):
    body = (
        "# header comment\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "sitemap: https://a.example/sm1.xml\n"
        "SITEMAP:https://a.example/sm2.xml # trailing comment\n"
        "Crawl-delay: 2\n"
        "NotASitemap: https://a.example/nope.xml\n"
    )
    rows = sm.sitemap_urls_from_robots(
        spark.createDataFrame([("a.example", body)], "host string, body string")
    ).collect()
    assert sorted(r["sitemap_url"] for r in rows) == [
        "https://a.example/sm1.xml",
        "https://a.example/sm2.xml",
    ]


def test_entry_parse_alignment_and_entities(spark):
    # middle record omits lastmod+priority — fields must stay attached
    # to their OWN <url>, never shift onto a neighbor
    xml = _URLSET_HDR + (
        "<url><loc> https://h.example/a?x=1&amp;y=2 </loc>"
        "<lastmod>2025-02-01</lastmod><priority>0.9</priority></url>"
        "<url><loc>https://h.example/b</loc></url>"
        "<url><loc>https://h.example/&lt;c&gt;</loc>"
        "<lastmod>2025-02-03</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("https://h.example/sm.xml", xml)], "sitemap_url string, xml string"
    )
    got = {r["url"]: r for r in sm.parse_sitemap_entries(df).collect()}
    assert set(got) == {
        "https://h.example/a?x=1&y=2",
        "https://h.example/b",
        "https://h.example/<c>",
    }
    assert got["https://h.example/a?x=1&y=2"]["lastmod"] == "2025-02-01"
    assert got["https://h.example/a?x=1&y=2"]["priority"] == "0.9"
    assert got["https://h.example/b"]["lastmod"] is None
    assert got["https://h.example/b"]["priority"] is None
    assert got["https://h.example/<c>"]["lastmod"] == "2025-02-03"


def _store(spark, rows):
    df = spark.createDataFrame(rows, "sitemap_url string, xml string")

    def fetch(urls):
        return urls.join(df, "sitemap_url").select("sitemap_url", "xml")

    return df, fetch


def test_index_expansion_two_levels(spark):
    idx = (
        '<sitemapindex xmlns="x">'
        "<sitemap><loc>https://h.example/sub.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    sub = _URLSET_HDR + "<url><loc>https://h.example/p</loc></url></urlset>"
    store, fetch = _store(
        spark,
        [("https://h.example/index.xml", idx), ("https://h.example/sub.xml", sub)],
    )
    start = store.filter(F.col("sitemap_url").endswith("index.xml"))
    entries = sm.expand_sitemaps(start, fetch)
    assert [r["url"] for r in entries.collect()] == ["https://h.example/p"]


def test_index_nesting_is_bounded(spark):
    # a self-referential index must terminate at max_nesting, not hang
    loop = (
        '<sitemapindex xmlns="x">'
        "<sitemap><loc>https://h.example/loop.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    store, fetch = _store(spark, [("https://h.example/loop.xml", loop)])
    entries = sm.expand_sitemaps(store, fetch, max_nesting=2)
    assert entries.count() == 0


def test_seeds_from_entries_scope(spark):
    entries = spark.createDataFrame(
        [
            ("s", "https://www.acme.gr/a", None, None),
            ("s", "http://acme.gr/b", None, None),
            ("s", "https://evil.example/x", None, None),
            ("s", "ftp://acme.gr/skip", None, None),
        ],
        "sitemap_url string, url string, lastmod string, priority string",
    )
    seeds = sm.seeds_from_entries(entries, scope_host="acme.gr")
    got = sorted((r["host"], r["scheme"]) for r in seeds.collect())
    assert got == [("acme.gr", "http"), ("www.acme.gr", "https")]
