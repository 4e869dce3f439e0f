"""Parity extras: content-type/attachment predicates, dead-host gating."""

import pytest

from breakchecker_spark import schemas
from breakchecker_spark.functions import urlnorm
from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
from tests import fixture_web


@pytest.mark.parametrize(
    "ct,expected",
    [
        ("text/html", True),
        ("text/html; charset=utf-8", True),
        ("application/xhtml+xml", True),
        ("TEXT/HTML", True),
        ("application/json", False),
        ("text/plain", False),
        ("", False),
        (None, False),
    ],
)
def test_is_probably_html(ct, expected):
    assert urlnorm.is_probably_html(ct) is expected


@pytest.mark.parametrize(
    "cd,expected",
    [
        ("attachment; filename=x.pdf", True),
        ("ATTACHMENT", True),
        ("inline", False),
        (None, False),
        ("", False),
    ],
)
def test_is_attachment(cd, expected):
    assert urlnorm.is_attachment(cd) is expected


def test_dead_host_gate(spark):
    pages = spark.createDataFrame(fixture_web.pages_rows(), schema=schemas.PAGES)
    seeds = spark.createDataFrame(fixture_web.SEEDS, schema=schemas.SEEDS)
    dead = spark.createDataFrame([("shop.example.com",)], "host string")
    cfg = CrawlConfig(scope_host=fixture_web.SCOPE, max_depth=3, use_bloom=False)
    res = run_crawl(spark, seeds, pages, cfg, dead_hosts=dead)
    urls = {r["url"] for r in res.url_seen.select("url").collect()}
    # the linked shop root is visited (reference marks visited, then the
    # fetch fails, bc:1344-1346 + 766-768) …
    assert "https://shop.example.com/" in urls
    # … but yields no content: nothing extracted, no /cart expansion
    assert not any("/cart" in u for u in urls)
    ids = {r["identifier"] for r in res.contacts.collect()}
    assert "orders@example.com" not in ids  # lives on the dead host
    assert "cart-help@example.com" not in ids
    assert "info@example.com" in ids  # rest of the crawl unaffected


def test_fresh_run_on_dirty_checkpoint_resets(spark, tmp_path):
    """A non-resume run over an existing checkpoint dir must not inherit
    the prior run's append-table versions."""
    pages = spark.createDataFrame(fixture_web.pages_rows(), schema=schemas.PAGES)
    seeds = spark.createDataFrame(fixture_web.SEEDS, schema=schemas.SEEDS)
    ck = str(tmp_path / "dirty")
    base = dict(scope_host=fixture_web.SCOPE, max_depth=2, use_bloom=False,
                checkpoint_dir=ck)
    first = run_crawl(spark, seeds, pages, CrawlConfig(**base))
    # materialize before the second run wipes the store — old handles
    # dangle after a reset (a real Iceberg catalog would keep snapshots)
    first_endpoints = first.summary["num_endpoints"]
    first_contacts = first.contacts.count()
    again = run_crawl(spark, seeds, pages, CrawlConfig(**base))  # fresh, same dir
    assert again.summary["num_endpoints"] == first_endpoints
    assert again.contacts.count() == first_contacts


def test_snippet_windows_reference_semantics(spark):
    """X14: snippet = text[max(start-20,0):end+20], newlines→spaces,
    log-time whitespace collapse (break_checker.py:1438-1444,
    1287-1289) — checked against the reference expression directly."""
    from breakchecker_spark.functions.contacts import EMAIL_RE
    from breakchecker_spark.operators import extract

    texts = [
        "contact a@x.com now",                        # window clipped at both ends
        ("x" * 30) + " mid b@y.org tail " + ("y" * 30),  # full ±20 window
        "line1\nwrap c@z.net\nline3  with   runs",    # newline + collapse
        "",                                            # empty
        "no matches here",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: [(s["match"], s["snippet"]) for s in r["snippets"]]
        for r in extract.snippet_windows(df, "text", EMAIL_RE.pattern).collect()
    }

    import re
    rx = re.compile(EMAIL_RE.pattern)
    for i, t in enumerate(texts):
        want = []
        for m in rx.finditer(t):
            snip = t[max(m.start() - 20, 0): m.end() + 20].replace("\n", " ")
            want.append((m.group(), " ".join(snip.strip().split())))
        assert got[i] == want, (i, got[i], want)
    assert got[4] == [] and got[3] == []
