"""S7 render pass tests: gate, plumbing, and end-to-end crawl impact.

The browser itself (playwright + Chromium) is absent in this
environment — `playwright_renderer_factory` must say so loudly — so
the distributed plumbing (Catalyst `needs_render` gate →
host-partitioned mapInPandas → `page_text` re-derivation → crawl
integration) is exercised with the deterministic fake browser. The
final test is the reason rendering exists at all (reference
break_checker.py:669-740): a contact materialized only by script
execution is found iff the render pass runs.
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F, types as T

from breakchecker_spark import schemas
from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
from breakchecker_spark.sources import fetcher, render
from tests.test_fetcher import _SiteHandler


# --------------------------------------------------------------------------
# pure pieces
# --------------------------------------------------------------------------

def test_first_stable_acceptance_rule():
    # first snapshot already readable → early exit (bc:505-510)
    assert render.first_stable([("<p>big</p>", 100), ("<p>x</p>", 5)]) == "<p>big</p>"
    # hydration rung wins when the first snapshot is thin (bc:513-516)
    assert (
        render.first_stable([("<p></p>", 0), ("<p>hydrated</p>", 90)])
        == "<p>hydrated</p>"
    )
    # never stabilizes → None (bc:538-539)
    assert render.first_stable([("<p></p>", 0), (None, 0), ("<p>t</p>", 79)]) is None
    # custom threshold
    assert render.first_stable([("<p>t</p>", 79)], min_text_len=10) == "<p>t</p>"


def test_fake_js_renderer_document_write():
    r = render.fake_js_renderer_factory()()
    spa = '<html><body><script>document.write("hello world")</script></body></html>'
    assert r("u", spa) == "<html><body><div>hello world</div></body></html>"
    # JS string concatenation evaluated — split content only exists
    # post-render
    split = '<p>x</p><script>document.write("a@b" + ".co" + "m")</script>'
    assert r("u", split) == "<p>x</p><div>a@b.com</div>"
    # multiple writes
    two = (
        '<script>document.write("1")</script>'
        '<script>document.write("2")</script>'
    )
    assert r("u", two) == "<div>1</div><div>2</div>"
    # no script effect → None (render adds nothing)
    assert r("u", "<html><body>static</body></html>") is None
    assert r("u", None) is None
    assert r("u", "") is None


def test_playwright_factory_is_a_clearly_marked_stub():
    try:
        import playwright  # noqa: F401

        pytest.skip("playwright installed; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="playwright"):
        render.playwright_renderer_factory()


# --------------------------------------------------------------------------
# distributed plumbing
# --------------------------------------------------------------------------

_PAGE_FIELDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

_SPA_HTML = (
    '<html><body><p>loading</p>'
    '<script>document.write("email me at ops" + "@corp.example")</script>'
    "</body></html>"
)
_LONG_TEXT = "already fully rendered visible text " * 4  # > 80 chars


def _pages_df(spark):
    rows = [
        ("https://a.example/spa", "a.example", 200, _SPA_HTML.encode(), "loading"),
        (
            "https://a.example/static-long",
            "a.example",
            200,
            b"<html><body><script>var x=1</script><p>long</p></body></html>",
            _LONG_TEXT,
        ),
        (
            "https://b.example/noscript",
            "b.example",
            200,
            b"<html><body><p>tiny</p></body></html>",
            "tiny",
        ),
        ("https://b.example/failed", "b.example", None, None, None),
    ]
    return spark.createDataFrame(rows, schema=_PAGE_FIELDS)


def test_render_pages_gate_and_rewrite(spark):
    out = render.render_pages(
        _pages_df(spark), render.fake_js_renderer_factory()
    )
    got = {r["url"]: r for r in out.collect()}
    assert len(got) == 4

    spa = got["https://a.example/spa"]
    assert spa["rendered"] is True
    assert b"<div>email me at ops@corp.example</div>" in bytes(spa["html"])
    assert b"<script>" not in bytes(spa["html"])
    # text re-derived from the rendered DOM via page_text
    assert spa["text"] == "loading email me at ops@corp.example"
    assert spa["render_error"] is None

    # long visible text → gate filters it out of the Python pass even
    # though it carries a <script>
    long_row = got["https://a.example/static-long"]
    assert long_row["rendered"] is False
    assert long_row["text"] == _LONG_TEXT
    # short but scriptless → no render; null html → no render; all
    # pass-through columns intact
    assert got["https://b.example/noscript"]["rendered"] is False
    assert got["https://b.example/noscript"]["status"] == 200
    assert got["https://b.example/failed"]["rendered"] is False
    assert got["https://b.example/failed"]["html"] is None


def test_render_pages_render_all_and_string_html(spark):
    rows = [
        ("u1", '<p>x</p><script>document.write("y")</script>', _LONG_TEXT),
        ("u2", "<p>static</p>", "static"),
    ]
    df = spark.createDataFrame(rows, "url string, html string, text string")
    out = render.render_pages(
        df, render.fake_js_renderer_factory(), render_all=True
    )
    got = {r["url"]: r for r in out.collect()}
    # render_all bypasses the gate: u1 rewrites despite long text, and
    # string html stays a string column
    assert got["u1"]["rendered"] is True
    assert got["u1"]["html"] == "<p>x</p><div>y</div>"
    assert got["u1"]["text"] == "x y"
    assert got["u2"]["rendered"] is False
    assert got["u2"]["html"] == "<p>static</p>"


def test_render_pages_error_classified(spark):
    def exploding_factory():
        def _render(url, html_doc):
            raise TimeoutError("render timed out")

        return _render

    out = render.render_pages(_pages_df(spark), exploding_factory)
    got = {r["url"]: r for r in out.collect()}
    spa = got["https://a.example/spa"]
    # failure keeps the original page and carries the classifier label
    assert spa["rendered"] is False
    assert spa["render_error"] == "timeout"
    assert bytes(spa["html"]) == _SPA_HTML.encode()
    # ungated rows never reach the renderer, so no error
    assert got["https://a.example/static-long"]["render_error"] is None


# --------------------------------------------------------------------------
# e2e: live crawl finds a post-render-only contact iff rendering is on
# --------------------------------------------------------------------------

_RSCOPE = "spa-corp.example"


def _render_site():
    root = (
        f'<html><body><a href="https://{_RSCOPE}/app">app</a>'
        " welcome to the single page app corp</body></html>"
    )
    # the email exists ONLY after JS execution: split across string
    # literals, no regex over the raw html/text can assemble it
    app = (
        "<html><body><script>"
        'document.write("reach us: care" + "@spa-corp" + ".example")'
        "</script></body></html>"
    )
    ct = "text/html; charset=utf-8"
    return {
        f"https://{_RSCOPE}": (root.encode(), ct, {}, 200),
        f"https://{_RSCOPE}/": (root.encode(), ct, {}, 200),
        f"https://{_RSCOPE}/app": (app.encode(), ct, {}, 200),
    }


@pytest.fixture(scope="module")
def render_web():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    srv.site = _render_site()
    srv.requests = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, srv.server_address[1]
    srv.shutdown()


def _transform(port):
    def transform(url: str) -> str:
        return f"http://127.0.0.1:{port}/q/" + urllib.parse.quote(url, safe="")

    return transform


def _live_cfg():
    return CrawlConfig(
        scope_host=_RSCOPE, max_depth=2, use_bloom=True,
        bloom_parts=4, bloom_expected_per_part=1000,
    )


def test_live_crawl_render_reveals_contact(spark, render_web):
    srv, port = render_web
    seeds = spark.createDataFrame([(_RSCOPE, "https")], schema=schemas.SEEDS)

    plain = run_crawl(
        spark, seeds, None, _live_cfg(),
        fetcher=lambda df: fetcher.fetch_pages(
            df, transform_url=_transform(port), timeout=10.0
        ),
    )
    rendered = run_crawl(
        spark, seeds, None, _live_cfg(),
        fetcher=render.rendering_fetcher(
            render.fake_js_renderer_factory(),
            fetch_kwargs={"transform_url": _transform(port), "timeout": 10.0},
        ),
    )

    def contact_ids(res):
        return {r["identifier"] for r in res.contacts.collect()}

    # same frontier either way (the SPA page adds no links post-render)
    def visited(res):
        return {r["url"] for r in res.url_seen.collect()}

    assert visited(plain) == visited(rendered)
    assert "care@spa-corp.example" not in contact_ids(plain)
    assert "care@spa-corp.example" in contact_ids(rendered)


# --------------------------------------------------------------------------
# CLI surface
# --------------------------------------------------------------------------

def test_cli_render_requires_live(spark, capsys):
    from breakchecker_spark import cli

    with pytest.raises(SystemExit):
        cli.main(["--domain", "example.com", "--pages", "/tmp/x", "--render"])
    assert "--render" in capsys.readouterr().err


def test_cli_render_without_playwright_fails_loudly(spark):
    try:
        import playwright  # noqa: F401

        pytest.skip("playwright installed; stub path not applicable")
    except ImportError:
        pass
    from breakchecker_spark import cli

    with pytest.raises(NotImplementedError, match="playwright"):
        cli.main(["--domain", "example.com", "--live", "--render"])
