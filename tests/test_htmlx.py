"""HTML harvesting tests (reference break_checker.py:1379-1421)."""

from breakchecker_spark.functions import htmlx

DOC = """
<html><head><title>T</title>
<script src="/js/app.js"></script>
<script>var e = "inline@example.com";</script>
</head><body>
<a href="/about">About</a>
<a href="mailto:info@example.com">Mail us</a>
<a href="tel:+302101234567">Call <b>us</b></a>
<a name="no-href">skip me</a>
<p>Split em<b>ail: user</b>@example.com</p>
<script src="https://cdn.example.com/lib.mjs"></script>
</body></html>
"""


def test_anchor_hrefs_in_order():
    assert htmlx.anchor_hrefs(DOC) == [
        "/about",
        "mailto:info@example.com",
        "tel:+302101234567",
    ]


def test_script_srcs_in_order():
    assert htmlx.script_srcs(DOC) == ["/js/app.js", "https://cdn.example.com/lib.mjs"]


def test_page_text_joins_with_space():
    text = htmlx.page_text(DOC)
    # text nodes joined with " " — the split email becomes findable
    assert "em ail: user @example.com" in text
    # inline script bodies are text nodes too (bs4 get_text includes them)
    assert "inline@example.com" in text
    assert "About" in text and "Call" in text and "us" in text


def test_entities_decoded():
    assert "a@b.com" in htmlx.page_text("<p>a&#64;b.com</p>")


def test_malformed_html_does_not_raise():
    assert htmlx.anchor_hrefs("<a href='x' <broken") in ([], ["x"])
    htmlx.page_text("<<<>>>&bogus;")
