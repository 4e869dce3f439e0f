"""Golden-vector tests for URL canonicalization / struct keys / skip rules.

Vectors derived by hand from the reference semantics
(/root/reference/break_checker.py:411-444, 846-972).
"""

import pytest

from breakchecker_spark.functions import urlnorm

BASE = "https://example.com/dir/page.html"
SCOPE = "example.com"


@pytest.mark.parametrize(
    "link,expected",
    [
        # relative resolution + defrag
        ("about.html", "https://example.com/dir/about.html"),
        ("/a/b#frag", "https://example.com/a/b"),
        # scheme filters
        ("javascript:void(0)", None),
        ("data:text/plain;base64,xx", None),
        ("blob:https://example.com/x", None),
        ("ftp://example.com/file", None),
        ("mailto:a@example.com", None),  # non-http scheme
        # scope
        ("https://other.org/x", None),
        ("https://sub.example.com/x", "https://sub.example.com/x"),
        # path normalization
        ("https://example.com//a///b/", "https://example.com/a/b"),
        ("https://example.com/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        # query cleaning: trackers dropped, blanks dropped, pairs sorted
        (
            "https://example.com/p?utm_source=x&b=2&a=1&gclid=99",
            "https://example.com/p?a=1&b=2",
        ),
        ("https://example.com/p?b=2&a=1&a=0", "https://example.com/p?a=0&a=1&b=2"),
        ("https://example.com/p?empty=&x=1", "https://example.com/p?x=1"),
        ("https://example.com/p?utm_only=1", "https://example.com/p"),
        ("https://example.com/p?_hsenc=z&vero_id=3&x=1", "https://example.com/p?x=1"),
        # default port stripping + host lowercase
        ("https://EXAMPLE.com:443/P", "https://example.com/P"),
        ("http://example.com:80/p", "http://example.com/p"),
        ("http://example.com:8080/p", "http://example.com:8080/p"),
        # empty / whitespace
        ("", None),
        ("   ", "https://example.com/dir/page.html"),  # urljoin('', base) → base defragged
    ],
)
def test_canonicalize(link, expected):
    assert urlnorm.canonicalize(BASE, link, SCOPE) == expected


def test_canonicalize_suffix_scope_matches_reference_hostname_rule():
    # The reference scopes with a bare hostname.endswith(scope_host)
    # (bc:924-927) — no leading-dot guard — so "evilexample.com" is
    # (perhaps surprisingly) in scope for "example.com". Stay faithful.
    got = urlnorm.canonicalize(BASE, "https://evilexample.com/x", SCOPE)
    assert got == "https://evilexample.com/x"


@pytest.mark.parametrize(
    "url,expected",
    [
        ("https://example.com/a/b", ("example.com", "/a/b", ())),
        ("https://example.com/a/b/", ("example.com", "/a/b", ())),
        ("https://example.com/a/b.html", ("example.com", "/a/b", ())),
        ("https://example.com/index.html", ("example.com", "/index", ())),
        ("https://example.com/.html", ("example.com", "/", ())),
        ("https://example.com/", ("example.com", "", ())),
        (
            "https://example.com/p?b=2&a=1",
            ("example.com", "/p", (("a", "1"), ("b", "2"))),
        ),
        # >5 pairs: only first 5 sorted pairs kept
        (
            "https://example.com/p?f=6&e=5&d=4&c=3&b=2&a=1",
            (
                "example.com",
                "/p",
                (("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"), ("e", "5")),
            ),
        ),
    ],
)
def test_struct_key(url, expected):
    assert urlnorm.struct_key(url) == expected


def test_struct_key_str_collapses_near_dupes():
    variants = [
        "https://example.com/a/b",
        "https://example.com/a/b/",
        "https://example.com/a/b.html",
    ]
    keys = {urlnorm.struct_key_str(u) for u in variants}
    assert len(keys) == 1


@pytest.mark.parametrize(
    "url,expected",
    [
        ("https://example.com/page", False),
        ("https://example.com/doc.pdf", True),
        ("https://example.com/pic.PNG", True),
        ("https://example.com/app.js", False),  # js is crawlable
        ("https://example.com/media/x", True),
        ("https://example.com/wp-content/uploads/f", True),
        ("https://example.com/downloads/x.html", True),
        ("https://example.com/static/app", True),
        ("https://example.com/v1.2/page", False),  # ext "2/page"? no — path dot
        ("https://example.com/archive.tar.gz", True),
        ("https://example.com/file.unknownext", False),
    ],
)
def test_skip_by_path(url, expected):
    assert urlnorm.skip_by_path(url) is expected


def test_tracking_params():
    assert urlnorm.is_tracking_param("UTM_SOURCE")
    assert urlnorm.is_tracking_param("utm_anything")
    assert urlnorm.is_tracking_param("_hsenc")
    assert urlnorm.is_tracking_param("vero_conv")
    assert urlnorm.is_tracking_param("fbclid")
    assert not urlnorm.is_tracking_param("page")
    assert not urlnorm.is_tracking_param("refer")  # 'ref' is exact, not prefix
