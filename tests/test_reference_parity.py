"""Direct behavioral parity vs the reference's pure functions.

SURVEY.md §5.1: golden vectors "derived by executing the reference's
pure functions". The reference module imports network/browser deps at
top level, so this test AST-extracts only the dependency-free pure
functions (URL canonicalization, struct keys, text normalization,
mailto/tel parsing, path skipping) from /root/reference/break_checker.py
and executes them in an isolated namespace as a live oracle — no
reference code is copied into this repo.

Email/phone *validation* parity is excluded by design: the reference
delegates to email_validator/phonenumbers (absent here); the
stdlib replacements are documented deviations
(breakchecker_spark/functions/contacts.py).
"""

from __future__ import annotations

import ast
import html as _html
import re
import unicodedata
from urllib.parse import (
    parse_qs,
    parse_qsl,
    urldefrag,
    urlencode,
    urljoin,
    urlparse,
    urlunparse,
)

import pytest

from breakchecker_spark.functions import contacts, textnorm, urlnorm

REFERENCE = "/root/reference/break_checker.py"

_WANTED = {
    "NON_HTML_EXTS",
    "SKIP_PATH_KEYWORDS",
    "TRACKING_PARAMS",
    "TRACKING_PREFIXES",
    "EMAIL_IGNORE_EXTS",
    "EMAIL_RE",
    "PHONE_RE",
    "_PUNCT_EDGES",
    "should_skip_url_by_path",
    "is_probably_html",
    "_should_drop_param",
    "_normalize_path",
    "canonicalize_url",
    "_url_struct_key",
    "_clean_angle_brackets",
    "_decode_backslash_escapes",
    "_strip_edge_punct",
    "_norm_text",
    "_extract_mailto_addresses",
    "_extract_tel_numbers",
}


class _NullLogger:
    def debug(self, *a, **k):
        pass

    def info(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def ref():
    """Namespace holding the executed reference pure functions."""
    src = open(REFERENCE, encoding="utf-8-sig").read()  # strip BOM
    tree = ast.parse(src)
    selected = [
        node
        for node in tree.body
        if (isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name in _WANTED)
        or (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id in _WANTED for t in node.targets
            )
        )
    ]
    module = ast.Module(body=selected, type_ignores=[])
    ns = {
        "re": re,
        "html": _html,
        "unicodedata": unicodedata,
        "urlparse": urlparse,
        "urljoin": urljoin,
        "urldefrag": urldefrag,
        "urlunparse": urlunparse,
        "urlencode": urlencode,
        "parse_qsl": parse_qsl,
        "parse_qs": parse_qs,
        "unquote": __import__("urllib.parse", fromlist=["unquote"]).unquote,
        "logger": _NullLogger(),
        "Optional": None,
        "List": list,
        "Dict": dict,
        "Tuple": tuple,
    }
    exec(compile(module, REFERENCE, "exec"), ns)  # noqa: S102 — test oracle
    missing = _WANTED - set(ns)
    assert not missing, f"reference extraction incomplete: {missing}"
    return ns


URLS = [
    "https://example.com",
    "https://example.com/",
    "https://example.com/a/b",
    "https://example.com/a/b/",
    "https://example.com//a///b//",
    "https://example.com/a/b.html",
    "https://EXAMPLE.com:443/UP/case",
    "http://example.com:80/p",
    "http://example.com:8080/p",
    "https://example.com/p?b=2&a=1",
    "https://example.com/p?a=1&a=0&b=",
    "https://example.com/p?utm_source=x&gclid=1&real=v",
    "https://example.com/p?f=6&e=5&d=4&c=3&b=2&a=1&g=7",
    "https://sub.deep.example.com/x?_hsenc=1&vero_id=2&ref=3&refx=4",
    "https://example.com/download/file",
    "https://example.com/wp-content/uploads/x.html",
    "https://example.com/doc.pdf",
    "https://example.com/pic.PNG?x=1",
    "https://example.com/app.js",
    "https://example.com/archive.tar.gz",
    "https://example.com/v1.2/page",
    "https://example.com/index.html",
    "https://example.com/.html",
    "https://example.com/media/x",
    "https://example.com/静的/path",
]

LINKS = [
    "about.html",
    "../up/one",
    "/abs/path#frag",
    "//example.com/scheme/relative",
    "//other.org/out",
    "https://sub.example.com//x//y/?b=2&a=1&utm_term=z#f",
    "javascript:void(0)",
    "data:text/plain,x",
    "blob:https://example.com/u",
    "mailto:a@b.com",
    "ftp://example.com/f",
    "HTTPS://EXAMPLE.COM/Upper",
    "https://example.com:443/defport/",
    "?onlyquery=1",
    "#onlyfrag",
    "",
    "   /spaced/path   ",
    "https://evilexample.com/suffix",
]

TEXTS = [
    "plain",
    "a&lt;b&gt;&amp;&#64;x",
    "esc\\u0040example.com and \\x41",
    "ｆｕｌｌｗｉｄｔｈ ﬁ",
    "ctrl\x00\x07chars\tkept\nnewline",
    "zero​width",
    '  "<wrapped@x.com>"  ',
    "([{nested}])",
    "no change 123",
]

MAILTOS = [
    "mailto:a@b.com",
    "mailto://a@b.com",
    "MAILTO:A@B.com",
    "mailto:x@y.com,z@w.com?subject=hi",
    "mailto:?to=u@e.com&cc=a@b.com;c@d.com&bcc=e@f.com",
    "mailto:%3Cq@r.com%3E",
    "mailto:",
    "tel:+123",
    "https://not-mailto.com",
]

TELS = [
    "tel:+301234567",
    "tel://+301234567",
    "TEL:+1 (212) 555-0199",
    "tel:+30123?ext=2",
    "tel:%2B4912345",
    "tel:",
    "mailto:a@b.com",
]


def test_skip_by_path_parity(ref):
    for u in URLS:
        assert urlnorm.skip_by_path(u) == ref["should_skip_url_by_path"](u), u


def test_is_probably_html_parity(ref):
    for ct in ["text/html", "text/html; charset=utf-8", "application/xhtml+xml",
               "TEXT/HTML", "application/json", "", "text/plain;x=y"]:
        assert urlnorm.is_probably_html(ct) == ref["is_probably_html"](ct), ct


def test_tracking_param_parity(ref):
    for k in ["utm_source", "UTM_X", "_hsenc", "vero_a", "ref", "refx", "gclid",
              "page", "id", "mc_cid", "cn-reloaded", "spm"]:
        assert urlnorm.is_tracking_param(k) == ref["_should_drop_param"](k), k


def test_normalize_path_parity(ref):
    for p in ["", "/", "//", "/a//b///c/", "/a/", "/a", "a/b/"]:
        assert urlnorm.normalize_path(p) == ref["_normalize_path"](p), p


def test_canonicalize_parity(ref):
    for base in URLS[:12]:
        for link in LINKS:
            ours = urlnorm.canonicalize(base, link, "example.com")
            theirs = ref["canonicalize_url"](base, link, scope_host="example.com")
            assert ours == theirs, (base, link, ours, theirs)


def test_struct_key_parity(ref):
    for u in URLS:
        assert urlnorm.struct_key(u) == ref["_url_struct_key"](u), u


def test_norm_text_parity(ref):
    for t in TEXTS:
        assert textnorm.norm_text(t) == ref["_norm_text"](t), t
        assert textnorm.decode_escapes(t) == ref["_decode_backslash_escapes"](t), t
        assert textnorm.strip_edge_punct(t) == ref["_strip_edge_punct"](t), t
        assert textnorm.trim_angle_brackets(t) == ref["_clean_angle_brackets"](t), t


def test_email_phone_regex_parity(ref):
    corpus = (
        "a@b.com logo@2x.png x@y.pngx c@d.co.uk under_score@e.org "
        "+30 210 123 4567 (212) 555-0199 12 34 567890 ext 5 "
        "user.name+tag@sub.example.museum q@file.json data@x.xml"
    )
    assert contacts.extract_emails(corpus) == ref["EMAIL_RE"].findall(corpus)
    assert contacts.extract_phones(corpus) == ref["PHONE_RE"].findall(corpus)


def test_mailto_tel_parity(ref):
    for href in MAILTOS:
        assert contacts.mailto_addresses(href) == ref["_extract_mailto_addresses"](href), href
    for href in TELS:
        assert contacts.tel_numbers(href) == ref["_extract_tel_numbers"](href), href


def test_canonicalize_property_parity(ref):
    """Randomized cross-check over generated URL space."""
    import itertools
    import random

    rnd = random.Random(42)
    hosts = ["example.com", "a.example.com", "x.org"]
    paths = ["", "/", "/p", "/p/", "/p//q", "/p.html", "/media/z", "/f.pdf"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=t&a=1", "?a=&b=1"]
    pool = [
        f"https://{h}{p}{q}" for h, p, q in itertools.product(hosts, paths, queries)
    ]
    for _ in range(300):
        base, link = rnd.choice(pool), rnd.choice(pool + LINKS)
        ours = urlnorm.canonicalize(base, link, "example.com")
        theirs = ref["canonicalize_url"](base, link, scope_host="example.com")
        assert ours == theirs, (base, link, ours, theirs)
        key_ours = urlnorm.struct_key(rnd.choice(pool))
        # struct key parity over the same pool element
    for u in pool:
        assert urlnorm.struct_key(u) == ref["_url_struct_key"](u), u
