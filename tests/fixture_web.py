"""Deterministic synthetic web graph for e2e crawl tests (FIXTURES.md §1).

Three in-scope hosts under example.com + one out-of-scope host. Covers:
link cycles, depth-overflow chains, struct-key near-duplicates,
mailto/tel forms, a .js asset with email+phone (phone must NOT be
extracted), out-of-org emails, split-across-tags emails, extension
false positives, skip-paths, javascript:/data: hrefs, tracking params,
and a subdomain reachable only via a link.
"""

from __future__ import annotations

import datetime
from typing import Dict, List, Tuple

from breakchecker_spark.functions import htmlx

SCOPE = "example.com"
SEEDS: List[Tuple[str, str]] = [("example.com", "https"), ("blog.example.com", "http")]


def _page(title: str, body: str) -> str:
    return f"<html><head><title>{title}</title></head><body>{body}</body></html>"


def build_pages() -> Dict[str, str]:
    """url (canonical fetch key) → html string."""
    p: Dict[str, str] = {}

    p["https://example.com/"] = _page(
        "Home",
        """
        <a href="/about">About</a>
        <a href="/contact.html">Contact</a>
        <a href="/products/">Products</a>
        <a href="https://blog.example.com/post1?utm_source=tw&ref=hp">Post</a>
        <a href="https://shop.example.com/">Shop</a>
        <a href="https://outside.org/page">Outside</a>
        <a href="javascript:void(0)">JS</a>
        <a href="data:text/plain;base64,xx">Data</a>
        <a href="/media/brochure">Brochure</a>
        <a href="/files/report.pdf">Report</a>
        <script src="/js/app.js"></script>
        <p>Welcome! Reach us at info@example.com or call +1 212 555 0199.</p>
        <p>Ignore logo@2x.png and sprite@3x.jpeg.</p>
        """,
    )
    p["https://example.com/about"] = _page(
        "About",
        """
        <a href="/">Home</a>
        <a href="/about">Self</a>
        <a href="//example.com//team//">Team</a>
        <p>CEO: ceo&#64;example.com</p>
        <p>HR: <b>hr</b>@example.com (tag-split: get_text(" ") inserts a
        space, so this is NOT extractable — faithful negative case)</p>
        <p>Partner: partner@gmail.com (out of org — dropped)</p>
        <a href="mailto:jobs@example.com?cc=talent@example.com;recruit@example.com">Jobs</a>
        """,
    )
    p["https://example.com/contact.html"] = _page(
        "Contact",
        """
        <a href="/contact">same struct key</a>
        <a href="tel:+12125550123">Call sales</a>
        <a href="tel://+12125550124?ext=1">Call support</a>
        <p>Office: (212) 555-0125 ext nothing</p>
        <p>Wrapped: &lt;sales@example.com&gt;</p>
        """,
    )
    p["https://example.com/team"] = _page(
        "Team",
        """
        <a href="/deep1">Deep chain</a>
        <p>team@sub.example.com counts (same org)</p>
        """,
    )
    p["https://example.com/products"] = _page(
        "Products",
        """
        <a href="/products?b=2&a=1&utm_campaign=x">sorted query</a>
        <a href="/products?a=1&b=2">same canonical</a>
        <a href="/item?f=6&e=5&d=4&c=3&b=2&a=1&g=7">many pairs</a>
        """,
    )
    p["https://example.com/item?a=1&b=2&c=3&d=4&e=5&f=6&g=7"] = _page(
        "Item", "<p>unique item page item@example.com</p>"
    )
    p["https://example.com/deep1"] = _page("D1", '<a href="/deep2">next</a>')
    p["https://example.com/deep2"] = _page("D2", '<a href="/deep3">next</a>')
    p["https://example.com/deep3"] = _page("D3", '<a href="/deep4">too deep</a>')
    p["https://example.com/deep4"] = _page("D4", "<p>never-reached@example.com</p>")
    p["https://example.com/js/app.js"] = (
        'var contact = "js_owner@example.com";\n'
        'var fake_phone = "+1 212 555 0888"; // must NOT be extracted\n'
        'var esc = "esc\\u0040example.com"; // decodes to esc@example.com — extracted\n'
    )
    p["http://blog.example.com/post1"] = _page(
        "Post1",
        """
        <a href="/post2#comments">Post2</a>
        <a href="http://blog.example.com/post1">cycle</a>
        <p>author: blogger@example.com</p>
        <p>Direct: 212 555 0321 is too ambiguous without +; region guess applies</p>
        """,
    )
    p["http://blog.example.com/post2"] = _page(
        "Post2",
        """
        <a href="http://blog.example.com:80/post1">cycle with default port</a>
        <p>editor&#64;example.com</p>
        """,
    )
    p["https://shop.example.com/"] = _page(
        "Shop",
        """
        <a href="/cart/">Cart</a>
        <p>orders@example.com</p>
        <p>支持: +30 210 123 4567</p>
        """,
    )
    p["https://shop.example.com/cart"] = _page(
        "Cart", "<p>cart is empty; cart-help@example.com</p>"
    )
    # out-of-scope page — must never be fetched
    p["https://outside.org/page"] = _page("Outside", "<p>secret@example.com</p>")
    return p


def pages_rows() -> List[tuple]:
    """Rows matching the pages schema (url, warc_ts, html, text, lang)."""
    base_ts = datetime.datetime(2025, 1, 1, 0, 0, 0)
    rows = []
    for i, (url, html_doc) in enumerate(sorted(build_pages().items())):
        text = htmlx.page_text(html_doc) if not url.endswith(".js") else html_doc
        rows.append(
            (
                url,
                base_ts + datetime.timedelta(minutes=i),
                html_doc.encode("utf-8"),
                text,
                "en",
            )
        )
    return rows
