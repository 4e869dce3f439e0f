"""Sitemap ingestion: the standard seed-discovery path for a crawler.

The reference seeds only from its config/CLI host list
(break_checker.py:1743-1760); real crawls at Common-Crawl scale also
seed from each host's published sitemaps — ``Sitemap:`` directives in
robots.txt (RFC 9309 §2.3 treats them as group-independent), then
``sitemap.xml`` urlsets and nested ``sitemapindex`` files (sitemaps.org
protocol, ≤50k URLs / 50 MB per file, nesting in practice ≤2-3 deep).

Everything here stays JVM-side Catalyst: sitemap XML is the flat,
rigidly-shaped dialect the protocol mandates, so records are split on
their closing tags and fields pulled with ``regexp_extract`` — one
narrow projection per sitemap row, no Python UDFs, no shuffle until
the final seed ``distinct``. At 10^6 hosts the sitemap tables are
millions of rows of short strings — a rounding error next to the
page corpus, but the parse still distributes because it is a plain
column expression.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from ..functions import udfs

# parsed sitemap entry: one row per <url> record
ENTRY_SCHEMA = "sitemap_url string, url string, lastmod string, priority string"


def _xml_unescape(col):
    """The five predefined XML entities; ``&amp;`` last so escaped
    ampersands can't cascade into a second round of substitution."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.regexp_replace(out, ent, ch)
    return out


def sitemap_urls_from_robots(robots_bodies: DataFrame) -> DataFrame:
    """``(host, body)`` robots.txt rows → ``(host, sitemap_url)``.

    ``Sitemap:`` lines sit outside user-agent groups (RFC 9309 — they
    apply regardless of agent), so this is a line filter, not a group
    parse: split on newlines, strip ``#`` comments, case-insensitive
    field match. Pure Catalyst.
    """
    line = F.explode(F.split(F.col("body"), "\r?\n")).alias("line")
    url = F.regexp_extract(
        F.split(F.col("line"), "#").getItem(0),
        r"(?i)^\s*sitemap\s*:\s*(\S+)",
        1,
    )
    return (
        robots_bodies.select("host", line)
        .select("host", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )


def _fragment_field(tag: str):
    """``<tag>…</tag>`` text from a record fragment, entity-unescaped,
    whitespace-trimmed (the protocol allows padding inside elements)."""
    raw = F.regexp_extract(F.col("frag"), rf"(?s)<{tag}[^>]*>(.*?)</{tag}>", 1)
    return F.when(raw != "", _xml_unescape(F.trim(raw)))


def parse_sitemap_entries(sitemaps: DataFrame) -> DataFrame:
    """``(sitemap_url, xml)`` urlset documents → ENTRY_SCHEMA rows.

    Splits on ``</url>`` closing tags so optional fields (lastmod,
    priority) stay aligned with their own ``<loc>`` — the failure mode
    of extracting parallel arrays with xpath. Records missing a
    ``<loc>`` are dropped per the protocol.
    """
    frags = sitemaps.select(
        "sitemap_url",
        F.explode(F.split(F.col("xml"), "</url>")).alias("frag"),
    ).filter(F.col("frag").contains("<loc"))
    return frags.select(
        "sitemap_url",
        _fragment_field("loc").alias("url"),
        _fragment_field("lastmod").alias("lastmod"),
        _fragment_field("priority").alias("priority"),
    ).filter(F.col("url").isNotNull())


def parse_sitemap_index(sitemaps: DataFrame) -> DataFrame:
    """``(sitemap_url, xml)`` sitemapindex documents → child
    ``(parent_url, sitemap_url)`` rows."""
    frags = sitemaps.select(
        F.col("sitemap_url").alias("parent_url"),
        F.explode(F.split(F.col("xml"), "</sitemap>")).alias("frag"),
    ).filter(F.col("frag").contains("<loc"))
    return frags.select(
        "parent_url", _fragment_field("loc").alias("sitemap_url")
    ).filter(F.col("sitemap_url").isNotNull())


def _is_index(xml_col):
    return xml_col.rlike("<\\s*sitemapindex[\\s>]")


def expand_sitemaps(
    sitemaps: DataFrame,
    fetch: Callable[[DataFrame], DataFrame],
    max_nesting: int = 3,
) -> DataFrame:
    """Resolve nested sitemapindex files down to entry rows.

    ``sitemaps`` is ``(sitemap_url, xml)``; ``fetch`` maps a
    ``(sitemap_url)`` DataFrame to fetched ``(sitemap_url, xml)`` rows
    (the live engine passes an HTTP fetcher; replay passes a join
    against a stored sitemap table). Nesting is driver-iterated but
    bounded by ``max_nesting`` (the protocol forbids index→index
    chains in practice; 3 covers the wild) — each level is one
    distributed parse + one fetch, no per-URL driver work.
    """
    level = sitemaps
    entries = None
    for _ in range(max_nesting + 1):
        leaf = level.filter(~_is_index(F.col("xml")))
        got = parse_sitemap_entries(leaf)
        entries = got if entries is None else entries.unionByName(got)
        idx = level.filter(_is_index(F.col("xml")))
        if idx.isEmpty():
            break
        children = parse_sitemap_index(idx).select("sitemap_url").distinct()
        level = fetch(children)
    return entries


def seeds_from_entries(entries: DataFrame, scope_host: str | None = None) -> DataFrame:
    """Entry rows → the engine's ``(host, scheme)`` seeds shape.

    One distinct per (host, scheme) — the crawl's own frontier dedup
    and scope filter handle everything finer. ``scope_host`` keeps
    only hosts under that suffix (the engine's in-scope rule), so a
    sitemap that lists off-site URLs can't seed an escape.
    """
    s = entries.select(
        udfs.url_host(F.col("url")).alias("host"),
        F.regexp_extract("url", r"^(https?)://", 1).alias("scheme"),
    ).filter((F.col("host") != "") & (F.col("scheme") != ""))
    if scope_host:
        suffix = scope_host.lower()
        s = s.filter(
            (F.col("host") == suffix) | F.col("host").endswith("." + suffix)
        )
    return s.distinct()
