"""HTML harvesting: hrefs, script srcs, and visible-text derivation.

Stdlib :class:`html.parser.HTMLParser` replacement for the reference's
BeautifulSoup usage (/root/reference/break_checker.py:1379-1421):

  * anchor hrefs   — ``find_all("a", href=True)``       (bc:1385-1395, 1400-1403)
  * script srcs    — ``find_all("script", src=True)``   (bc:1412-1416)
  * text-with-sep  — ``soup.get_text(" ")``             (bc:1381-1383)

``get_text(" ")`` in bs4 joins every string node (including script
bodies) with a single separator; :func:`page_text` reproduces that:
each contiguous character-data run becomes one node, joined by " ".
Entity references are decoded (convert_charrefs), matching bs4's
``html.parser`` tree builder.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple


class _Harvester(HTMLParser):
    """Single-pass collector for hrefs, script srcs, and text nodes.

    ``collect_text=False`` skips text-node accumulation — the crawl hot
    path reads visible text from the pages table's authoritative
    ``text`` column, so the UDF only needs hrefs/srcs.
    """

    def __init__(self, collect_text: bool = True) -> None:
        super().__init__(convert_charrefs=True)
        self._collect_text = collect_text
        self.hrefs: List[str] = []
        self.script_srcs: List[str] = []
        self.text_nodes: List[str] = []
        # (href, collected_text) for the currently-open <a>, used to
        # reproduce the reference's tel-anchor snippet (bc:1407-1409).
        self._open_anchor: Optional[Tuple[str, List[str]]] = None
        self.anchors_with_text: List[Tuple[str, str]] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    if self._collect_text:
                        self._open_anchor = (value, [])
                    break
        elif tag == "script":
            for name, value in attrs:
                if name == "src" and value is not None:
                    self.script_srcs.append(value)
                    break

    def handle_endtag(self, tag):
        if tag == "a" and self._open_anchor is not None:
            href, chunks = self._open_anchor
            self.anchors_with_text.append((href, " ".join(" ".join(chunks).split())))
            self._open_anchor = None

    def handle_data(self, data):
        if data and self._collect_text:
            self.text_nodes.append(data)
            if self._open_anchor is not None:
                self._open_anchor[1].append(data)


def harvest(html_doc: str, collect_text: bool = True) -> _Harvester:
    """Parse once; return the populated harvester (errors swallowed)."""
    h = _Harvester(collect_text=collect_text)
    try:
        h.feed(html_doc)
        h.close()
    except Exception:
        pass
    return h


def page_text(html_doc: str) -> str:
    """All character data joined with a single space (bs4 ``get_text(" ")``).

    This is the derivation of the pages table's ``text`` column and the
    second extraction pass that finds emails split across tags
    (reference break_checker.py:1381-1383).
    """
    return " ".join(harvest(html_doc).text_nodes)


def anchor_hrefs(html_doc: str) -> List[str]:
    """All ``<a href=...>`` values in document order."""
    return harvest(html_doc).hrefs


def script_srcs(html_doc: str) -> List[str]:
    """All ``<script src=...>`` values in document order."""
    return harvest(html_doc).script_srcs
