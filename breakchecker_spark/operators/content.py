"""Boilerplate removal: block segmentation + link-density classification.

The classic main-content extractor for webtext training data (the
jusText / boilerpipe / trafilatura family, Kohlschütter et al. WSDM'10):
segment a page into block-level text runs, score each block by length
and link density, keep the content blocks, drop navigation / footer /
chrome. The reference has no such operator (it extracts contacts, not
corpora); this is a SURVEY.md "beyond the reference" op for the 100 TB
pipeline, where boilerplate is routinely 40-60% of raw crawl text.

Execution shape: the HTML parse is per-page Python (stdlib
``HTMLParser``, the same dependency-free approach as functions/htmlx),
so it runs inside Arrow-batched ``mapInPandas`` — one narrow pass,
embarrassingly parallel, no shuffle; the keep/drop rule itself is a
plain column predicate so callers can re-threshold the block table
with Catalyst filters without re-parsing.

Determinism contract (what the oracle pins): block text is the
whitespace-normalized concatenation of character data inside one
block-level element run; ``link_chars`` counts the normalized text
inside ``<a>`` descendants; blocks with no text are dropped; block
indexes number the emitted blocks per page in document order.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

# elements that START a new text block when opened or closed —
# the flat segmentation jusText uses (nested blocks flush the run)
_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 td th tr table article section "
    "header footer nav aside blockquote pre br".split()
)
# subtrees that never contribute visible text
_SKIP_TAGS = frozenset(("script", "style", "noscript", "template"))

BLOCK_SCHEMA = (
    "url string, block_idx int, text string, n_chars int, "
    "link_chars int, link_density double"
)


class _Segmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (normalized text, link chars)
        self._parts: list[str] = []
        self._link_parts: list[str] = []
        self._a_depth = 0
        self._skip_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            link = len(" ".join("".join(self._link_parts).split()))
            self.blocks.append((text, link))
        self._parts, self._link_parts = [], []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_parts.append(data)

    def close(self):
        super().close()
        self._flush()


def segment_blocks(html_doc: str) -> list[tuple[str, int]]:
    """Pure per-page segmentation: (normalized text, link chars) runs."""
    seg = _Segmenter()
    try:
        seg.feed(html_doc or "")
        seg.close()
    except Exception:
        pass  # salvage whatever parsed; broken markup is the web's norm
    return seg.blocks


def block_stats(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """``(url, html)`` pages → one BLOCK_SCHEMA row per text block.

    ``html`` may be binary (decoded as UTF-8) or string. Narrow
    Arrow-batched map — no shuffle; downstream keep/drop thresholds
    are plain Catalyst predicates over this table.
    """
    cols = pages.select(
        "url",
        F.col(html_col).cast("string").alias("_html"),
    )

    def _seg(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, html_doc in zip(pdf["url"], pdf["_html"]):
                for i, (text, link) in enumerate(segment_blocks(html_doc)):
                    n = len(text)
                    rows.append(
                        (url, i, text, n, link, (link / n) if n else 0.0)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "block_idx", "text", "n_chars",
                    "link_chars", "link_density",
                ],
            )

    return cols.mapInPandas(_seg, schema=BLOCK_SCHEMA)


def main_text(
    pages: DataFrame,
    html_col: str = "html",
    min_block_chars: int = 25,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Keep content blocks, drop chrome → ``(url, main_text, n_blocks,
    n_dropped)`` per page.

    The keep rule is the standard two-feature baseline: a block is
    content iff it is long enough AND not link-dominated. Kept blocks
    concatenate with ``\\n`` in document order (the ``block_idx`` sort
    rides the existing per-page grouping — one shuffle on url, same as
    any per-page rollup). Pages whose blocks all drop still emit a row
    (empty ``main_text``) so joins against the corpus stay total.
    """
    blocks = block_stats(pages, html_col=html_col)
    kept = (F.col("n_chars") >= min_block_chars) & (
        F.col("link_density") <= max_link_density
    )
    per_block = blocks.withColumn("_keep", kept)
    return (
        per_block.groupBy("url")
        .agg(
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN _keep THEN "
                    "struct(block_idx, text) END)), x -> x.text)"
                ),
            ).alias("main_text"),
            F.count("*").cast("int").alias("n_blocks"),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
            .cast("int")
            .alias("n_dropped"),
        )
    )
