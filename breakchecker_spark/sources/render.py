"""S7 browser render as a distributed second-pass operator.

The reference renders every HTML page in a headless Chromium via a
shared Playwright context (`_render_with_pw`,
/root/reference/break_checker.py:669-740) with a content-readiness
ladder (`get_stable_content`, bc:463-539: DOMContentLoaded snapshot →
short hydration wait → one networkidle window, accepting the first
snapshot whose visible text reaches ``min_text_len=80``), an
asset-blocking route (bc:636-639) and a one-shot self-heal restart
when the browser dies (bc:718-736).

Spark-first re-expression — render is the *expensive* rung of the
fetch ladder, so it becomes a separate, Catalyst-gated pass instead of
a per-URL inline call:

* ``needs_render`` is the readiness heuristic as a JVM-side predicate:
  a fetched page whose plain-GET visible text is shorter than
  ``min_text_len`` and whose html carries ``<script`` is exactly the
  page a browser pass would improve (SURVEY.md §2 S7 notes). Pages
  that already look real never cross into Python.
* ``render_pages`` host-partitions the gated rows (one browser context
  per task serves whole hosts — the reference's single shared context,
  sharded) and runs the renderer inside ``mapInPandas``; every other
  column passes through, and (html, text) are rewritten from the
  rendered DOM with ``render_error`` carrying the classifier label on
  failure.
* The browser itself is NOT available in this sandbox (no playwright
  package, no Chromium): ``playwright_renderer_factory`` is the real
  executor-side wiring but raises ``NotImplementedError`` with a clear
  message when playwright is missing. The plumbing — gate, schema,
  partitioning, batch shape, text re-derivation, crawl integration —
  is real and tested end-to-end with ``fake_js_renderer_factory``, a
  deterministic stand-in that executes ``document.write`` calls the
  way a browser would materialize them into the DOM.

``rendering_fetcher`` composes fetch → render into one callable for
``run_crawl(fetcher=...)`` live mode, so rendered pages flow through
extraction identically to replay rows (tests/test_render.py proves a
contact that only exists post-render is found iff rendering is on —
the reference's reason for rendering at all).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import htmlx
from . import fetcher as fetcher_mod

#: reference content-readiness threshold (break_checker.py:469)
MIN_TEXT_LEN = 80

# A renderer takes (url, unrendered_html) and returns the rendered DOM
# serialization, or None when rendering adds nothing / fails silently.
Renderer = Callable[[str, Optional[str]], Optional[str]]
#: constructed INSIDE each executor task so browser handles never ride
#: in pickled closures (the reference's module-global context, per-task)
RendererFactory = Callable[[], Renderer]


def first_stable(
    snapshots: Sequence[Tuple[Optional[str], int]],
    min_text_len: int = MIN_TEXT_LEN,
) -> Optional[str]:
    """The `get_stable_content` acceptance rule as a pure function.

    The reference takes DOM snapshots at escalating wait rungs
    (DOMContentLoaded → hydration pause → networkidle,
    break_checker.py:505-535) and returns the FIRST snapshot whose
    visible-text length reaches ``min_text_len``; if no snapshot ever
    stabilizes it returns None. Factoring the decision out of the
    async loop lets both the real renderer and tests share it.
    """
    for html_doc, text_len in snapshots:
        if html_doc and text_len >= min_text_len:
            return html_doc
    return None


def needs_render(
    html_col="html", text_col="text", min_text_len: int = MIN_TEXT_LEN
):
    """JVM predicate: pages a browser pass would improve.

    The reference renders all HTML; in the distributed ladder the
    render pass is reserved for pages whose plain GET looks deficient —
    visible text below the reference's ``min_text_len`` readiness
    threshold (bc:469) while the html carries script machinery that a
    browser would execute. Evaluated by Catalyst, so well-rendered
    pages never reach the Python renderer.
    """
    html_c = F.col(html_col) if isinstance(html_col, str) else html_col
    text_c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        html_c.isNotNull()
        & (F.length(F.trim(F.coalesce(text_c, F.lit("")))) < min_text_len)
        & (F.instr(F.lower(html_c.cast("string")), "<script") > 0)
    )


def playwright_renderer_factory(
    *,
    nav_timeout_ms: int = 25_000,
    total_ms: int = 18_000,
    hydrate_ms: int = 250,
    idle_ms: int = 1_500,
    min_text_len: int = MIN_TEXT_LEN,
) -> RendererFactory:
    """Real S7 renderer wiring: one headless-Chromium context per task.

    Mirrors `_ensure_pw_started`/`_render_with_pw`
    (break_checker.py:617-736): asset-blocking route, ``commit``
    navigation, the `get_stable_content` snapshot ladder, and a single
    self-heal restart when the browser dies.

    NOT RUNNABLE HERE: the ``playwright`` package (and a Chromium
    binary) is not installed in this environment, so this factory
    raises ``NotImplementedError`` up front. The distributed plumbing
    it plugs into (``render_pages``) is real and fully tested with
    ``fake_js_renderer_factory``; on a cluster with playwright
    installed this factory is the drop-in production renderer.
    """
    try:
        import playwright  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "S7 browser rendering needs the 'playwright' package and a "
            "Chromium binary; neither is installed in this environment. "
            "The render_pages plumbing is real — plug in any "
            "(url, html) -> rendered-html callable via renderer_factory "
            "(see fake_js_renderer_factory for the tested shape)."
        ) from exc

    def factory() -> Renderer:  # pragma: no cover - needs a browser
        from playwright.sync_api import sync_playwright

        state: dict = {}

        def _start() -> None:
            pw = sync_playwright().start()
            browser = pw.chromium.launch(headless=True)
            ctx = browser.new_context(
                ignore_https_errors=True,
                bypass_csp=True,
                locale="en-US",
                timezone_id="UTC",
            )
            # block heavy assets, as bc:636-639
            ctx.route(
                "**/*",
                lambda route: route.abort()
                if route.request.resource_type in {"image", "media", "font"}
                else route.continue_(),
            )
            state.update(pw=pw, browser=browser, ctx=ctx)

        def _stop() -> None:
            for key in ("ctx", "browser"):
                try:
                    state.pop(key).close()
                except Exception:
                    pass
            try:
                state.pop("pw").stop()
            except Exception:
                pass

        def _once(url: str) -> Optional[str]:
            page = state["ctx"].new_page()
            try:
                page.goto(url, timeout=nav_timeout_ms, wait_until="commit")
                snaps = []
                for wait in ("domcontentloaded", None, "networkidle"):
                    try:
                        if wait is None:
                            page.wait_for_timeout(hydrate_ms)
                        else:
                            page.wait_for_load_state(
                                wait,
                                timeout=idle_ms
                                if wait == "networkidle"
                                else 2_000,
                            )
                    except Exception:
                        pass
                    tl = page.evaluate(
                        "document.body && document.body.innerText"
                        " ? document.body.innerText.length : 0"
                    )
                    snaps.append((page.content(), int(tl)))
                stable = first_stable(snaps, min_text_len)
                return stable if stable is not None else snaps[-1][0]
            finally:
                try:
                    page.close()
                except Exception:
                    pass

        _start()

        def _render(url: str, html_doc: Optional[str]) -> Optional[str]:
            # one self-heal restart, as bc:718-736
            for attempt in (0, 1):
                try:
                    return _once(url)
                except Exception:
                    if attempt == 0:
                        _stop()
                        _start()
            return None

        return _render

    return factory


_DOC_WRITE_RE = re.compile(
    r'<script>document\.write\(("[^"]*"(?:\s*\+\s*"[^"]*")*)\)</script>'
)
_STR_LIT_RE = re.compile(r'"([^"]*)"')


def fake_js_renderer_factory() -> RendererFactory:
    """Deterministic browser stand-in for tests and the oracle gate.

    Models the one DOM effect the crawl cares about: client-side
    script execution materializing text into the document. Each
    ``<script>document.write("X" [+ "Y"...])</script>`` block becomes
    ``<div>XY</div>`` — what a browser's serialized DOM shows after the
    write, with JS string concatenation evaluated (so content split
    across literals, invisible to a regex over the raw html, exists
    only post-render — the discriminating case for the e2e test).
    Pages with no such script return None (rendering adds nothing),
    exercising the keep-original path. Pure function of (url, html):
    both Spark and the DuckDB oracle can compute the outcome
    independently, putting the REAL render plumbing under the hash
    gate (queries.render_fallback_pass).
    """

    def factory() -> Renderer:
        def _render(url: str, html_doc: Optional[str]) -> Optional[str]:
            if not html_doc:
                return None

            def _write(m: "re.Match[str]") -> str:
                payload = "".join(_STR_LIT_RE.findall(m.group(1)))
                return f"<div>{payload}</div>"

            rendered, n = _DOC_WRITE_RE.subn(_write, html_doc)
            return rendered if n else None

        return _render

    return factory


def render_pages(
    pages: DataFrame,
    renderer_factory: RendererFactory,
    *,
    min_text_len: int = MIN_TEXT_LEN,
    render_all: bool = False,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed render pass: upgrade deficient pages via a browser.

    Input needs (url, html, text); every other column passes through
    unchanged. Output = input columns + ``rendered`` boolean +
    ``render_error`` string. Rows failing the ``needs_render`` gate
    (unless ``render_all``) are routed around Python entirely by a
    Catalyst filter; gated rows are repartitioned by host (when a
    ``host`` column exists) so one browser context per task serves
    whole hosts — the sharded analogue of the reference's single
    shared Playwright context (bc:607-639).

    For rendered rows, ``html`` is replaced by the rendered DOM and
    ``text`` re-derived via ``htmlx.page_text`` (the same derivation
    the pages table's text column uses), so downstream extraction is
    oblivious to how the page was obtained. A renderer returning None
    keeps the original row (rendered=false); a renderer raising is
    classified into ``render_error`` with the fetch error labels.
    """
    gate = needs_render(min_text_len=min_text_len)
    need = pages if render_all else pages.filter(gate)
    keep = None if render_all else pages.filter(~gate | gate.isNull())

    out_schema = T.StructType(
        list(pages.schema.fields)
        + [
            T.StructField("rendered", T.BooleanType(), False),
            T.StructField("render_error", T.StringType(), True),
        ]
    )
    html_is_binary = isinstance(
        pages.schema["html"].dataType, T.BinaryType
    )
    col_names = [f.name for f in out_schema.fields]

    if "host" in pages.columns:
        need = (
            need.repartition(partitions, "host")
            if partitions
            else need.repartition("host")
        )

    def _render_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        render = renderer_factory()
        for pdf in batches:
            rendered_flags = []
            errors = []
            htmls = list(pdf["html"])
            texts = list(pdf["text"])
            for i, (url, html_doc) in enumerate(zip(pdf["url"], htmls)):
                raw = html_doc
                if isinstance(raw, (bytes, bytearray)):
                    raw = bytes(raw).decode("utf-8", errors="replace")
                try:
                    new_html = render(url, raw)
                except Exception as exc:  # noqa: BLE001 — classify per row
                    rendered_flags.append(False)
                    errors.append(fetcher_mod.classify_net_error(exc))
                    continue
                if new_html is None or new_html == raw:
                    rendered_flags.append(False)
                    errors.append(None)
                    continue
                htmls[i] = (
                    new_html.encode("utf-8") if html_is_binary else new_html
                )
                texts[i] = htmlx.page_text(new_html)
                rendered_flags.append(True)
                errors.append(None)
            out = pdf.copy()
            out["html"] = htmls
            out["text"] = texts
            out["rendered"] = pd.Series(rendered_flags, dtype="bool")
            out["render_error"] = pd.Series(errors, dtype="object")
            yield out[col_names]

    rendered_df = need.mapInPandas(_render_batches, out_schema)
    if keep is None:
        return rendered_df
    kept = keep.withColumn("rendered", F.lit(False)).withColumn(
        "render_error", F.lit(None).cast("string")
    )
    return kept.unionByName(rendered_df)


def rendering_fetcher(
    renderer_factory: RendererFactory,
    *,
    fetch_kwargs: Optional[dict] = None,
    render_kwargs: Optional[dict] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Compose live fetch + render for ``run_crawl(fetcher=...)``.

    The reference's fetch_url escalates HTML to the browser inline
    (bc:742-839); here the escalation is a second DataFrame pass over
    the fetched rows that failed the readiness check, preserving the
    FETCH_SCHEMA columns run_crawl consumes (error strikes, html/text
    extraction input).
    """
    fk = dict(fetch_kwargs or {})
    rk = dict(render_kwargs or {})

    def _fetch(frontier: DataFrame) -> DataFrame:
        fetched = fetcher_mod.fetch_pages(frontier, **fk)
        return render_pages(fetched, renderer_factory, **rk).drop(
            "rendered", "render_error"
        )

    return _fetch
