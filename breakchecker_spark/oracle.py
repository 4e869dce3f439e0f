"""Single-threaded reference-semantics crawl simulator (test oracle).

Implements the reference crawler's observable behavior
(/root/reference/break_checker.py:1319-1444) directly over an in-memory
pages dict, with the same determinism pins the Spark engine uses
(SURVEY.md §7): all seeds at depth 0, level-synchronous BFS, candidate
order (depth, url). The e2e tests compare the distributed engine's
url_seen / frontier-by-depth / contacts tables against this simulator —
the scalar functions are shared (they carry their own golden-vector
tests); what this validates independently is the distributed
orchestration: seen-set joins, depth gating, politeness carry-over,
dedup and attribution.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from .functions import contacts as cfn
from .functions import htmlx, textnorm, urlnorm


@dataclass
class SimResult:
    visited: Dict[str, int] = field(default_factory=dict)  # url -> depth
    emails: Dict[str, Tuple[int, str]] = field(default_factory=dict)  # id -> (depth, src)
    phones: Dict[str, Tuple[int, str]] = field(default_factory=dict)
    emails_dropped: int = 0
    phones_dropped: int = 0
    by_depth: Dict[int, Set[str]] = field(default_factory=dict)


def _fetch_key(url: str) -> str:
    scheme_host = url.split("://", 1)
    if len(scheme_host) == 2 and "/" not in scheme_host[1]:
        return url + "/"
    return url


def simulate_crawl(
    pages: Dict[str, str],
    seeds: List[Tuple[str, str]],  # (host, scheme)
    scope_host: str,
    max_depth: int,
    host_budget: Optional[int] = None,
    robots: Optional[List[Tuple[str, str]]] = None,  # (host, disallow_prefix)
    page_texts: Optional[Dict[str, str]] = None,
) -> SimResult:
    """Level-synchronous BFS with per-host budget carry-over."""
    res = SimResult()
    org = cfn.registered_domain(scope_host)
    region = cfn.region_for_domain(scope_host)
    robots = robots or []

    def blocked(url: str) -> bool:
        from urllib.parse import urlparse

        p = urlparse(url)
        host = (p.hostname or "").lower()
        path = p.path or "/"
        return any(h == host and path.startswith(pref) for h, pref in robots)

    def add_email(raw: str, source: str, depth: int) -> None:
        canon = cfn.normalize_email(raw)
        if canon is None or cfn.email_org(canon) != org:
            res.emails_dropped += 1
            return
        prev = res.emails.get(canon)
        cand = (depth, source)
        if prev is None or cand < prev:
            res.emails[canon] = cand

    def add_phone(raw: str, source: str, depth: int) -> None:
        norm = cfn.normalize_phone(raw, region)
        if norm is None:
            res.phones_dropped += 1
            return
        prev = res.phones.get(norm)
        cand = (depth, source)
        if prev is None or cand < prev:
            res.phones[norm] = cand

    def extract(text: str, source: str, depth: int, allow_phones: bool) -> None:
        normed = textnorm.norm_text(text)
        for e in cfn.extract_emails(normed):
            add_email(e, source, depth)
        if allow_phones:
            for p in cfn.extract_phones(normed):
                add_phone(p, source, depth)

    seen_keys: Set[str] = set()
    queued: Set[str] = set()
    frontier: List[Tuple[str, int]] = []
    for host, scheme in sorted(seeds):
        url = f"{scheme}://{host.lower()}"
        frontier.append((url, 0))
        queued.add(url)

    while frontier:
        # Round pipeline pinned to match the engine exactly:
        # (1) collapse to one URL per struct key in (depth, url) order,
        #     skipping already-seen keys (dequeue re-check);
        # (2) robots drop; (3) per-host budget split.
        frontier.sort(key=lambda t: (t[1], t[0]))
        from urllib.parse import urlparse

        collapsed: List[Tuple[str, int]] = []
        taken_keys: Set[str] = set()
        for url, depth in frontier:
            key = urlnorm.struct_key_str(url)
            if key in seen_keys or key in taken_keys:
                continue
            taken_keys.add(key)
            collapsed.append((url, depth))

        eligible: List[Tuple[str, int]] = []
        deferred: List[Tuple[str, int]] = []
        per_host: Dict[str, int] = {}
        for url, depth in collapsed:
            if blocked(url):
                continue  # dropped this round; rediscovery re-drops
            host = (urlparse(url).hostname or "").lower()
            if host_budget is not None and per_host.get(host, 0) >= host_budget:
                deferred.append((url, depth))
                continue
            per_host[host] = per_host.get(host, 0) + 1
            eligible.append((url, depth))

        if not eligible and not deferred:
            break
        if not eligible:
            frontier = deferred
            continue

        next_frontier: List[Tuple[str, int]] = list(deferred)
        deferred_urls = {u for u, _ in deferred}
        for url, depth in eligible:
            seen_keys.add(urlnorm.struct_key_str(url))
            res.visited[url] = depth
            res.by_depth.setdefault(depth, set()).add(url)
            content = pages.get(_fetch_key(url))
            if content is None:
                continue
            from urllib.parse import urlparse

            path = urlparse(url).path.lower()
            if path.endswith((".js", ".mjs")):
                extract(content, url, depth, allow_phones=False)
                continue
            extract(content, url, depth, allow_phones=True)
            text_col = (
                page_texts.get(_fetch_key(url))
                if page_texts is not None
                else htmlx.page_text(content)
            )
            if text_col is not None:
                extract(text_col, url, depth, allow_phones=True)

            h = htmlx.harvest(content)
            for href in h.hrefs:
                low = href.strip().lower()
                if low.startswith("mailto:"):
                    for addr in cfn.mailto_addresses(href):
                        add_email(addr, url, depth)
                elif low.startswith("tel:"):
                    for num in cfn.tel_numbers(href):
                        add_phone(num, url, depth)

            if depth >= max_depth:
                continue
            link_cands = set()
            for href in h.hrefs:
                cand = urlnorm.canonicalize(url, href, scope_host)
                if cand and not urlnorm.skip_by_path(cand):
                    link_cands.add(cand)
            for src in h.script_srcs:
                cand = urlnorm.canonicalize(url, src, scope_host)
                if (
                    cand
                    and not urlnorm.skip_by_path(cand)
                    and cand.lower().endswith((".js", ".mjs"))
                ):
                    link_cands.add(cand)
            for cand in sorted(link_cands):
                k = urlnorm.struct_key_str(cand)
                if k in seen_keys or cand in queued or cand in deferred_urls:
                    continue
                queued.add(cand)
                next_frontier.append((cand, depth + 1))
        frontier = next_frontier
    return res
