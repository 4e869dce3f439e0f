"""URL canonicalization, structural dedup keys, and path-skip predicates.

Semantics pinned against the reference scanner:
  * canonicalize    — /root/reference/break_checker.py:890-953
  * struct_key      — /root/reference/break_checker.py:956-972
  * skip_by_path    — /root/reference/break_checker.py:411-444
  * tracking params — /root/reference/break_checker.py:846-867

These are fresh stdlib (urllib) implementations written from the
documented behavior; they are pure, deterministic, and import-safe so
they can run both driver-side and inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple
from urllib.parse import parse_qsl, urldefrag, urlencode, urljoin, urlparse, urlunparse

# File extensions that never carry crawlable HTML (reference
# break_checker.py:411-417).
ASSET_EXTENSIONS = frozenset(
    """pdf zip gz bz2 xz 7z rar exe msi dmg iso
       png jpg jpeg gif svg bmp webp ico
       mp3 mp4 m4a aac wav flac ogg webm
       avi mov mkv
       doc docx xls xlsx ppt pptx""".split()
)

# Path substrings that indicate a download/asset endpoint
# (reference break_checker.py:420-424).
DOWNLOADY_PATH_PARTS = (
    "/download/", "/downloads/", "/file/", "/files/", "/attachment/",
    "/attachments/", "/export/", "/exports/", "/wp-content/uploads/",
    "/media/", "/assets/", "/static/",
)

# Analytics/tracking query parameters dropped during canonicalization
# (reference break_checker.py:846-856).
TRACKER_PARAM_NAMES = frozenset(
    """utm_source utm_medium utm_campaign utm_term utm_content
       utm_id utm_reader utm_name utm_place utm_creative
       gclid dclid fbclid mc_cid mc_eid igshid
       ref_src ref_url ref mkt_tok spm cn-reloaded""".split()
)
TRACKER_PARAM_PREFIXES = ("utm_", "_hs", "vero_")

_MULTI_SLASH = re.compile(r"/{2,}")


def is_tracking_param(name: str) -> bool:
    """True when a query-parameter name is analytics noise.

    Reference: break_checker.py:859-867.
    """
    low = name.lower()
    return low in TRACKER_PARAM_NAMES or low.startswith(TRACKER_PARAM_PREFIXES)


def normalize_path(path: str) -> str:
    """Collapse repeated slashes; strip a trailing slash except at root.

    Reference: break_checker.py:870-887.
    """
    path = _MULTI_SLASH.sub("/", path)
    if path.endswith("/") and len(path) > 1:
        return path[:-1]
    return path


def skip_by_path(url: str) -> bool:
    """True when the URL path points at a non-HTML asset or download area.

    Reference: break_checker.py:427-444.
    """
    path = urlparse(url).path.lower()
    for part in DOWNLOADY_PATH_PARTS:
        if part in path:
            return True
    if "." in path:
        return path.rsplit(".", 1)[-1] in ASSET_EXTENSIONS
    return False


def is_probably_html(content_type: Optional[str]) -> bool:
    """True for text/html or application/xhtml+xml (charset ignored).

    Reference break_checker.py:447-460. In pure replay the pages table
    is HTML by construction; this predicate applies when the table
    models response headers (F3).
    """
    if not content_type:
        return False
    base = content_type.lower().split(";", 1)[0].strip()
    return base in ("text/html", "application/xhtml+xml")


def is_attachment(content_disposition: Optional[str]) -> bool:
    """True when a Content-Disposition header marks a download (F4).

    Reference break_checker.py:783-785.
    """
    return bool(content_disposition) and "attachment" in content_disposition.lower()


def canonicalize(base_url: str, link: str, scope_host: str) -> Optional[str]:
    """Resolve ``link`` against ``base_url`` and normalize to canonical form.

    Pipeline (reference break_checker.py:890-953):
    resolve → defrag → http(s) only → hostname must end with ``scope_host``
    → path: collapse ``//``, drop trailing slash → query: drop trackers +
    blank values, sort (k, v), re-encode → strip default ports → lowercase
    host → reassemble without params/fragment.

    Returns None for out-of-scope, non-http(s), or unparseable links.
    """
    if not link:
        return None
    link = link.strip()
    if link.startswith(("javascript:", "data:", "blob:")):
        return None
    try:
        resolved, _frag = urldefrag(urljoin(base_url, link))
        parts = urlparse(resolved)
        port = parts.port  # may raise ValueError on malformed netloc
    except Exception:
        return None

    if parts.scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host.endswith(scope_host):
        return None

    path = normalize_path(parts.path or "/")

    query = ""
    if parts.query:
        kept = [
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=False)
            if not is_tracking_param(k)
        ]
        if kept:
            kept.sort()
            query = urlencode(kept, doseq=True)

    default_port = (parts.scheme == "http" and port in (None, 80)) or (
        parts.scheme == "https" and port in (None, 443)
    )
    netloc = host if default_port or port is None else f"{host}:{port}"
    return urlunparse((parts.scheme, netloc, path, "", query, ""))


def struct_key(url: str) -> Tuple[str, str, Tuple[Tuple[str, str], ...]]:
    """Structural dedup key: collapses near-duplicate URLs.

    ``(lower host, path minus trailing '/' and '.html' suffix,
    first 5 sorted query pairs)`` — reference break_checker.py:956-972.
    """
    parts = urlparse(url)
    host = (parts.hostname or "").lower()
    path = (parts.path or "/").rstrip("/")
    if path.endswith(".html"):
        path = path[:-5] or "/"
    pairs = tuple(sorted(parse_qsl(parts.query, keep_blank_values=False)))[:5]
    return (host, path, pairs)


def struct_key_str(url: str) -> str:
    """Stable string form of :func:`struct_key` for hashing/joining.

    The Spark pipeline stores ``xxhash64(struct_key_str)`` in the seen
    table and feeds the same value to the bloom prefilter; the string
    form keeps the key order-insensitive to query-pair permutations.
    """
    host, path, pairs = struct_key(url)
    encoded_pairs = "&".join(f"{k}={v}" for k, v in pairs)
    return f"{host}\x1f{path}\x1f{encoded_pairs}"
