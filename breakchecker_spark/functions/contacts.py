"""Email/phone extraction + normalization and org-scope filtering.

Pinned against the reference (/root/reference/break_checker.py):
  * email regex (ext-lookahead)   — break_checker.py:978-988
  * phone regex                   — break_checker.py:991
  * TLD → region map              — break_checker.py:994-1013
  * email normalization           — break_checker.py:1089-1105
  * phone normalization           — break_checker.py:1108-1134
  * mailto:/tel: parsing          — break_checker.py:1137-1196
  * org-scope filter              — break_checker.py:1259-1276

Documented deviations (this sandbox ships neither ``email_validator``,
``phonenumbers`` nor ``tldextract`` — stdlib-only replacements):

* **Email validity** is a deterministic RFC-lite syntactic check
  (the reference delegates to ``email_validator``); deliverability/DNS
  checks are pinned OFF for hermeticity (SURVEY.md §7.3).
* **Phone validity** uses an embedded mini phone-metadata table
  (country calling code, national-number length set, trunk prefix) for
  the regions the reference's TLD map covers, instead of libphonenumber.
  Output format matches the reference contract: digits-only NATIONAL
  representation, minimum 7 digits.
* **Registered domain** uses an embedded subset of the Public Suffix
  List covering common multi-label suffixes, instead of tldextract.
"""

from __future__ import annotations

import re
from typing import List, Optional
from urllib.parse import parse_qs, unquote

from .textnorm import norm_text, strip_edge_punct, trim_angle_brackets

# ---------------------------------------------------------------- regexes

# File extensions that must not be mistaken for email TLDs
# (reference break_checker.py:978-982).
_EMAIL_BAD_TLDS = (
    "png", "jpg", "jpeg", "gif", "svg", "bmp", "webp", "ico",
    "css", "js", "json", "xml", "csv", "txt", "pdf",
    "doc", "docx", "xls", "xlsx",
)

# Negative lookahead keeps ``logo@2x.png``-style strings out
# (reference break_checker.py:985-988). Java regex (Spark's
# regexp_extract_all) supports the same lookahead syntax.
EMAIL_PATTERN = (
    r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.(?!(?:"
    + "|".join(_EMAIL_BAD_TLDS)
    + r")\b)[a-zA-Z]{2,}"
)
EMAIL_RE = re.compile(EMAIL_PATTERN)

# Tolerant digit-run matcher (reference break_checker.py:991).
PHONE_PATTERN = r"\+?\d[\d\s()\-]{6,}\d"
PHONE_RE = re.compile(PHONE_PATTERN)

# ------------------------------------------------------- region guessing

# ccTLD → default phone region (reference break_checker.py:994-1000).
TLD_REGION = {
    "gr": "GR", "us": "US", "uk": "GB", "gb": "GB", "de": "DE", "fr": "FR",
    "it": "IT", "es": "ES", "pt": "PT", "nl": "NL", "be": "BE", "se": "SE",
    "no": "NO", "fi": "FI", "dk": "DK", "pl": "PL", "cz": "CZ", "sk": "SK",
    "hu": "HU", "ro": "RO", "bg": "BG", "at": "AT", "ch": "CH", "ie": "IE",
    "tr": "TR", "ua": "UA", "ru": "RU", "il": "IL", "ca": "CA", "au": "AU",
    "nz": "NZ", "mx": "MX", "br": "BR", "ar": "AR", "cl": "CL", "co": "CO",
    "za": "ZA", "in": "IN", "sg": "SG", "hk": "HK", "tw": "TW", "jp": "JP",
    "kr": "KR", "my": "MY", "id": "ID", "th": "TH", "ph": "PH", "vn": "VN",
}


def region_for_domain(domain: str) -> Optional[str]:
    """Default phone region from a domain's last label.

    Reference break_checker.py:1003-1013.
    """
    return TLD_REGION.get(domain.rsplit(".", 1)[-1].lower())


# ------------------------------------------------------ registered domain

# Embedded multi-label public-suffix subset (tldextract replacement).
_MULTI_SUFFIXES = frozenset(
    """co.uk org.uk ac.uk gov.uk me.uk net.uk
       com.au net.au org.au edu.au gov.au
       co.jp ne.jp or.jp ac.jp go.jp
       com.br net.br org.br gov.br
       co.in net.in org.in gen.in firm.in
       com.gr net.gr org.gr edu.gr gov.gr
       com.mx org.mx net.mx
       com.ar com.sg com.hk com.tw co.kr co.za com.tr com.cn com.my
       co.nz net.nz org.nz com.ph com.vn com.co com.cl""".split()
)


def registered_domain(hostname: str) -> str:
    """Organization-level domain: eTLD+1 under an embedded PSL subset.

    ``mail.sub.example.co.uk`` → ``example.co.uk``;
    ``a.b.example.com`` → ``example.com``. Empty string when the name
    has no dot-separated suffix (reference uses tldextract's
    ``top_domain_under_public_suffix``, break_checker.py:1234-1237).
    """
    labels = hostname.lower().strip(".").split(".")
    if len(labels) < 2:
        return ""
    if len(labels) >= 3 and ".".join(labels[-2:]) in _MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


# ------------------------------------------------------------ email side

_LOCAL_OK = re.compile(r"^[A-Za-z0-9!#$%&'*+/=?^_`{|}~.\-]+$")
_LABEL_OK = re.compile(r"^[A-Za-z0-9]([A-Za-z0-9\-]*[A-Za-z0-9])?$")


def _is_valid_email(addr: str) -> bool:
    """RFC-lite syntactic validation (email_validator replacement).

    Checks: single ``@``; local part ≤64 chars of atext/dots without
    leading/trailing/double dots; domain ≤253 chars of valid labels with
    an alphabetic TLD of ≥2 chars; total ≤254.
    """
    if len(addr) > 254 or addr.count("@") != 1:
        return False
    local, domain = addr.rsplit("@", 1)
    if not local or len(local) > 64 or not _LOCAL_OK.match(local):
        return False
    if local.startswith(".") or local.endswith(".") or ".." in local:
        return False
    if not domain or len(domain) > 253 or "." not in domain:
        return False
    labels = domain.split(".")
    if any(not lbl or len(lbl) > 63 or not _LABEL_OK.match(lbl) for lbl in labels):
        return False
    return len(labels[-1]) >= 2 and labels[-1].isalpha()


def normalize_email(raw: str) -> Optional[str]:
    """Unquote → strip wrappers → norm_text → lowercase → validate.

    Returns the canonical lower-case address or None
    (reference break_checker.py:1089-1105; deliverability pinned off).
    """
    candidate = strip_edge_punct(norm_text(unquote(raw.strip()))).lower()
    return candidate if _is_valid_email(candidate) else None


def email_org(canonical_email: str) -> str:
    """Registered domain of a canonical email's domain part.

    Reference break_checker.py:1259-1264.
    """
    return registered_domain(canonical_email.rsplit("@", 1)[-1])


# ------------------------------------------------------------ phone side

# Mini phone metadata: region → (calling code, allowed national-number
# lengths, national format keeps trunk '0'?). Stdlib replacement for
# libphonenumber, covering the reference's TLD-region map. Lengths are
# the common national significant number (NSN) lengths per ITU plans.
_PHONE_META = {
    "US": ("1", {10}, False), "CA": ("1", {10}, False),
    "GB": ("44", {9, 10}, True), "DE": ("49", {6, 7, 8, 9, 10, 11}, True),
    "FR": ("33", {9}, True), "IT": ("39", {8, 9, 10, 11}, False),
    "ES": ("34", {9}, False), "PT": ("351", {9}, False),
    "NL": ("31", {9}, True), "BE": ("32", {8, 9}, True),
    "SE": ("46", {7, 8, 9, 10}, True), "NO": ("47", {8}, False),
    "FI": ("358", {6, 7, 8, 9, 10}, True), "DK": ("45", {8}, False),
    "PL": ("48", {9}, False), "CZ": ("420", {9}, False),
    "SK": ("421", {9}, True), "HU": ("36", {8, 9}, False),
    "RO": ("40", {9}, True), "BG": ("359", {7, 8, 9}, True),
    "AT": ("43", {7, 8, 9, 10, 11}, True), "CH": ("41", {9}, True),
    "IE": ("353", {7, 8, 9}, True), "TR": ("90", {10}, True),
    "UA": ("380", {9}, True), "RU": ("7", {10}, False),
    "IL": ("972", {8, 9}, True), "AU": ("61", {9}, True),
    "NZ": ("64", {8, 9, 10}, True), "MX": ("52", {10}, False),
    "BR": ("55", {10, 11}, False), "AR": ("54", {10}, False),
    "CL": ("56", {9}, False), "CO": ("57", {10}, False),
    "ZA": ("27", {9}, True), "IN": ("91", {10}, False),
    "SG": ("65", {8}, False), "HK": ("852", {8}, False),
    "TW": ("886", {8, 9}, True), "JP": ("81", {9, 10}, True),
    "KR": ("82", {8, 9, 10}, True), "MY": ("60", {8, 9, 10}, True),
    "ID": ("62", {8, 9, 10, 11}, True), "TH": ("66", {8, 9}, True),
    "PH": ("63", {8, 9, 10}, True), "VN": ("84", {9, 10}, True),
    "GR": ("30", {10}, False),
}
# Longest-prefix lookup: calling code → region (first region wins for
# shared codes, e.g. +1 → US).
_CC_REGION: dict = {}
for _region, (_cc, _lens, _trunk) in _PHONE_META.items():
    _CC_REGION.setdefault(_cc, _region)
_CC_BY_LENGTH = sorted(_CC_REGION, key=len, reverse=True)

_NON_DIGIT = re.compile(r"\D")
_PHONE_CHARS_OK = re.compile(r"^\+?[\d\s().\-]+$")


def _national_digits(region: str, nsn: str) -> Optional[str]:
    """Digits-only national form when nsn is valid for the region."""
    cc, lengths, trunk = _PHONE_META[region]
    if len(nsn) not in lengths:
        return None
    digits = ("0" + nsn) if trunk else nsn
    return digits if len(digits) >= 7 else None


def normalize_phone(raw: str, default_region: Optional[str] = None) -> Optional[str]:
    """Normalize to digits-only national format; None when invalid.

    Mirrors the reference's try-order (break_checker.py:1108-1134):
    ``+``-prefixed input parses as E.164 first, then falls back to the
    region hint; other input requires the region hint. Validation is
    the embedded metadata table (see module docstring deviation note).
    """
    raw = raw.strip()
    if not raw or not _PHONE_CHARS_OK.match(raw):
        return None
    has_plus = raw.startswith("+")
    digits = _NON_DIGIT.sub("", raw)
    if not digits:
        return None

    attempts = []
    if has_plus:
        attempts.append("E164")
        if default_region:
            attempts.append(default_region)
    elif default_region:
        attempts.append(default_region)

    for attempt in attempts:
        if attempt == "E164":
            for cc in _CC_BY_LENGTH:
                if digits.startswith(cc):
                    out = _national_digits(_CC_REGION[cc], digits[len(cc):])
                    if out:
                        return out
        else:
            meta = _PHONE_META.get(attempt)
            if meta is None:
                continue
            cc, lengths, trunk = meta
            nsn = digits
            # National dialing usually writes the trunk prefix; strip it
            # before length validation (e.g. GB 020... → NSN 20...).
            if trunk and nsn.startswith("0"):
                nsn = nsn.lstrip("0") if len(nsn.lstrip("0")) in lengths else nsn[1:]
            out = _national_digits(attempt, nsn)
            if out:
                return out
    return None


# ------------------------------------------------------- mailto: / tel:

_LIST_SPLIT = re.compile(r"[;,]")


def mailto_addresses(href: str) -> List[str]:
    """Addresses from a ``mailto:`` href, incl. ``?to=/cc=/bcc=`` lists.

    Reference break_checker.py:1137-1170. Returns raw (unvalidated)
    candidates; may be empty.
    """
    out: List[str] = []
    h = href.strip()
    if not h.lower().startswith("mailto:"):
        return out
    rest = h.split(":", 1)[1]
    if rest.startswith("//"):
        rest = rest.lstrip("/")
    addresses, _, query = rest.partition("?")
    addresses = trim_angle_brackets(unquote(addresses)).strip()
    if addresses:
        out.extend(_LIST_SPLIT.split(addresses))
    if query:
        try:
            params = parse_qs(query)
        except Exception:
            params = {}
        for key in ("to", "cc", "bcc"):
            for item in params.get(key, []):
                out.extend(_LIST_SPLIT.split(unquote(item)))
    return [a.strip() for a in out if a and a.strip()]


def tel_numbers(href: str) -> List[str]:
    """Phone candidate from a ``tel:`` href (query stripped).

    Reference break_checker.py:1173-1196.
    """
    h = href.strip()
    if not h.lower().startswith("tel:"):
        return []
    rest = h.split(":", 1)[1]
    if rest.startswith("//"):
        rest = rest.lstrip("/")
    number, _, _ = rest.partition("?")
    return [unquote(number.strip())]


# ----------------------------------------------------------- extraction


def extract_emails(text: str) -> List[str]:
    """All raw email candidates in normalized text (order of appearance)."""
    return EMAIL_RE.findall(text)


def extract_phones(text: str) -> List[str]:
    """All raw phone candidates in normalized text (order of appearance)."""
    return PHONE_RE.findall(text)
