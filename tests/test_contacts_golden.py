"""Golden vectors characterizing the contact-normalization surface.

The reference delegates email validity to ``email_validator``
(break_checker.py:1089-1105) and phone validity to ``phonenumbers``
(break_checker.py:1108-1134); neither library ships in this sandbox,
so the repo uses stdlib-exact replacements (functions/contacts.py
module docstring). These vectors pin the replacement's behavior on
adversarial inputs and document exactly where it is KNOWN to diverge
from the libraries — each divergence is tagged ``LIB-DIFF`` with the
library's expected answer, so the deviation corpus is characterized
rather than unknown (VERDICT r1, Missing #1/#2).

Every vector asserts the CURRENT output; a behavior change here is a
deliberate decision, not an accident.
"""

from __future__ import annotations

import pytest

from breakchecker_spark.functions import contacts

# ---------------------------------------------------------------- emails
# (raw, expected canonical or None)
EMAIL_VECTORS = [
    # plain + case folding + wrappers
    ("Info@Example.COM", "info@example.com"),
    ("  sales@example.org  ", "sales@example.org"),
    ("<wrapped@example.com>", "wrapped@example.com"),
    ("(paren@example.com)", "paren@example.com"),
    ("quoted%40example.com".replace("%40", "@"), "quoted@example.com"),
    ("pct%40example.com", "pct@example.com"),  # percent-encoded @
    # atext specials the RFC allows
    ("o'brien@example.ie", "o'brien@example.ie"),
    ("user+tag@example.com", "user+tag@example.com"),
    ("first.last@example.com", "first.last@example.com"),
    ("ok_underscore@example.com", "ok_underscore@example.com"),
    ("x!#$%&'*+/=?^_`{|}~y@example.com", "x!#$%&'*+/=?^_`{|}~y@example.com"),
    # dots in local part
    (".leadingdot@example.com", None),
    ("trailingdot.@example.com", None),
    ("double..dot@example.com", None),
    # domain shape
    ("user@localhost", None),  # no dot
    ("user@example.c", None),  # 1-char TLD
    ("user@example.123", None),  # numeric TLD
    ("user@-bad.example.com", None),  # label starts with hyphen
    ("user@bad-.example.com", None),  # label ends with hyphen
    ("user@sub.example.co.uk", "user@sub.example.co.uk"),
    ("user@example.museum", "user@example.museum"),
    # length limits
    ("a" * 64 + "@example.com", "a" * 64 + "@example.com"),
    ("a" * 65 + "@example.com", None),  # local > 64
    ("user@" + "b" * 64 + ".com", None),  # label > 63
    # multiple @
    ("a@b@example.com", None),
    ("", None),
    # LIB-DIFF: email_validator accepts IDN domains and folds them via
    # IDNA (münchen.de → xn--mnchen-3ya.de normalized form); the
    # RFC-lite check rejects all non-ASCII domains.
    ("user@münchen.de", None),
    ("üser@example.com", None),
    # LIB-DIFF: email_validator (check_deliverability=False) accepts
    # quoted local parts like "john smith"@example.com; RFC-lite has no
    # quoted-string support. The crawl regex never extracts these, so
    # the divergence is unreachable from page text.
    ('"john smith"@example.com', None),
    # file-extension lookalikes are rejected upstream by EMAIL_RE's
    # negative lookahead (never extracted from text); normalize_email
    # itself sees a syntactically valid shape — same as the reference,
    # whose email_validator also accepts ".png" as a TLD
    ("logo@2x.png", "logo@2x.png"),
    # ---- r5 adversarial extensions (VERDICT r4 item #6) ----
    # trailing root dot: both sides reject (email_validator refuses a
    # trailing dot even though DNS-wise it is the canonical root)
    ("user@example.com.", None),
    ("user@example.co.uk.", None),
    # case folding includes the TLD — both sides lowercase the domain
    ("user@EXAMPLE.Com", "user@example.com"),
    ("USER@EXAMPLE.COM", "user@example.com"),
    # already-IDNA-encoded domains are plain ASCII — both sides accept
    ("user@xn--mnchen-3ya.de", "user@xn--mnchen-3ya.de"),
    # LIB-DIFF: email_validator accepts punycode TLDs (xn--p1ai = .рф);
    # the RFC-lite TLD pattern requires an alphabetic final label and
    # rejects the digit-bearing xn--p1ai. Unreachable from EMAIL_RE
    # (same final-label alpha requirement), so the delta never
    # surfaces in crawl output.
    ("user@example.xn--p1ai", None),
    # LIB-DIFF: the RFC-lite cleaner strips zero-width/format chars
    # (ZWSP) before validating, so the mangled address is recovered;
    # email_validator rejects U+200B outright (invalid atext). Crawl
    # input hits this on copy-paste-mangled pages — the engine is
    # deliberately *more* forgiving here.
    ("user​@example.com", "user@example.com"),
    (" user@example.com ", "user@example.com"),  # NBSP trim
    # label rules both sides enforce
    ("user@under_score.example.com", None),  # _ not valid in a label
    ("user@.example.com", None),
    ("user@example..com", None),
    ("user@123.example.com", "user@123.example.com"),  # digit label ok
    ("user@example.c0m", None),  # digit in final label
    # forms only an address-header parser would accept — both sides
    # reject the bare string (display names / comments / literals are
    # upstream concerns; EMAIL_RE never yields them)
    ("John Smith <john@example.com>", None),
    ("user(comment)@example.com", None),
    ("user@[192.168.1.1]", None),
    ("mailto:user@example.com", None),  # scheme handled by X9, not here
]

# ---------------------------------------------------------------- phones
# (raw, default_region, expected digits-only national or None)
PHONE_VECTORS = [
    # --- NANP (+1) ---
    ("+1 212 555 0123", None, "2125550123"),
    ("+1 (212) 555-0123", None, "2125550123"),
    ("212-555-0123", "US", "2125550123"),
    ("2125550123", "US", "2125550123"),
    # NANP prefix rules: area code / exchange can't start 0 or 1
    ("+1 012 555 0123", None, None),
    ("+1 112 555 0123", None, None),
    ("+1 212 055 0123", None, None),
    ("0123456789", "US", None),  # 10 digits but area code 0
    ("1234567890", "US", None),  # area code 1
    # LIB-DIFF: phonenumbers knows unassigned NANP area codes (e.g.
    # 999) are invalid; the leading-digit pattern accepts any [2-9]xx.
    ("+1 999 555 0123", None, "9995550123"),
    # --- GR (+30) ---
    ("+30 210 123 4567", None, "2101234567"),
    ("210 123 4567", "GR", "2101234567"),
    ("+30 69 1234 5678", None, "6912345678"),
    ("691 234 5678", "GR", "6912345678"),
    # GR numbers are 10 digits starting 2/69/8/9
    ("+30 51 234 5678", None, None),  # 9 digits
    ("+30 41 2345 6789", None, None),  # starts 4 — not geo/mobile
    ("1234567890", "GR", None),  # starts 1
    # LIB-DIFF: phonenumbers validates the full GR prefix table (e.g.
    # 68x is unassigned); the pattern accepts any 69x mobile shape only,
    # so 68x already rejects — but 699/698 granularity is not checked.
    # --- GB (+44, trunk 0) ---
    ("+44 20 7123 4567", None, "02071234567"),
    ("020 7123 4567", "GB", "02071234567"),
    ("07911 123456", "GB", "07911123456"),
    ("+44 7911 123456", None, "07911123456"),
    ("+44 0 20 7123 4567", None, None),  # NSN can't start 0
    # LIB-DIFF: phonenumbers rejects GB 9-digit strings outside the
    # real 0500/0800 ranges; the length set admits any 9-10 digit NSN
    # with leading 1-9.
    ("+44 123456789", None, "0123456789"),
    # --- IT (+39, trunk 0 significant) ---
    ("+39 02 1234 5678", None, "0212345678"),
    ("02 1234 5678", "IT", "0212345678"),
    ("+39 333 123 4567", None, "3331234567"),
    ("333 123 4567", "IT", "3331234567"),
    ("+39 800 123 456", None, "800123456"),
    # IT numbers start 0 (geo) / 3 (mobile) / 8 (services)
    ("+39 212 345 678", None, None),
    ("51234567", "IT", None),  # starts 5
    # --- DE (+49, trunk 0) ---
    ("+49 30 123456", None, "030123456"),
    ("030 123456", "DE", "030123456"),
    ("+49 1512 3456789", None, "015123456789"),
    # --- FR (+33, trunk 0) ---
    ("+33 1 23 45 67 89", None, "0123456789"),
    ("01 23 45 67 89", "FR", "0123456789"),
    ("+33 0 1 23 45 67 89", None, None),  # NSN can't start 0
    # --- ES (+34, no trunk) ---
    ("+34 612 34 56 78", None, "612345678"),
    ("912 345 678", "ES", "912345678"),
    ("+34 112 345 678", None, None),  # starts 1
    # --- AU (+61, trunk 0) ---
    ("+61 2 9876 5432", None, "0298765432"),
    ("02 9876 5432", "AU", "0298765432"),
    ("+61 412 345 678", None, "0412345678"),
    ("+61 512 345 678", None, None),  # 5 not a valid AU leading digit
    # --- IN (+91) ---
    ("+91 98765 43210", None, "9876543210"),
    ("+91 09876 54321", None, None),  # NSN leading 0 invalid
    # --- shared country code +1 resolves to US (first region wins) ---
    ("+1 416 555 0199", None, "4165550199"),  # Toronto number, US metadata
    # --- format tolerance ---
    ("+30 (210) 123-4567", None, "2101234567"),
    ("+30.210.123.4567", None, "2101234567"),
    ("tel nonsense", "US", None),
    ("+30 abc 123", None, None),  # letters → charset reject
    ("123", "US", None),  # too short
    ("", "US", None),
    # no region and no + → unparseable (reference behavior: region
    # required for national forms, break_checker.py:1120-1128)
    ("210 123 4567", None, None),
    ("2125550123", None, None),
    # unknown calling code with + → no region match
    ("+999 123 456 789", None, None),
    # LIB-DIFF: phonenumbers parses extensions ("x123", ";ext=")
    # into a separate field; the charset check rejects them outright.
    ("+1 212 555 0123 x45", None, None),
    # LIB-DIFF: Italian premium 89x is narrower in phonenumbers than
    # the 8\\d{7,9} services pattern here.
    ("+39 891 234 567", None, "891234567"),
    # ---- r5 adversarial extensions (VERDICT r4 item #6) ----
    # LIB-DIFF: phonenumbers strips an RFC3966 "tel:" scheme before
    # parsing; here the scheme is handled one layer up (X10 tel-href
    # parsing, functions/contacts.py) and the bare normalizer rejects
    # the colon. Unreachable divergence: page text never carries the
    # scheme, and tel: hrefs route through X10.
    ("tel:+30-210-123-4567", None, None),
    # LIB-DIFF: phonenumbers honors IDD escape sequences (GR "00",
    # US "011") when a default region supplies them; the normalizer
    # accepts only "+" international syntax — national-format input
    # with an IDD prefix is rejected rather than guessed.
    ("0030 210 1234567", "GR", None),
    ("011 30 210 1234567", "US", None),
    # LIB-DIFF: phonenumbers maps vanity letters (1-800-FLOWERS →
    # 8003569377); the charset check rejects letters outright. The
    # numeric form of the same number is accepted identically.
    ("1-800-FLOWERS", "US", None),
    ("+1 800 356 9377", None, "8003569377"),
    # LIB-DIFF: phonenumbers splits ";ext=" / "ext." extensions into a
    # separate field; rejected here like the "x45" form above.
    ("+30 210 1234567;ext=12", None, None),
    ("+30 210 1234567 ext. 12", None, None),
    ("+30 210 123 4567 #99", None, None),
    # double plus is malformed for both sides
    ("++30 210 1234567", None, None),
    # GR has no trunk prefix: a leading 0 on the national form is
    # invalid for both sides (phonenumbers: invalid length/pattern)
    ("0 210 1234567", "GR", None),
    # calling-code boundary: +300 is not a code (3-digit codes start
    # at +35x/+37x/+38x in the relevant ranges) — both sides reject
    ("+300 210 1234567", None, None),
]


@pytest.mark.parametrize("raw,expected", EMAIL_VECTORS)
def test_email_golden(raw, expected):
    assert contacts.normalize_email(raw) == expected


@pytest.mark.parametrize("raw,region,expected", PHONE_VECTORS)
def test_phone_golden(raw, region, expected):
    assert contacts.normalize_phone(raw, region) == expected


# ------------------------------------------------------ registered domain
# (host, expected eTLD+1). Expected values match tldextract 5.x with
# DEFAULTS — include_psl_private_domains=False, exactly how the
# reference constructs it (break_checker.py:1234-1237): private
# registries (github.io-class) are ORDINARY domains, not suffixes.
DOMAIN_VECTORS = [
    ("example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("example.co.uk", "example.co.uk"),
    ("mail.sub.example.co.uk", "example.co.uk"),
    ("example.co.il", "example.co.il"),
    ("www.example.co.il", "example.co.il"),
    ("example.com.pl", "example.com.pl"),
    ("shop.example.com.pl", "example.com.pl"),
    ("example.gob.mx", "example.gob.mx"),
    ("example.com.tr", "example.com.tr"),
    ("example.ac.jp", "example.ac.jp"),
    # private registries: NOT suffixes under tldextract defaults
    ("user.github.io", "github.io"),
    ("deep.user.github.io", "github.io"),
    ("github.io", "github.io"),
    ("myapp.herokuapp.com", "herokuapp.com"),
    ("blog.blogspot.com", "blogspot.com"),
    ("site.netlify.app", "netlify.app"),
    # the bare ICANN suffix itself has no registrable domain
    ("co.uk", ""),
    ("localhost", ""),
    # unknown multi-label combos fall back to last two labels
    ("example.zz.xx", "zz.xx"),
    # wildcard rules (*.ck, *.bd, *.kawasaki.jp ...): every child label
    # of the parent is itself a suffix
    ("foo.bar.ck", "foo.bar.ck"),
    ("bar.ck", ""),
    ("x.foo.bar.ck", "foo.bar.ck"),
    ("something.bd", ""),
    ("a.something.bd", "a.something.bd"),
    ("foo.kawasaki.jp", ""),
    ("x.foo.kawasaki.jp", "x.foo.kawasaki.jp"),
    # kawasaki.jp itself is not a suffix (only *.kawasaki.jp is)
    ("kawasaki.jp", "kawasaki.jp"),
    # exception rules (!www.ck, !city.kawasaki.jp): carved back out
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("a.city.kawasaki.jp", "city.kawasaki.jp"),
    # suffixes beyond the old embedded subset, covered by the full
    # ICANN PSL snapshot shipped as package data (r3 verdict item #6)
    ("example.com.ng", "example.com.ng"),
    ("www.example.com.ng", "example.com.ng"),
    ("shop.example.co.ke", "example.co.ke"),
    ("example.gov.ng", "example.gov.ng"),
    ("host.example.com.ly", "example.com.ly"),
    ("a.example.pvt.k12.ma.us", "example.pvt.k12.ma.us"),  # 4-label rule
    ("example.com.bn", "example.com.bn"),
    ("b.example.edu.eg", "example.edu.eg"),
    # nic.za is itself an exact PSL rule — no registrable domain
    ("nic.za", ""),
    ("thing.nic.za", "thing.nic.za"),
]


@pytest.mark.parametrize("host,expected", DOMAIN_VECTORS)
def test_registered_domain_golden(host, expected):
    assert contacts.registered_domain(host) == expected
