"""Golden vectors for contact extraction/normalization
(reference break_checker.py:978-1196, 1259-1276)."""

import pytest

from breakchecker_spark.functions import contacts


# ---------------------------------------------------------------- emails


def test_email_regex_basics():
    text = "contact info@example.com or Sales+EU@sub.example.co.uk today"
    assert contacts.extract_emails(text) == [
        "info@example.com",
        "Sales+EU@sub.example.co.uk",
    ]


def test_email_regex_rejects_file_extensions():
    text = "logo@2x.png sprite@3x.jpeg data@file.json real@example.com"
    assert contacts.extract_emails(text) == ["real@example.com"]


def test_email_regex_allows_extension_prefix_tlds():
    # 'pngx' is not in the blocked list; lookahead is word-bounded
    assert contacts.extract_emails("a@b.pngx") == ["a@b.pngx"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Info@Example.COM", "info@example.com"),
        ("<info@example.com>", "info@example.com"),
        ('"info@example.com"', "info@example.com"),
        ("info%40example.com", "info@example.com"),  # percent-encoded @
        ("a&#64;example.com", "a@example.com"),  # HTML entity
        ("no-at-sign", None),
        ("a@@b.com", None),
        (".dot@example.com", None),
        ("dot.@example.com", None),
        ("do..t@example.com", None),
        ("x@example", None),  # no TLD
        ("x@example.c", None),  # TLD too short
        ("x@example.c0m", None),  # TLD must be alphabetic
        ("x@-bad.com", None),  # label starts with hyphen
        ("valid.name+tag@example.com", "valid.name+tag@example.com"),
    ],
)
def test_normalize_email(raw, expected):
    assert contacts.normalize_email(raw) == expected


def test_registered_domain():
    assert contacts.registered_domain("mail.sub.example.co.uk") == "example.co.uk"
    assert contacts.registered_domain("a.b.example.com") == "example.com"
    assert contacts.registered_domain("example.com") == "example.com"
    assert contacts.registered_domain("localhost") == ""
    assert contacts.registered_domain("EXAMPLE.ORG") == "example.org"


def test_email_org_filter_semantics():
    # org match is registered-domain equality (bc:1259-1276)
    assert contacts.email_org("a@mail.example.com") == "example.com"
    assert contacts.email_org("a@example.com") == "example.com"
    assert contacts.email_org("a@gmail.com") == "gmail.com"


# ---------------------------------------------------------------- phones


def test_phone_regex():
    text = "call +30 210 123 4567 or (212) 555-0199 now; ext 42 no match"
    found = contacts.extract_phones(text)
    assert "+30 210 123 4567" in found
    # the reference regex starts at a digit (after optional +), so the
    # leading "(" is not part of the match (bc:991)
    assert "212) 555-0199" in found
    assert all("ext" not in f for f in found)


@pytest.mark.parametrize(
    "raw,region,expected",
    [
        # E.164 with + → national digits
        ("+302101234567", None, "2101234567"),  # GR: 10-digit NSN, no trunk
        ("+12125550199", None, "2125550199"),  # US: NANP 10 digits
        ("+442079460958", None, "02079460958"),  # GB keeps trunk 0 in national
        ("+49 30 123456", None, "030123456"),  # DE trunk 0
        # region-hinted national input
        ("210 123 4567", "GR", "2101234567"),
        ("(212) 555-0199", "US", "2125550199"),
        ("020 7946 0958", "GB", "02079460958"),
        # invalid: too short
        ("12345", "US", None),
        ("123 456", "GR", None),
        # invalid: no region and no +
        ("2101234567", None, None),
        # wrong length for region
        ("21012345", "GR", None),
    ],
)
def test_normalize_phone(raw, region, expected):
    assert contacts.normalize_phone(raw, region) == expected


def test_region_for_domain():
    assert contacts.region_for_domain("example.gr") == "GR"
    assert contacts.region_for_domain("example.co.uk") == "GB"
    assert contacts.region_for_domain("example.com") is None


# -------------------------------------------------------------- mailto/tel


def test_mailto_simple():
    assert contacts.mailto_addresses("mailto:a@b.com") == ["a@b.com"]
    assert contacts.mailto_addresses("MAILTO:a@b.com") == ["a@b.com"]
    assert contacts.mailto_addresses("mailto://a@b.com") == ["a@b.com"]
    assert contacts.mailto_addresses("https://x.com") == []


def test_mailto_lists_and_query():
    got = contacts.mailto_addresses("mailto:?to=u@e.com&cc=a@b.com;c@d.com&bcc=e@f.com")
    assert got == ["u@e.com", "a@b.com", "c@d.com", "e@f.com"]


def test_mailto_mixed_addr_and_query():
    got = contacts.mailto_addresses("mailto:x@y.com,z@w.com?subject=hi&to=q@r.com")
    assert got == ["x@y.com", "z@w.com", "q@r.com"]


def test_mailto_percent_encoding_and_brackets():
    assert contacts.mailto_addresses("mailto:%3Cinfo@e.com%3E") == ["info@e.com"]


def test_tel():
    assert contacts.tel_numbers("tel:+301234567") == ["+301234567"]
    assert contacts.tel_numbers("tel://+301234567") == ["+301234567"]
    assert contacts.tel_numbers("tel:+30123?ext=2") == ["+30123"]
    assert contacts.tel_numbers("tel:%2B30123") == ["+30123"]
    assert contacts.tel_numbers("mailto:a@b.com") == []
