"""Property-based checks (SURVEY.md §5.6) — pure functions, hypothesis."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from breakchecker_spark.functions import contacts, urlnorm

_path_chars = st.text(alphabet=string.ascii_lowercase + string.digits + "/-._", max_size=30)
_qkey = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_qval = st.text(alphabet=string.ascii_lowercase + string.digits, max_size=8)


@given(path=_path_chars, pairs=st.lists(st.tuples(_qkey, _qval), max_size=6))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(path, pairs):
    q = "&".join(f"{k}={v}" for k, v in pairs)
    url = f"https://example.com/{path}" + (f"?{q}" if q else "")
    once = urlnorm.canonicalize(url, url, "example.com")
    if once is None:
        return
    twice = urlnorm.canonicalize(once, once, "example.com")
    assert twice == once


@given(pairs=st.lists(st.tuples(_qkey, _qval), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_struct_key_stable_under_param_permutations(pairs):
    import random

    base = "https://example.com/p?" + "&".join(f"{k}={v}" for k, v in pairs)
    shuffled = list(pairs)
    random.Random(42).shuffle(shuffled)
    perm = "https://example.com/p?" + "&".join(f"{k}={v}" for k, v in shuffled)
    assert urlnorm.struct_key_str(base) == urlnorm.struct_key_str(perm)


@given(pairs=st.lists(st.tuples(_qkey, _qval), max_size=4))
@settings(max_examples=100, deadline=None)
def test_struct_key_ignores_trackers_and_html_suffix(pairs):
    q = "&".join(f"{k}={v}" for k, v in pairs)
    suffix = f"?{q}" if q else ""
    a = urlnorm.struct_key_str(f"https://e.com/a/b{suffix}")
    b = urlnorm.struct_key_str(f"https://e.com/a/b.html{suffix}")
    c = urlnorm.struct_key_str(f"https://e.com/a/b/{suffix}")
    assert a == b == c


@given(nsn=st.integers(min_value=2_000_000_000, max_value=2_999_999_999))
@settings(max_examples=100, deadline=None)
def test_phone_e164_roundtrip_gr(nsn):
    # GR NSN is 10 digits starting 2/6/9 in practice; generator uses 2xx
    e164 = f"+30{nsn}"
    national = contacts.normalize_phone(e164, None)
    assert national == str(nsn)
    # idempotent-ish: normalizing the national form with the region hint
    assert contacts.normalize_phone(national, "GR") == national


@given(
    local=st.text(alphabet=string.ascii_letters + string.digits + "._+-", min_size=1, max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_email_normalization_lowercases_or_rejects(local):
    addr = f"{local}@Example.COM"
    out = contacts.normalize_email(addr)
    if out is not None:
        assert out == out.lower()
        assert out.endswith("@example.com")
        # normalization is idempotent
        assert contacts.normalize_email(out) == out
