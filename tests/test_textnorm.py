"""Golden vectors for text normalization (reference break_checker.py:1016-1086)."""

from breakchecker_spark.functions import textnorm


def test_html_unescape():
    assert textnorm.norm_text("a&lt;b&gt;c &amp; d") == "a<b>c & d"
    assert textnorm.norm_text("x&#64;y") == "x@y"


def test_backslash_escapes():
    assert textnorm.decode_escapes(r"A\x42") == "AB"
    assert textnorm.decode_escapes(r"\n stays") == r"\n stays"
    assert textnorm.norm_text("\\u0075ser@example.com") == "user@example.com"


def test_nfkc():
    # fullwidth letters fold to ASCII under NFKC
    assert textnorm.norm_text("ａｂｃ") == "abc"
    # ligature fi expands
    assert textnorm.norm_text("ﬁn") == "fin"


def test_control_chars_dropped_whitespace_kept():
    assert textnorm.norm_text("a\x00b\x07c") == "abc"
    assert textnorm.norm_text("a\nb\rc\td") == "a\nb\rc\td"
    # zero-width (format, Cf) removed
    assert textnorm.norm_text("a​b") == "ab"


def test_strip_edge_punct():
    assert textnorm.strip_edge_punct('<info@example.com>') == "info@example.com"
    assert textnorm.strip_edge_punct('"quoted"') == "quoted"
    assert textnorm.strip_edge_punct("([{x}])") == "x"
    assert textnorm.strip_edge_punct("  plain  ") == "plain"
    assert textnorm.strip_edge_punct("a<b>c") == "a<b>c"


def test_trim_angle_brackets():
    assert textnorm.trim_angle_brackets("<x@y.com>") == "x@y.com"
    assert textnorm.trim_angle_brackets(" <x> ") == "x"
    assert textnorm.trim_angle_brackets("<unclosed") == "<unclosed"
