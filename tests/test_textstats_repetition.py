"""Repetition quality metrics (Gopher-style) + PII redaction."""

import pytest
from pyspark.sql import functions as F

from breakchecker_spark.operators import pii
from breakchecker_spark.operators.textstats import (
    GOPHER_DUP_THRESHOLDS,
    GOPHER_TOP_THRESHOLDS,
    ngram_strings,
    repetition_stats,
)

DOCS = [
    # repeated 2-gram "a b" x3 (9 chars of 11), top3 "a b a"/"b a b" x2
    (1, "a b a b a b"),
    (2, "x"),  # too short for any n-gram
    (3, ""),  # empty text
    (4, "a b c dd ee"),  # all-unique: tie on cnt=1, longest gram wins
    (5, "p q r s t p q r s t u"),  # duplicated 5-gram
]


@pytest.fixture(scope="module")
def rep(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = repetition_stats(df).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in rows}


def test_top_ngram_fraction(rep):
    # "a b" x3 -> 3*3=9 chars of 11; "a b a"/"b a b" x2 -> 2*5=10 of 11
    assert rep[1]["top2_frac"] == pytest.approx(9 / 11, abs=1e-6)
    assert rep[1]["top3_frac"] == pytest.approx(10 / 11, abs=1e-6)
    assert rep[1]["keep"] is False


def test_short_and_empty_docs_surface_with_zero_metrics(rep):
    for doc_id in (2, 3):
        r = rep[doc_id]
        assert (r["top2_frac"], r["top3_frac"], r["dup5_frac"]) == (0.0, 0.0, 0.0)
        assert r["keep"] is True


def test_count_tie_resolves_to_largest_character_cover(rep):
    # every 2-gram unique (cnt=1); "dd ee" (5 chars) is the max cover
    assert rep[4]["top2_frac"] == pytest.approx(5 / 11, abs=1e-6)


def test_duplicate_ngram_excess_chars(rep):
    # "p q r s t" occurs twice: excess = (2-1)*9 chars of 21
    assert rep[5]["dup5_frac"] == pytest.approx(9 / 21, abs=1e-6)
    assert rep[5]["keep"] is False


def test_ngram_strings_never_descend(spark):
    # fewer tokens than n must yield [] (a raw sequence(1, 0) would
    # produce a DESCENDING [1, 0] and fabricate grams)
    df = spark.createDataFrame([("a b",)], "text string")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    row = df.select(
        ngram_strings(toks, 2).alias("g2"), ngram_strings(toks, 3).alias("g3")
    ).collect()[0]
    assert row["g2"] == ["a b"]
    assert row["g3"] == []


def test_thresholds_are_gopher_table_a1():
    assert GOPHER_TOP_THRESHOLDS[2] == 0.20
    assert GOPHER_TOP_THRESHOLDS[4] == 0.16
    assert GOPHER_DUP_THRESHOLDS[5] == 0.15
    assert GOPHER_DUP_THRESHOLDS[10] == 0.10


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def _redact(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return df.select(pii.redact_pii(F.col("text")).alias("r")).collect()[0]["r"]


def test_email_redaction(spark):
    assert _redact(spark, "write to bob@example.com today") == "write to [EMAIL] today"


def test_phone_redaction(spark):
    assert _redact(spark, "call +1 (555) 010-4567 now") == "call [PHONE] now"


def test_asset_filename_not_redacted(spark):
    # the bad-TLD negative lookahead (reference break_checker.py:985-988)
    assert _redact(spark, "see logo@2x.png here") == "see logo@2x.png here"


def test_email_first_ordering(spark):
    # digit-run local part: phone matcher must not split the address
    assert _redact(spark, "id 12345678@mail.com") == "id [EMAIL]"


def test_pii_stats_counts(spark):
    df = spark.createDataFrame(
        [(7, "a@b.io and c@d.org or +41 22 123 45 67 x")],
        "doc_id long, text string",
    )
    row = pii.pii_stats(df).collect()[0]
    assert (row["n_emails"], row["n_phones"]) == (2, 1)
    assert row["redacted"] == "[EMAIL] and [EMAIL] or [PHONE] x"


def test_randomized_corpus_matches_python_reference(spark):
    """Seeded random corpus vs a direct pure-Python implementation."""
    import random
    from collections import Counter

    rng = random.Random(99)
    vocab = [f"t{i}" for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(80)
    ]

    def py_metrics(text):
        tk = text.lower().strip().split() if text.strip() else [""]
        n_chars = len(text)
        out = {}
        for n, kind in [(2, "top"), (3, "top"), (5, "dup")]:
            grams = [" ".join(tk[p : p + n]) for p in range(len(tk) - n + 1)]
            c = Counter(grams)
            if kind == "top":
                # engine tie rule: max over (cnt, cnt*len) lexicographic
                chars = max(
                    ((cnt, cnt * len(g)) for g, cnt in c.items()),
                    default=(0, 0),
                )[1]
            else:
                chars = sum((cnt - 1) * len(g) for g, cnt in c.items() if cnt > 1)
            frac = min(chars / n_chars, 1.0) if n_chars else 0.0
            out[f"{kind}{n}_frac"] = round(frac, 6)
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = repetition_stats(df).collect()
    for r in rows:
        exp = py_metrics(dict(docs)[r["doc_id"]])
        for k, v in exp.items():
            assert r[k] == pytest.approx(v, abs=1e-9), (r["doc_id"], k)


# ----------------------------------------------------------- trigram LM


def test_trigram_lm_hand_example(spark):
    from breakchecker_spark.operators.textstats import (
        trigram_lm_score,
        trigram_lm_train,
    )

    # corpus alphabet {a,b} → V=2; "abab" has trigrams aba, bab (1×
    # each); contexts ab, ba (1× each) → p = (1+1)/(1+2) = 2/3 both.
    # "ab" is too short for any trigram and must produce no row.
    df = spark.createDataFrame(
        [(0, "abab"), (1, "ab")], "doc_id long, text string"
    )
    model, vocab = trigram_lm_train(df)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["neg_logp"])
        for r in trigram_lm_score(df, model, vocab).collect()
    }
    import math

    assert got == {0: (2, round(math.log(1.5), 6))}
    # the model itself: both trigrams at ln(2/3)
    m = {r["tri"]: r["logp"] for r in model.collect()}
    assert set(m) == {"aba", "bab"}
    for lp in m.values():
        assert lp == pytest.approx(math.log(2 / 3))


def test_trigram_lm_unseen_backoff_and_case_fold(spark):
    from breakchecker_spark.operators.textstats import (
        trigram_lm_score,
        trigram_lm_train,
    )
    import math

    train = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    model, vocab = trigram_lm_train(train)
    # "XYZ" lowercases then misses the model entirely → every trigram
    # backs off to p = 1/V with V = 2; "ABA" case-folds onto a seen one
    held_out = spark.createDataFrame(
        [(7, "XYZ"), (8, "ABA")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["neg_logp"])
        for r in trigram_lm_score(held_out, model, vocab).collect()
    }
    assert got == {
        7: (1, round(math.log(2), 6)),
        8: (1, round(-math.log(2 / 3), 6)),
    }
