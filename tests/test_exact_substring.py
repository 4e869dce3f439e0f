"""Exact-substring dedup: corpus-wide duplicated-window removal."""

import pytest

from breakchecker_spark.operators.dedup import exact_substring_dedup

DOCS = [
    (1, "x one two three four five y"),
    (2, "z one two three four five w"),
    (3, "a b c d e a b c d e"),  # within-doc duplicated window
    (4, "tiny doc"),  # shorter than the window: never touched
    (5, "tiny doc"),  # even when byte-identical to another short doc
    (6, "unique phrase appearing just once here"),
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = exact_substring_dedup(df, window=5, min_count=2).collect()
    return {r["doc_id"]: r for r in rows}


def test_shared_phrase_removed_from_both_docs(result):
    for doc_id, kept in [(1, "x y"), (2, "z w")]:
        r = result[doc_id]
        assert r["dedup_text"] == kept
        assert (r["n_tokens"], r["n_removed"]) == (7, 5)


def test_within_doc_repetition_fully_covered(result):
    # "a b c d e" occurs at pos 0 and 5 -> both occurrences removed,
    # nothing survives
    r = result[3]
    assert r["dedup_text"] == ""
    assert (r["n_tokens"], r["n_removed"]) == (10, 10)


def test_docs_shorter_than_window_never_touched(result):
    for doc_id in (4, 5):
        r = result[doc_id]
        assert r["dedup_text"] == "tiny doc"
        assert r["n_removed"] == 0


def test_singleton_windows_survive(result):
    r = result[6]
    assert r["dedup_text"] == "unique phrase appearing just once here"
    assert r["n_removed"] == 0


def test_min_count_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # raising min_count above the actual multiplicity disables removal
    rows = exact_substring_dedup(df, window=5, min_count=4).collect()
    assert all(r["n_removed"] == 0 for r in rows)


def test_every_doc_surfaces_exactly_once(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = exact_substring_dedup(df, window=5, min_count=2)
    assert sorted(r["doc_id"] for r in out.collect()) == [d for d, _ in DOCS]


def test_randomized_corpus_matches_python_reference(spark):
    """Seeded random corpus vs a direct pure-Python implementation."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(100)
    ]
    W, MIN = 4, 2

    # python reference: global window census, covered positions, rejoin
    from collections import Counter

    toks = {i: t.lower().strip().split() if t.strip() else [""] for i, t in docs}
    census = Counter(
        " ".join(tk[p : p + W])
        for tk in toks.values()
        for p in range(len(tk) - W + 1)
    )
    expected = {}
    for i, tk in toks.items():
        covered = set()
        for p in range(len(tk) - W + 1):
            if census[" ".join(tk[p : p + W])] >= MIN:
                covered.update(range(p, p + W))
        kept = [t for p, t in enumerate(tk) if p not in covered]
        expected[i] = (len(tk), len(tk) - len(kept), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["dedup_text"])
        for r in exact_substring_dedup(df, window=W, min_count=MIN).collect()
    }
    assert got == expected
