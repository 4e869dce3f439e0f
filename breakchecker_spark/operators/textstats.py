"""Text-analysis operators for training-data pipelines.

All JVM-side Catalyst expressions (whole-stage codegen, no Python in
the hot path): language-ID by marker-word voting, quality scoring from
length/punctuation/stopword ratios, token counting (whitespace and a
BPE-ish regex), and document fingerprinting.

Each operator has an ANSI-SQL oracle equivalent in
``__spark_entry__.oracle_sql`` so the driver cross-checks values
against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Marker words voted per language. Deterministic and tiny on purpose —
# an n-gram heuristic whose exact SQL mirror is feasible; real
# deployments would swap in fastText/CLD3 behind the same column API.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "est", "une"),
    "es": ("el", "los", "que", "una", "para"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

# BPE-ish tokenizer: word pieces, numbers, or single non-space symbols.
BPE_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_bpe(text: Column) -> Column:
    """Token count under the BPE-ish regex (letters / digits / symbol)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0)))


def _word_occurrences(text: Column, word: str) -> Column:
    """Occurrences of a word with space boundaries (SQL-mirrorable)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def lang_scores(text: Column) -> dict:
    """{lang: marker-hit count} columns."""
    return {
        lang: sum(
            (_word_occurrences(text, w) for w in words), start=F.lit(0)
        ).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker votes, ties → lexicographic,
    zero votes → 'und'."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(
                (-scores[lang]).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang in sorted(scores)
        ]
    )
    best = F.array_min(pairs)
    return F.when(best["neg"] == 0, F.lit("und")).otherwise(best["lang"])


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score from cheap surface statistics.

    mean of: length saturation (n/1000 capped), alpha ratio,
    stopword-per-token ratio (capped at 0.5, scaled), and
    1 - symbol ratio. Deterministic, SQL-mirrorable arithmetic.
    """
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("double")
    symbols = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")).cast("double")
    tokens = token_count_ws(text).cast("double")
    stop_hits = sum(
        (_word_occurrences(text, w) for w in STOPWORDS), start=F.lit(0)
    ).cast("double")

    len_sat = F.least(n / F.lit(1000.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        tokens > 0, F.least(stop_hits / tokens, F.lit(0.5)) * 2
    ).otherwise(F.lit(0.0))
    sym_penalty = F.when(n > 0, 1 - symbols / n).otherwise(F.lit(0.0))
    return F.round((len_sat + alpha_ratio + stop_ratio + sym_penalty) / 4, 6)


def fingerprint_md5(text: Column, nchars: int = 16) -> Column:
    """Stable document fingerprint: md5-hex prefix (content hash)."""
    return F.substring(F.md5(text), 1, nchars)


def fingerprint_rolling(text: Column, window: int = 8) -> Column:
    """Winnowing-style robust fingerprint: min md5 over token shingles.

    Shift-resistant (insensitive to leading/trailing additions outside
    the minimal shingle): hashes every ``window``-token shingle and
    keeps the minimum — the classic document-fingerprint scheme
    expressed entirely in Catalyst array functions.
    """
    tokens = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, window))
    )
    return F.array_min(F.transform(shingles, F.md5))


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text statistics in one projection over the documents table."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars_actual"),
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint_md5(t).alias("fingerprint"),
    )
