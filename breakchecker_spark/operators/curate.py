"""Corpus curation pipeline: the quality gates composed end to end.

The single-op building blocks (exact dedup, surface quality score,
Gopher repetition filters) each have their own oracle row; this module
wires them into the decision pipeline a training-data curation job
actually runs — every document gets exactly one verdict from the first
stage that drops it:

    duplicate (not the first occurrence of its content hash)
      -> low quality (composite surface score below threshold)
      -> repetitive (Gopher n-gram thresholds)
      -> kept

Scale shape: the dedup census shuffles on md5(text) (32-byte key, not
content); quality is a pure projection; repetition is the linear
explode+agg from textstats; the three verdicts meet in doc_id-keyed
joins that AQE plans as broadcasts once the per-doc frames are slim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import quality_score, repetition_stats

QUALITY_THRESHOLD = 0.55


def curation_verdicts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = QUALITY_THRESHOLD,
) -> DataFrame:
    """One row per document: (doc_id, verdict) with the stage order
    duplicate > low quality > repetitive > kept."""
    h = F.md5(F.col(text_col))
    first = (
        df.select(h.alias("h"), F.col(id_col).alias("doc_id"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("first_id"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        h.alias("h"),
        quality_score(F.col(text_col)).alias("quality"),
    )
    rep = repetition_stats(df, text_col=text_col, id_col=id_col).select(
        "doc_id", F.col("keep").alias("rep_keep")
    )
    verdict = (
        F.when(F.col("doc_id") != F.col("first_id"), F.lit("duplicate"))
        .when(F.col("quality") < quality_threshold, F.lit("low_quality"))
        .when(~F.col("rep_keep"), F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    return (
        base.join(first, "h")
        .join(rep, "doc_id")
        .select("doc_id", verdict.alias("verdict"))
    )


def curation_stats(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = QUALITY_THRESHOLD,
) -> DataFrame:
    """Per-group kept/dropped census over the curation pipeline."""
    verdicts = curation_verdicts(
        df, text_col=text_col, id_col=id_col, quality_threshold=quality_threshold
    )
    tagged = df.select(F.col(id_col).alias("doc_id"), group_col).join(
        verdicts, "doc_id"
    )

    def _n(v: str):
        return F.count(F.when(F.col("verdict") == v, F.lit(1)))

    return tagged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        _n("kept").alias("n_kept"),
        _n("duplicate").alias("n_dup"),
        _n("low_quality").alias("n_low_quality"),
        _n("repetitive").alias("n_repetitive"),
    )


def curated_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = QUALITY_THRESHOLD,
) -> DataFrame:
    """The surviving documents themselves (semi-join on kept verdicts)."""
    kept = curation_verdicts(
        df, text_col=text_col, id_col=id_col, quality_threshold=quality_threshold
    ).filter(F.col("verdict") == "kept")
    return df.join(
        kept.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )


def domain_capped_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    oversample: float = 2.0,
) -> DataFrame:
    """Deterministic per-domain cap: at most ``cap`` documents per
    group, chosen by md5 order (a seedless uniform sample that every
    engine reproduces bit-for-bit).

    Mega-domain skew is defused BEFORE the ranking window: a broadcast
    join against the per-group counts keeps only rows whose hash
    fraction is <= cap*oversample/n, so the window partition for a
    billion-page domain sees ~cap*oversample candidates instead of a
    billion — the row_number is exact on the survivors. The prefilter
    is part of the operator's defined semantics (both the engine and
    the SQL oracle apply it), so results stay deterministic even in
    the astronomically-unlikely under-sample case.
    """
    from pyspark.sql import Window, functions as F2

    key = F.concat(F.col(group_col), F.lit(":"), F.col(id_col).cast("string"))
    hv = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
    ).alias("hv")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    pre = (
        df.select(F.col(id_col).alias("doc_id"), F.col(group_col), hv)
        .join(F.broadcast(counts), group_col)
        .filter(
            F.col("hv")
            <= F.least(F.lit(1.0), F.lit(cap * oversample) / F.col("_n"))
        )
    )
    w = Window.partitionBy(group_col).orderBy("hv", "doc_id")
    return (
        pre.withColumn("rk", F2.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select(group_col, "doc_id", F.col("rk").cast("int").alias("rk"))
    )
