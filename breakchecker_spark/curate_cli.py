"""Corpus-curation entry point (training-data pipeline tooling).

    spark-submit --py-files breakchecker_spark.zip \
        -m breakchecker_spark.curate_cli \
        --input /data/documents --output /data/curated \
        --stats stats.json [--redact] [--quality-threshold 0.55]

Separate from ``breakchecker_spark.cli`` on purpose: that module
mirrors the reference crawler's CLI shape verbatim; this one fronts
the corpus-side operators (curation verdict ladder + optional PII
masking) the reference has no equivalent for.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="breakchecker-spark-curate", description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="curated parquet output path")
    p.add_argument("--stats", help="write the per-group census here as JSON")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--group-col", default="lang", help="census grouping column (--stats)"
    )
    p.add_argument("--quality-threshold", type=float, default=None)
    p.add_argument(
        "--redact",
        action="store_true",
        help="mask emails/phones (extraction-pass patterns) in the "
        "surviving documents' text column",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import functions as F

    from .operators import pii
    from .operators.curate import QUALITY_THRESHOLD, curated_corpus, curation_stats
    from .session import get_spark

    threshold = (
        QUALITY_THRESHOLD if args.quality_threshold is None else args.quality_threshold
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_spark(app_name="bc_curate", master=f"local[{cpus}]")
    docs = spark.read.parquet(args.input)

    kept = curated_corpus(
        docs, text_col=args.text_col, id_col=args.id_col, quality_threshold=threshold
    )
    if args.redact:
        kept = kept.withColumn(args.text_col, pii.redact_pii(F.col(args.text_col)))
    kept.write.mode("overwrite").parquet(args.output)

    if args.stats:
        rows = (
            curation_stats(
                docs,
                group_col=args.group_col,
                text_col=args.text_col,
                id_col=args.id_col,
                quality_threshold=threshold,
            )
            .orderBy(args.group_col)
            .collect()
        )
        with open(args.stats, "w") as f:
            json.dump([r.asDict() for r in rows], f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
