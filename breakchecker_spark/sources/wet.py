"""WET sink/derivation — the text-only sibling of the WARC source.

Common Crawl ships each crawl three ways: WARC (raw responses), WAT
(metadata), WET (extracted plain text as WARC ``conversion`` records).
This module closes the family for the engine:

- :func:`write_wet` exports ``(doc_id, url, text)`` rows as real WET
  files — ``WARC/1.0`` ``conversion`` records whose ``WARC-Refers-To``
  is the id the WARC writer would give the same URL's ``response``
  record, so a WARC+WET pair exported from one pages table
  cross-references exactly like a Common Crawl segment does.
- :func:`wet_from_warc` derives WET rows from a WARC directory with
  the SAME visible-text extractor the crawl pipeline uses
  (``functions.htmlx.page_text``), Arrow-batched, one file per task.
- Reading WET needs no new code: ``sources.warc.read_warc`` already
  parses any record type; ``conversion`` records carry the plain-text
  payload with no HTTP envelope.

Scale shape mirrors the WARC writer: the only shuffle is the groupBy
on the file-id key; each task writes exactly one file atomically;
fixed dates + md5-derived record ids make re-exports byte-identical.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .warc import _build_record, _record_id, _warcinfo_record

_WET_CONTENT_TYPE = "text/plain"


def _conversion_record(url: str, text_payload: bytes) -> bytes:
    """One WET ``conversion`` record referring back to the response."""
    return _build_record(
        [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", _record_id("conversion:" + url)),
            ("WARC-Refers-To", _record_id(url)),
            ("WARC-Date", "2025-01-01T00:00:00Z"),
            ("WARC-Target-URI", url),
            ("Content-Type", _WET_CONTENT_TYPE),
            ("Content-Length", str(len(text_payload))),
        ],
        text_payload,
    )


def write_wet(
    docs: DataFrame,
    out_dir: str,
    n_files: int = 8,
    compress: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Export ``(doc_id long, url string, <text_col> string)`` rows as
    WET files. Same contract as ``warc.write_warc``: returns a lazy
    ``(warc_file, n_records, n_bytes)`` summary the caller collects to
    force the writes; one file per task; byte-deterministic."""
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    os.makedirs(out_dir, exist_ok=True)
    keyed = docs.select(
        "doc_id", "url", F.col(text_col).alias("_text")
    ).withColumn("_fid", F.pmod(F.col("doc_id"), F.lit(n_files)).cast("int"))

    def _write_group(pdf):
        import pandas as pd

        fid = int(pdf["_fid"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        name = f"part-{fid:05d}.warc.wet" + (".gz" if compress else "")
        chunks = [_warcinfo_record(name)]
        for _, row in pdf.iterrows():
            chunks.append(
                _conversion_record(row["url"], str(row["_text"]).encode())
            )
        if compress:
            data = b"".join(gzip.compress(c, mtime=0) for c in chunks)
        else:
            data = b"".join(chunks)
        path = os.path.join(out_dir, name)
        tmp = path + ".inprogress"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)
        return pd.DataFrame(
            [(name, len(pdf), len(data))],
            columns=["warc_file", "n_records", "n_bytes"],
        )

    return keyed.groupBy("_fid").applyInPandas(
        _write_group, "warc_file string, n_records long, n_bytes long"
    )


def wet_rows_from_warc(spark: SparkSession, warc_dir: str) -> DataFrame:
    """(doc-shaped) WET rows from a WARC directory: response records'
    HTML run through the crawl pipeline's own visible-text extractor
    (Arrow-batched pandas UDF — the parser is per-page Python, batched
    per Arrow chunk, never per-row round-trips)."""
    from ..sources import warc as warc_mod

    recs = warc_mod.read_warc(spark, warc_dir).filter(
        (F.col("rec_type") == "response") & F.col("url").isNotNull()
    )

    @F.pandas_udf("string")
    def _visible_text(html):
        import pandas as pd

        from ..functions.htmlx import page_text

        return pd.Series([page_text(h) for h in html])

    return recs.select(
        "url", _visible_text(F.decode("payload", "UTF-8")).alias("text")
    )
