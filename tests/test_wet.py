"""WET sink: conversion records, cross-references, text derivation."""

import glob
import os

from pyspark.sql import functions as F

from breakchecker_spark.sources import warc as warc_mod
from breakchecker_spark.sources import wet as wet_mod

DOCS = [
    (0, "https://w.example/0", "plain text zero"),
    (1, "https://w.example/1", "unicode café ünïcode"),
    (2, "https://w.example/2", ""),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, url string, text string")


def test_wet_roundtrip_payloads(spark, tmp_path):
    out = str(tmp_path / "wet")
    wet_mod.write_wet(_docs_df(spark), out, n_files=2).collect()
    recs = warc_mod.read_warc(spark, out).filter(F.col("rec_type") == "conversion")
    got = {r["url"]: bytes(r["payload"]).decode() for r in recs.collect()}
    assert got == {u: t for _, u, t in DOCS}


def test_conversion_refers_to_matches_warc_response_id(spark, tmp_path):
    """A WARC+WET pair exported from one table cross-references like a
    Common Crawl segment: each conversion's WARC-Refers-To equals the
    response record id the WARC writer assigns the same URL."""
    warc_dir, wet_dir = str(tmp_path / "warc"), str(tmp_path / "wet")
    payloads = _docs_df(spark).select(
        "doc_id", "url", F.encode("text", "UTF-8").alias("payload")
    )
    warc_mod.write_warc(payloads, warc_dir, n_files=1).collect()
    wet_mod.write_wet(_docs_df(spark), wet_dir, n_files=1).collect()

    response_ids = {}
    for f in glob.glob(os.path.join(warc_dir, "*.warc*")):
        for fields, _ in warc_mod.iter_warc_records(open(f, "rb").read()):
            if fields.get("warc-type") == "response":
                response_ids[fields["warc-target-uri"]] = fields["warc-record-id"]
    checked = 0
    for f in glob.glob(os.path.join(wet_dir, "*.wet*")):
        for fields, _ in warc_mod.iter_warc_records(open(f, "rb").read()):
            if fields.get("warc-type") == "conversion":
                url = fields["warc-target-uri"]
                assert fields["warc-refers-to"] == response_ids[url]
                checked += 1
    assert checked == len(DOCS)


def test_wet_export_is_byte_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        wet_mod.write_wet(_docs_df(spark), out, n_files=2, compress=True).collect()
    fa = sorted(glob.glob(os.path.join(a, "*")))
    fb = sorted(glob.glob(os.path.join(b, "*")))
    assert [os.path.basename(f) for f in fa] == [os.path.basename(f) for f in fb]
    for x, y in zip(fa, fb):
        assert open(x, "rb").read() == open(y, "rb").read()


def test_wet_rows_from_warc_uses_engine_text_extractor(spark, tmp_path):
    from breakchecker_spark.functions.htmlx import page_text

    html = {
        "https://w.example/a": "<html><body><p>Hello <b>world</b></p></body></html>",
        "https://w.example/b": "<div>x<script>var q=1;</script></div>",
    }
    docs = spark.createDataFrame(
        [(i, u, h.encode()) for i, (u, h) in enumerate(sorted(html.items()))],
        "doc_id long, url string, payload binary",
    )
    warc_dir = str(tmp_path / "warc")
    warc_mod.write_warc(docs, warc_dir, n_files=1, content_type="text/html").collect()
    rows = wet_mod.wet_rows_from_warc(spark, warc_dir).collect()
    got = {r["url"]: r["text"] for r in rows}
    assert got == {u: page_text(h) for u, h in html.items()}
