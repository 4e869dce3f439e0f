"""WARC source/sink: round-trip fidelity, gzip layout, strict framing.

The reference fetches live (break_checker.py:742-839); WARC is the
"beyond the reference" replay source for public crawl dumps — these
tests pin the writer's byte-determinism, plain≡gzip parse equality,
the HTTP envelope split, and loud failure on truncated files.
"""

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from breakchecker_spark.sources import warc


def _docs(spark, n=40):
    rows = [
        (i, f"https://w.example/{i % 3}/{i}", f"payload {i} éü body".encode())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, payload binary")


def test_roundtrip_plain(spark, tmp_path):
    docs = _docs(spark)
    summary = warc.write_warc(docs, str(tmp_path), n_files=4).collect()
    assert sorted(r["warc_file"] for r in summary) == [
        f"part-{i:05d}.warc" for i in range(4)
    ]
    assert sum(r["n_records"] for r in summary) == 40
    recs = warc.read_warc(spark, str(tmp_path))
    resp = {r["url"]: r for r in recs.filter(F.col("rec_type") == "response").collect()}
    src = {r["url"]: r for r in docs.collect()}
    assert set(resp) == set(src)
    for url, r in resp.items():
        assert bytes(r["payload"]) == bytes(src[url]["payload"])
        assert r["http_status"] == 200
        assert r["warc_date"] == "2025-01-01T00:00:00Z"
    # one warcinfo record per file, before the responses
    infos = recs.filter(F.col("rec_type") == "warcinfo").collect()
    assert len(infos) == 4


def test_gzip_equals_plain(spark, tmp_path):
    docs = _docs(spark)
    d_plain, d_gz = str(tmp_path / "p"), str(tmp_path / "g")
    warc.write_warc(docs, d_plain, n_files=3).collect()
    warc.write_warc(docs, d_gz, n_files=3, compress=True).collect()
    assert len(glob.glob(os.path.join(d_gz, "*.warc.gz"))) == 3
    cols = ["rec_type", "rec_id", "url", "content_length", "payload"]

    def _resp(d):
        recs = warc.read_warc(spark, d).filter(F.col("rec_type") == "response")
        return sorted(map(tuple, recs.select(*cols).collect()))

    a, b = _resp(d_plain), _resp(d_gz)
    assert a == b
    # Common Crawl layout: each record its own gzip member — seeking
    # to a member boundary mid-file yields a valid parse (the property
    # index-based random access relies on)
    raw = open(glob.glob(os.path.join(d_gz, "*.warc.gz"))[0], "rb").read()
    second = raw.index(b"\x1f\x8b", 1)
    fields, block = next(warc.iter_warc_records(raw[second:]))
    assert fields["warc-type"] == "response"


def test_writer_is_deterministic(spark, tmp_path):
    docs = _docs(spark)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        warc.write_warc(docs, d, n_files=2, compress=True).collect()
    for name in sorted(os.listdir(d1)):
        assert open(os.path.join(d1, name), "rb").read() == open(
            os.path.join(d2, name), "rb"
        ).read()


def test_truncated_record_raises(spark, tmp_path):
    warc.write_warc(_docs(spark, 6), str(tmp_path), n_files=1).collect()
    path = glob.glob(os.path.join(str(tmp_path), "*.warc"))[0]
    raw = open(path, "rb").read()
    with pytest.raises(ValueError, match="EOF"):
        list(warc.iter_warc_records(raw[: len(raw) - 30]))
    with pytest.raises(ValueError, match="not a WARC record"):
        list(warc.iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\nbody\r\n\r\n"))


def test_cli_replays_warc_directory(spark, tmp_path):
    """`--pages <dir> --pages-format warc` runs the full CLI pipeline
    off a WARC dump instead of a parquet pages table."""
    import json

    from breakchecker_spark import cli

    html_root = (
        b'<html><body><a href="https://acme.gr/c">c</a>'
        b"<p>info@acme.gr</p></body></html>"
    )
    html_c = b"<html><body><p>sales@acme.gr</p></body></html>"
    docs = spark.createDataFrame(
        [(0, "https://acme.gr/", html_root), (1, "https://acme.gr/c", html_c)],
        "doc_id long, url string, payload binary",
    )
    wdir = str(tmp_path / "dump")
    warc.write_warc(docs, wdir, n_files=1, compress=True).collect()
    out = str(tmp_path / "report.json")
    rc = cli.main(
        [
            "--domain", "acme.gr",
            "--pages", wdir,
            "--pages-format", "warc",
            "--depth", "2",
            "--output", out,
            "--fmt", "json",
        ]
    )
    assert rc == 0
    rep = json.loads(open(out).read())
    got = {e["email"] for e in rep["emails"]}
    assert got == {"info@acme.gr", "sales@acme.gr"}


def test_warc_to_pages_feeds_crawl(spark, tmp_path):
    """A WARC dump of a 2-page site replays through the real crawl."""
    from breakchecker_spark import schemas
    from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl

    html_root = b'<html><body><a href="https://site.example/a">a</a></body></html>'
    html_a = b"<html><body>leaf contact@site.example</body></html>"
    docs = spark.createDataFrame(
        [
            (0, "https://site.example/", html_root),
            (1, "https://site.example/a", html_a),
        ],
        "doc_id long, url string, payload binary",
    )
    warc.write_warc(docs, str(tmp_path), n_files=1).collect()
    pages = warc.warc_to_pages(warc.read_warc(spark, str(tmp_path)))
    assert pages.columns == [f.name for f in schemas.PAGES.fields]
    seeds = spark.createDataFrame([("site.example", "https")], schema=schemas.SEEDS)
    res = run_crawl(spark, seeds, pages, CrawlConfig(scope_host="site.example"))
    urls = {r["url"] for r in res.url_seen.collect()}
    assert urls == {"https://site.example", "https://site.example/a"}
    kinds = {(r["kind"], r["identifier"]) for r in res.contacts.collect()}
    assert ("email", "contact@site.example") in kinds
