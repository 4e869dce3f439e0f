"""CDX(J) index: SURT edge cases, line round-trip, index pruning.

Complements the cdx_surt_index oracle with the hostile-URL corners
the deterministic fixture avoids, plus the WARC→CDX→lookup
composition that is the format's reason to exist.
"""

from pyspark.sql import functions as F

from breakchecker_spark.sources import cdx, warc


def _surt(spark, url):
    return (
        spark.range(1)
        .select(cdx.surt_key(F.lit(url)).alias("k"))
        .collect()[0]["k"]
    )


def test_surt_edges(spark):
    # userinfo + port dropped, host lowercased + reversed, query sorted
    assert (
        _surt(spark, "https://user:pw@A.B.example.ORG:8080/x?z=1&a=2#f")
        == "org,example,b,a)/x?a=2&z=1"
    )
    # bare host → root path; no query → no '?'
    assert _surt(spark, "http://example.com") == "com,example)/"
    # single-label host, trailing ?
    assert _surt(spark, "https://localhost/p?") == "localhost)/p"


def test_cdxj_roundtrip_and_sort(spark, tmp_path):
    records = spark.createDataFrame(
        [
            ("https://b.example/2", "2025-01-01T00:00:00Z", 200, 10, "f1.warc"),
            ("https://a.example/1", "2025-01-02T03:04:05Z", 404, 20, "f2.warc"),
        ],
        "url string, warc_date string, http_status int, "
        "content_length long, warc_file string",
    )
    built = cdx.build_cdx(records)
    lines = [r["value"] for r in cdx.cdxj_lines(built).collect()]
    # global urlkey sort: a.example before b.example
    assert lines[0].startswith("example,a)/1 20250102030405 {")
    assert lines[1].startswith("example,b)/2 20250101000000 {")
    out = str(tmp_path / "idx")
    cdx.cdxj_lines(built).write.text(out)
    back = {r["urlkey"]: r for r in cdx.read_cdx(spark, out).collect()}
    assert back["example,a)/1"]["status"] == 404
    assert back["example,a)/1"]["length"] == 20
    assert back["example,b)/2"]["filename"] == "f1.warc"
    assert back["example,b)/2"]["url"] == "https://b.example/2"


def test_lookup_prunes_index(spark):
    idx = cdx.build_cdx(
        spark.createDataFrame(
            [
                (f"https://h.example/p/{i}", "2025-01-01T00:00:00Z", 200, i, "f")
                for i in range(50)
            ],
            "url string, warc_date string, http_status int, "
            "content_length long, warc_file string",
        )
    )
    # equivalent-but-not-identical URLs must still hit (sorted query)
    wanted = spark.createDataFrame(
        [("https://H.EXAMPLE/p/7",), ("https://h.example:443/p/33",)],
        "url string",
    )
    hits = sorted(r["length"] for r in cdx.lookup_urls(idx, wanted).collect())
    assert hits == [7, 33]


def test_warc_to_cdx_composition(spark, tmp_path):
    """Index a WARC dump, prune by URL, confirm the pointed-at file."""
    docs = spark.createDataFrame(
        [(i, f"https://w.example/{i}", f"body {i}".encode()) for i in range(12)],
        "doc_id long, url string, payload binary",
    )
    warc.write_warc(docs, str(tmp_path), n_files=3).collect()
    recs = warc.read_warc(spark, str(tmp_path)).filter(
        F.col("rec_type") == "response"
    )
    idx = cdx.build_cdx(recs)
    wanted = spark.createDataFrame([("https://w.example/5",)], "url string")
    hit = cdx.lookup_urls(idx, wanted).collect()
    assert len(hit) == 1
    # doc 5 → file group 5 % 3 = 2 under the writer's pmod routing
    assert hit[0]["filename"] == "part-00002.warc"
