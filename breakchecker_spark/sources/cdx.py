"""CDX(J) index: the lookup layer over WARC dumps, SURT-keyed.

Common Crawl pairs its WARC files with a CDXJ index — one line per
captured URL, ``<urlkey> <timestamp> <json>``, sorted by urlkey so a
reader can binary-search (or, distributed, partition-prune) straight
to the records it needs instead of scanning petabytes of WARC. The
urlkey is the SURT form of the URL (Sort-friendly URI Reordering
Transform): host labels reversed and comma-joined so one domain's
captures are contiguous, query parameters sorted so equivalent URLs
collide.

Everything is pure Catalyst — regexp extraction, array
reverse/sort/join, ``to_json``/``from_json`` — no Python UDFs: index
construction over 10^10 records is a narrow projection, and the
global ``orderBy(urlkey)`` that gives CDX its binary-search contract
is a single range-partitioned sort, the one shuffle the format's
value proposition pays for.

SURT contract implemented (the pywb/OpenWayback common core): scheme
and userinfo dropped, host lowercased, port dropped, host labels
reversed and comma-joined, ``)`` separator, path as-is (empty → /),
query parameters ``&``-sorted; fragments dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

_SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*://"

# json payload of a CDXJ line (stringly-typed numbers are the wild
# format's norm; we keep typed columns and let to_json render them)
CDX_JSON_SCHEMA = "url string, status int, length long, filename string"


def surt_key(url: Column) -> Column:
    """SURT urlkey of a URL column, all JVM-side."""
    host = F.lower(
        F.regexp_extract(url, _SCHEME + r"(?:[^/?#@]*@)?([^/?#:]+)", 1)
    )
    rhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    raw_path = F.regexp_extract(url, _SCHEME + r"[^/?#]+([^?#]*)", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    sorted_q = F.when(
        q != "", F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(q, "&")), "&"))
    ).otherwise(F.lit(""))
    return F.concat(rhost, F.lit(")"), path, sorted_q)


def build_cdx(records: DataFrame) -> DataFrame:
    """Parsed WARC response records → structured CDX rows.

    Input needs (url, warc_date, http_status, content_length,
    warc_file) — exactly what :func:`sources.warc.read_warc` emits.
    Output: (urlkey, timestamp, url, status, length, filename),
    globally sorted by (urlkey, timestamp) — the format's
    binary-search/partition-prune contract.
    """
    return (
        records.filter(F.col("url").isNotNull())
        .select(
            surt_key(F.col("url")).alias("urlkey"),
            F.regexp_replace(F.col("warc_date"), "[-:TZ]", "").alias("timestamp"),
            "url",
            F.col("http_status").alias("status"),
            F.col("content_length").alias("length"),
            F.col("warc_file").alias("filename"),
        )
        .orderBy("urlkey", "timestamp")
    )


def cdxj_lines(cdx: DataFrame) -> DataFrame:
    """CDX rows → one ``urlkey timestamp {json}`` line per record
    (single ``value`` column, ready for ``df.write.text``)."""
    return cdx.select(
        F.concat_ws(
            " ",
            F.col("urlkey"),
            F.col("timestamp"),
            F.to_json(F.struct("url", "status", "length", "filename")),
        ).alias("value")
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ text files → structured CDX rows.

    ``spark.read.text`` is line-splittable, so unlike the WARC reader
    the index scans with full intra-file parallelism — which is the
    point: prune here, then fetch only the needed WARC files.
    """
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", r"^(\S+) (\S+) (.*)$", 1).alias("urlkey"),
        F.regexp_extract("value", r"^(\S+) (\S+) (.*)$", 2).alias("timestamp"),
        F.from_json(
            F.regexp_extract("value", r"^(\S+) (\S+) (.*)$", 3), CDX_JSON_SCHEMA
        ).alias("j"),
    )
    return parsed.select(
        "urlkey", "timestamp", "j.url", "j.status", "j.length", "j.filename"
    )


def lookup_urls(cdx: DataFrame, wanted: DataFrame) -> DataFrame:
    """Prune a CDX index to the rows whose urlkey matches ``wanted``
    URLs — the distributed analogue of the binary search. ``wanted``
    is tiny next to the index, so it broadcasts; the index side is
    scanned, never shuffled (the seen-join property again)."""
    keys = wanted.select(surt_key(F.col("url")).alias("urlkey")).distinct()
    return cdx.join(F.broadcast(keys), "urlkey", "left_semi")
