"""WARC source/sink: the native container format of web-scale crawls.

Common Crawl — the corpus a replay crawl like ours would actually read
at 100 TB — ships as WARC 1.0 files, one gzip member per record
("per-record gzip"), ~1 GB per file, tens of thousands of files per
monthly crawl. This module gives the engine both directions:

* :func:`read_warc` — a distributed reader: ``binaryFile`` scan (one
  task per WARC file — parallelism equals file count, the standard
  Common Crawl processing shape) → pure-Python record parser inside
  ``mapInPandas`` → one row per record with the HTTP payload split
  out. No shuffle anywhere; column pruning applies downstream.
* :func:`write_warc` — a distributed, deterministic writer: each
  ``file_id`` group writes exactly one ``part-NNNNN.warc[.gz]`` via
  ``applyInPandas``, records sorted by ``doc_id``, fixed WARC-Date and
  gzip mtime=0, so re-exports are byte-identical (the property the
  round-trip oracle and the dedup fixtures rely on). On a cluster the
  output directory is shared storage and every task owns its own file
  — the same one-file-per-task shape distributed WARC exporters use.

The reference has no WARC support (it fetches live, break_checker.py
:742-839); this is a SURVEY.md "beyond the reference" source for the
large-scale training-data pipeline: replaying a public crawl instead
of hitting the network.

Format notes (ISO 28500 / WARC 1.0):
- record = version line ``WARC/1.0``, CRLF header fields,
  ``Content-Length`` naming the block size in bytes, blank line,
  block, then CRLF CRLF separator;
- ``response`` records carry ``Content-Type: application/http;
  msgtype=response`` and the block is a full HTTP/1.1 message — the
  reader splits status line / headers / body so downstream sees the
  page bytes, not the wire framing;
- ``.warc.gz`` is a concatenation of independent gzip members (one
  per record); ``gzip.decompress`` handles multi-member streams, so
  the reader treats plain and gzipped files identically.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import uuid
from typing import Iterable, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

# one row per WARC record; payload = HTTP body for response records,
# raw block otherwise
WARC_RECORD_SCHEMA = (
    "warc_file string, rec_type string, rec_id string, warc_date string, "
    "url string, http_status int, content_length long, payload binary"
)

# deterministic by design: exports must be reproducible byte-for-byte
_FIXED_DATE = "2025-01-01T00:00:00Z"
_SOFTWARE = "breakchecker_spark warc writer"


def _record_id(url: str) -> str:
    """Stable ``urn:uuid`` derived from the target URI (md5 → UUID)."""
    return f"<urn:uuid:{uuid.UUID(hashlib.md5(url.encode()).hexdigest())}>"


def _build_record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    return head + b"\r\n" + block + b"\r\n\r\n"


def _warcinfo_record(filename: str) -> bytes:
    body = (
        f"software: {_SOFTWARE}\r\nformat: WARC File Format 1.0\r\n"
    ).encode()
    return _build_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", _record_id("warcinfo:" + filename)),
            ("WARC-Date", _FIXED_DATE),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
            ("Content-Length", str(len(body))),
        ],
        body,
    )


def _response_record(url: str, payload: bytes, content_type: str) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
    )
    return _build_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", _record_id(url)),
            ("WARC-Date", _FIXED_DATE),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http; msgtype=response"),
            ("Content-Length", str(len(http))),
        ],
        http,
    )


def write_warc(
    docs: DataFrame,
    out_dir: str,
    n_files: int = 8,
    compress: bool = False,
    content_type: str = "text/plain; charset=utf-8",
) -> DataFrame:
    """Export ``(doc_id long, url string, payload binary)`` rows as WARC.

    Returns a lazy ``(warc_file, n_records, n_bytes)`` summary — the
    caller materializes it (``.collect()``) to force the writes. Each
    of the ``n_files`` groups (``pmod(doc_id, n_files)``) writes ONE
    file from its own task — writes never funnel through the driver,
    and the only shuffle is the groupBy on the tiny key. Files land
    atomically (tmp + ``os.replace``), records sorted by ``doc_id``
    with a leading ``warcinfo`` record, all dates fixed — a second
    export of the same rows is byte-identical.
    """
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    os.makedirs(out_dir, exist_ok=True)
    keyed = docs.withColumn(
        "_fid", F.pmod(F.col("doc_id"), F.lit(n_files)).cast("int")
    )

    def _write_group(pdf):
        import pandas as pd

        fid = int(pdf["_fid"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        name = f"part-{fid:05d}.warc" + (".gz" if compress else "")
        chunks = [_warcinfo_record(name)]
        for _, row in pdf.iterrows():
            chunks.append(
                _response_record(row["url"], bytes(row["payload"]), content_type)
            )
        if compress:
            # Common Crawl layout: one gzip member per record, mtime
            # pinned so the bytes are reproducible
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


def iter_warc_records(raw: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield ``(header_fields, block)`` per record; strict on framing.

    Accepts plain or multi-member-gzip bytes. Header field names are
    lower-cased. Raises ``ValueError`` on a bad version line, a
    missing/garbled ``Content-Length``, or a block that runs past the
    end of the file — a truncated WARC should fail the task loudly,
    not silently drop trailing records.
    """
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # handles concatenated members
    pos, n = 0, len(raw)
    while pos < n:
        while raw.startswith(b"\r\n", pos):  # inter-record separators
            pos += 2
        if pos >= n:
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header")
        lines = raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {lines[0]!r}")
        fields: dict = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"bad Content-Length at offset {pos}") from exc
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError(f"record block at offset {pos} runs past EOF")
        yield fields, raw[body_start : body_start + clen]
        pos = body_start + clen


def _split_http(block: bytes) -> Tuple[int | None, bytes]:
    """(status, body) from an ``application/http`` response block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, block
    status_line = block[:sep].split(b"\r\n", 1)[0].decode("utf-8", "replace")
    parts = status_line.split(" ", 2)
    status = int(parts[1]) if len(parts) >= 2 and parts[1].isdigit() else None
    return status, block[sep + 4 :]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader → one row per record (WARC_RECORD_SCHEMA).

    ``binaryFile`` assigns one whole file per task (Common Crawl files
    are ~1 GB — parallelism is the file count, thousands at scale, and
    each fits executor memory); the parser is pure Python but runs
    once per FILE inside an Arrow-batched ``mapInPandas``, not per
    row, so the hot loop is bytes-in/rows-out with no JVM round-trips
    mid-file. ``response`` records get their HTTP envelope split:
    ``payload`` is the page body, ``http_status`` the status code;
    other record types pass the raw block through.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                fname = os.path.basename(r["path"])
                for fields, block in iter_warc_records(bytes(r["content"])):
                    rec_type = fields.get("warc-type", "")
                    status: int | None = None
                    payload = block
                    if "application/http" in fields.get("content-type", ""):
                        status, payload = _split_http(block)
                    rows.append(
                        (
                            fname,
                            rec_type,
                            fields.get("warc-record-id", ""),
                            fields.get("warc-date", ""),
                            fields.get("warc-target-uri"),
                            status,
                            len(block),
                            payload,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file",
                    "rec_type",
                    "rec_id",
                    "warc_date",
                    "url",
                    "http_status",
                    "content_length",
                    "payload",
                ],
            )

    return files.mapInPandas(_parse, schema=WARC_RECORD_SCHEMA)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Project parsed response records onto the engine's pages shape.

    The bridge from a public crawl dump to :func:`plans.crawl.run_crawl`
    replay: URL + decoded HTML + visible text (re-derived by the same
    extractor the crawl uses downstream, so it is left null here and
    filled by ``extract``'s harvest — callers that need it eagerly can
    decode ``payload`` themselves).
    """
    return records.filter(
        (F.col("rec_type") == "response") & F.col("url").isNotNull()
    ).select(
        "url",
        F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.col("payload").alias("html"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
