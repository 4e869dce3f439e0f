"""REST wrapper test (reference S12) — real HTTP round-trips."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from breakchecker_spark import schemas
from breakchecker_spark.api import make_handler, make_runner
from tests import fixture_web


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    pages_path = str(tmp_path_factory.mktemp("apipages") / "pages")
    spark.createDataFrame(fixture_web.pages_rows(), schema=schemas.PAGES).write.parquet(
        pages_path
    )
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(make_runner(pages_path))
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base, path, body, raw=False):
    req = urllib.request.Request(
        base + path,
        data=body if raw else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_scan_endpoint(server):
    code, rep = _post(server, "/api/scan/", {"domain": "example.com", "depth": 2})
    assert code == 200
    assert rep["summary"]["num_emails"] > 0
    assert "blog.example.com" in rep["subdomains"]
    assert any(e["email"] == "info@example.com" for e in rep["emails"])


def test_scan_endpoint_pre_extract(server):
    """pre_extract: true requests the replay-scale plan over the REST
    wrapper (r4 verdict item #8) — same report as the classic mode."""
    classic = _post(server, "/api/scan/", {"domain": "example.com", "depth": 2})
    pre = _post(
        server,
        "/api/scan/",
        {"domain": "example.com", "depth": 2, "pre_extract": True},
    )
    assert pre[0] == 200
    assert pre[1]["summary"] == classic[1]["summary"]
    assert pre[1]["emails"] == classic[1]["emails"]
    assert pre[1]["subdomains"] == classic[1]["subdomains"]


def test_error_paths(server):
    assert _post(server, "/api/scan/", {"domain": "___"})[0] == 400
    assert _post(server, "/api/scan/", {})[0] == 400
    assert _post(server, "/api/scan/", b"{oops", raw=True)[0] == 400
    assert _post(server, "/api/nope", {"domain": "example.com"})[0] == 404
