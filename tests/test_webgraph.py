"""Web-graph operator tests: link-edge harvest, anchor aggregation,
PageRank vs a dense NumPy power iteration, recrawl deltas, TF-IDF.

The hash-gated channel (queries.anchor_text_topk / pagerank_scores /
recrawl_delta_schedule / tfidf_top_terms) proves value-exactness vs
DuckDB at fixture scale; these tests pin the semantics on adversarial
shapes the fixture graph cannot produce — dangling sinks, multi-edges,
self-loops, disconnected nodes, relative/mailto hrefs, and tie-breaks.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from breakchecker_spark.operators import webgraph
from breakchecker_spark.operators.textstats import tfidf_top_terms

PAGES = "url string, html binary"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], PAGES
    )


# ------------------------------------------------------------ link_edges


def test_link_edges_resolution_and_filtering(spark):
    html = (
        '<html><body>'
        '<a href="https://other.example/abs">Abs Link</a>'
        '<a href="/root-rel">Root  Rel</a>'
        '<a href="sibling">Sib</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="tel:+1555">tel</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="">empty</a>'
        "</body></html>"
    )
    got = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in webgraph.link_edges(
            _pages(spark, [("https://a.example/dir/page", html)])
        ).collect()
    )
    # mailto/tel/javascript/empty dropped; whitespace in anchors collapsed
    assert got == [
        ("https://a.example/dir/page", "https://a.example/dir/sibling", "Sib"),
        ("https://a.example/dir/page", "https://a.example/root-rel", "Root Rel"),
        ("https://a.example/dir/page", "https://other.example/abs", "Abs Link"),
    ]


def test_link_edges_null_and_binary_inputs(spark):
    df = spark.createDataFrame(
        [("https://a.example/", None), (None, b"<a href='/x'>x</a>")], PAGES
    )
    assert webgraph.link_edges(df).count() == 0


# ----------------------------------------------------------- anchor_stats


def test_anchor_stats_counts_and_tiebreak(spark):
    edges = spark.createDataFrame(
        [
            ("s1", "d1", "buy"),
            ("s2", "d1", "buy"),
            ("s3", "d1", "shop"),   # 2×buy beats 1×shop
            ("s1", "d2", "x"),
            ("s2", "d2", "y"),      # 1-1 tie → lexicographically larger wins
        ],
        "src string, dst string, anchor string",
    )
    got = {
        r["dst"]: (r["in_links"], r["distinct_anchors"], r["top_anchor"])
        for r in webgraph.anchor_stats(edges).collect()
    }
    assert got == {"d1": (3, 2, "buy"), "d2": (2, 2, "y")}


# -------------------------------------------------------------- pagerank


def _numpy_pagerank(edges, iterations=5, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for s, t in edges:
            nxt[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (nxt + dangling / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        # dangling sink (3 has no out-edges) + multi-edge 1→2 ×2
        [(1, 2), (1, 2), (1, 3), (2, 3)],
        # self-loop + cycle + a node reachable from nowhere
        [(1, 1), (1, 2), (2, 1), (3, 1)],
        # two disconnected components, one all-dangling
        [(1, 2), (3, 4), (4, 3), (5, 6)],
    ],
)
def test_pagerank_matches_dense_reference(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in webgraph.pagerank(df, iterations=5).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # stochastic completion: total rank mass is conserved exactly
    assert math.fsum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert webgraph.pagerank(df, iterations=2).count() == 0


# --------------------------------------------------------- snapshot_delta


def test_snapshot_delta_and_priority(spark):
    old = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u2", "h2"), ("u3", "hX"), ("u4", "h4")], "url string, fingerprint string"
    )
    delta = webgraph.snapshot_delta(old, new)
    got = {r["url"]: r["status"] for r in delta.collect()}
    assert got == {"u1": "gone", "u2": "unchanged", "u3": "changed", "u4": "new"}
    pri = {
        r["url"]: r["priority"] for r in webgraph.recrawl_priority(delta).collect()
    }
    # gone leaves the frontier; changed < new < unchanged
    assert pri == {"u2": 2, "u3": 0, "u4": 1}


# ------------------------------------------------------------------ tfidf


def test_tfidf_against_python_reference(spark):
    corpus = [
        (0, "apple banana apple cherry"),
        (1, "banana banana durian"),
        (2, "cherry durian apple  apple\tapple"),
        (3, "unique_token"),
        (4, "   "),  # whitespace-only → no terms, no rows
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in tfidf_top_terms(df, top_k=2).collect()
    }

    # pure-Python reference with the same tokenizer and rounding
    docs = {i: [t for t in txt.lower().strip().split() if t] for i, txt in corpus}
    n = len(corpus)
    dfreq: dict[str, int] = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, toks in docs.items():
        scored = sorted(
            (
                (round(toks.count(t) * math.log(n / dfreq[t]), 6), t)
                for t in set(toks)
            ),
            key=lambda p: (-p[0], p[1]),
        )
        for rank, (score, term) in enumerate(scored[:2], start=1):
            want[(i, rank)] = (term, score)
    assert got == want
