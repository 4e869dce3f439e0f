"""Boilerplate removal: segmentation semantics and the keep rule.

Pins the determinism contract the boilerplate_main_text oracle relies
on (block flush points, whitespace normalization, link-run counting)
plus the messy-markup behaviors the oracle fixture avoids on purpose:
entities, nesting, script skip, broken tags, binary html columns.
"""

from pyspark.sql import functions as F

from breakchecker_spark.operators import content


def test_segment_blocks_pure():
    html = (
        "<html><body>"
        "<div>Nav: <a href='/'>Home page</a></div>"
        "<p>First &amp; second</p>"
        "<script>var x = 'invisible text';</script>"
        "<p>tail</p>"
        "</body></html>"
    )
    blocks = content.segment_blocks(html)
    assert blocks == [
        ("Nav: Home page", len("Home page")),  # anchor text, normalized
        ("First & second", 0),  # entity decoded, no links
        ("tail", 0),  # script body invisible
    ]


def test_nested_blocks_flush_flat():
    # jusText-style flat segmentation: a block tag INSIDE a block
    # flushes the outer run — text never merges across the boundary
    blocks = content.segment_blocks("<div>outer <p>inner</p> after</div>")
    assert [b[0] for b in blocks] == ["outer", "inner", "after"]


def test_broken_markup_salvages():
    blocks = content.segment_blocks("<p>kept text<b><a href=>x</p><unclosed")
    assert blocks and blocks[0][0].startswith("kept text")


def test_block_stats_and_rethreshold(spark):
    pages = spark.createDataFrame(
        [
            (
                "u1",
                b"<p>short</p><p>a long enough content paragraph here</p>"
                b"<div><a href='/'>all links in this one</a></div>",
            )
        ],
        "url string, html binary",
    )
    stats = content.block_stats(pages).orderBy("block_idx").collect()
    assert [r["block_idx"] for r in stats] == [0, 1, 2]
    assert stats[0]["n_chars"] == 5 and stats[0]["link_density"] == 0.0
    assert stats[2]["link_density"] == 1.0
    # the block table re-thresholds with Catalyst only — no re-parse
    kept = [
        r["block_idx"]
        for r in stats
        if r["n_chars"] >= 10 and r["link_density"] <= 0.5
    ]
    assert kept == [1]


def test_main_text_keeps_order_and_counts(spark):
    pages = spark.createDataFrame(
        [
            (
                "u1",
                "<p>alpha block with plenty of characters</p>"
                "<div><a href='/'>Home About Contact Pricing</a></div>"
                "<p>omega block with plenty of characters</p>",
            ),
            ("u2", "<div><a href='/'>only navigation links here</a></div>"),
        ],
        "url string, html string",
    )
    out = {r["url"]: r for r in content.main_text(pages).collect()}
    assert out["u1"]["main_text"] == (
        "alpha block with plenty of characters\n"
        "omega block with plenty of characters"
    )
    assert out["u1"]["n_blocks"] == 3 and out["u1"]["n_dropped"] == 1
    # all-chrome pages still emit a (total-join-safe) empty row
    assert out["u2"]["main_text"] == "" and out["u2"]["n_dropped"] == 1
