"""Duplicate-cluster tests: hash-to-min components + canonical keep.

The chain graph is the adversarial shape for label propagation (one
hop of progress per round), so it proves the driver loop iterates to
convergence rather than stopping after one pass; the clique and the
disjoint pair prove isolation between components. The full operator
also runs against a DuckDB WITH RECURSIVE transitive-closure oracle in
the correctness channel (queries.neardup_component_clusters).
"""

from __future__ import annotations

from breakchecker_spark.operators import dedup


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_components_chain_clique_and_pair(spark):
    # chain 1-2-3-4 (diameter 3 → needs >1 round), clique {10,11,12},
    # disjoint pair {20,21}
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {
        r["id"]: (r["component"], r["component_size"])
        for r in dedup.neardup_components(pairs).collect()
    }
    assert got == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 3), 11: (10, 3), 12: (10, 3),
        20: (20, 2), 21: (20, 2),
    }


def test_components_reversed_and_duplicate_edges(spark):
    # symmetric closure holds whichever column the smaller id lands in,
    # and parallel edges don't inflate sizes
    pairs = _pairs(spark, [(5, 3), (3, 5), (4, 5), (4, 5)])
    got = {
        r["id"]: (r["component"], r["component_size"])
        for r in dedup.neardup_components(pairs).collect()
    }
    assert got == {3: (3, 3), 4: (3, 3), 5: (3, 3)}


def test_keep_canonical_drops_cluster_losers_only(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 30)],
        "doc_id long, text string",
    )
    comp = dedup.neardup_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)])
    )
    kept = sorted(
        r["doc_id"] for r in dedup.keep_canonical(docs, comp).collect()
    )
    # representatives (1, 10, 20) plus never-paired docs (5, 30) survive
    assert kept == [1, 5, 10, 20, 30]
