"""Physical-plan shape regressions — the 100 TB scale discipline.

Correctness tests prove each operator's output; these prove the PLAN
stays the one we'd ship to a 1000-executor cluster: filters reach the
parquet scan, projections prune columns, dimension joins broadcast,
and nothing silently degrades to a cartesian product or an
all-pairs nested loop outside the three labeled exact-ANN baselines.
A refactor that keeps results identical but, say, drops a broadcast
hint or breaks predicate pushdown fails here, not in production.

The crawl_* queries are excluded: they execute the iterative loop
eagerly at construction (their end-to-end shape is covered by the
BFS oracle tests and the scaling artifacts in BENCH/).
"""

from __future__ import annotations

import pytest

from breakchecker_spark import queries as Q

SF = "/root/testdata/sf0.001"

# documented exact baselines: brute-force cosine top-k and the two
# recall queries that compare a bucketed ANN variant against it
BNLJ_ALLOWED = {"ann_cosine_topk", "ivf_topk_recall", "lsh_topk_recall"}

# 1-row broadcast scalar attaches (crossJoin(broadcast(1-row agg))):
# a nested-loop join against a single broadcast row is O(rows) work —
# the distributed alternative to a driver-side collect of the scalar.
# tfidf attaches the corpus doc count; trigram_lm attaches the
# alphabet-size smoothing denominator.
SCALAR_BNLJ = {"tfidf_top_terms", "trigram_lm_scores"}

PLANNED = sorted(n for n in Q.QUERIES if not n.startswith("crawl_"))


def _explain(spark, name: str) -> str:
    df = Q.QUERIES[name](spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def plans(spark) -> dict:
    return {name: _explain(spark, name) for name in PLANNED}


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_nested_loop_joins_only_in_exact_baselines(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p
        and n not in BNLJ_ALLOWED | SCALAR_BNLJ
    ]
    assert offenders == []
    # and the baselines themselves broadcast the small (query) side —
    # the build side is a broadcast exchange, never a shuffled one
    for n in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" in plans[n]


def test_q1_pushdown_and_column_pruning(plans):
    p = plans["q1_pricing_summary"]
    # the shipdate predicate reaches the parquet reader...
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1]
    # ...and the scan reads only the needed columns (16-column table)
    assert "l_comment" not in p and "l_orderkey" not in p


def test_dimension_joins_broadcast(plans):
    """TPC-H star joins: every dim side broadcasts; a sort-merge join
    here would shuffle the fact table on each join key at scale."""
    for name in ("q3_shipping_priority", "q5_nation_revenue", "region_rollup"):
        assert "BroadcastHashJoin" in plans[name], name
        assert "SortMergeJoin" not in plans[name], name


def test_seen_membership_never_shuffles_the_seen_side(plans):
    """The bloom+confirm membership plan (both filter variants): the
    probe is a broadcast of the small surviving-candidate set against
    the seen table — the 10^10-key path shuffles nothing."""
    for name in ("seen_filter_new", "seen_filter_new_cuckoo"):
        assert "BroadcastHashJoin" in plans[name], name
        assert "SortMergeJoin" not in plans[name], name
        assert "ShuffledHashJoin" not in plans[name], name


def test_scans_are_columnar_batched(plans):
    """Parquet scans stay vectorized (Batched: true) for the pure-
    Catalyst text statistics — a plan that falls off the columnar path
    (e.g. an accidental per-row UDF above the scan) shows up here."""
    for name in ("token_count_stats", "lang_id_pred", "quality_scores"):
        assert "Batched: true" in plans[name], name


def test_webgraph_scans_prune_unused_document_columns(plans):
    """The web-graph queries project documents down to (doc_id, text)
    before anything heavy; a scan that drags n_chars/lang along would
    widen every downstream exchange at corpus scale."""
    for name in ("tfidf_top_terms", "recrawl_delta_schedule", "anchor_text_topk"):
        p = plans[name]
        assert "n_chars" not in p, name
        assert "lang" not in p, name


def test_pagerank_lineage_is_truncated(plans):
    """The pagerank query's final plan must read a checkpointed RDD —
    a 5-iteration join chain surviving into the plan means the
    localCheckpoint lineage truncation silently stopped working."""
    p = plans["pagerank_scores"]
    assert "ExistingRDD" in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
