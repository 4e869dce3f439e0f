"""Checkpoint compaction (Iceberg rewrite_data_files analogue) + gc."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from breakchecker_spark import schemas
from breakchecker_spark.plans.checkpoint import CheckpointStore
from breakchecker_spark.plans.crawl import CrawlConfig, run_crawl
from tests import fixture_web


def _versions_on_disk(root: str, table: str) -> list[str]:
    return sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(root, table, "v*"))
    )


def test_compact_merges_versions_and_gc_removes_old(spark, tmp_path):
    root = str(tmp_path / "store")
    store = CheckpointStore(root)
    for r in range(4):
        df = spark.createDataFrame([(r * 10 + i,) for i in range(5)], "x long")
        store.stage_append("t", df, r)
        store.commit(r)
    assert len(_versions_on_disk(root, "t")) == 4
    assert store.read(spark, "t").count() == 20

    did = store.compact(spark, "t", 4, min_versions=4)
    assert did
    # compaction alone is invisible until commit
    assert store.read(spark, "t").count() == 20
    df5 = spark.createDataFrame([(99,)], "x long")
    store.stage_append("t", df5, 4)
    store.commit(4)
    removed = store.gc()
    assert removed == 4  # v0..v3 superseded by v4c
    assert _versions_on_disk(root, "t") == ["v4", "v4c"]
    rows = {r["x"] for r in store.read(spark, "t").collect()}
    assert rows == {r * 10 + i for r in range(4) for i in range(5)} | {99}


def test_compact_noop_below_threshold(spark, tmp_path):
    store = CheckpointStore(str(tmp_path / "s2"))
    store.stage_append("t", spark.createDataFrame([(1,)], "x long"), 0)
    store.commit(0)
    assert not store.compact(spark, "t", 1, min_versions=8)


def test_kill_between_compact_and_commit_is_safe(spark, tmp_path):
    """A compacted-but-uncommitted version must not change reads, and a
    new store instance (simulated restart) must still see old state and
    gc the orphan."""
    root = str(tmp_path / "s3")
    store = CheckpointStore(root)
    for r in range(3):
        store.stage_append("t", spark.createDataFrame([(r,)], "x long"), r)
        store.commit(r)
    store.compact(spark, "t", 3, min_versions=3)
    # "killed" here: new instance, no commit of the compaction
    store2 = CheckpointStore(root)
    assert store2.read(spark, "t").count() == 3
    assert store2.gc() == 1  # the orphan v3c
    assert store2.read(spark, "t").count() == 3


def test_compact_skips_table_with_pending_rewrite(spark, tmp_path):
    """A staged rewrite (resume-time rebucket) must not be clobbered by
    a same-commit compaction: compact() reading only COMMITTED (old
    layout) versions would overwrite _pending with stale-bucket data —
    silent seen-misses downstream (ADVICE r3). compact() now defers."""
    root = str(tmp_path / "s4")
    store = CheckpointStore(root)
    for r in range(3):
        df = spark.range(r * 10, r * 10 + 10).select(
            F.col("id").alias("key_hash"),
            F.pmod("id", F.lit(4)).cast("int").alias("bucket"),
        )
        store.stage_append("t", df, r, partition_by="bucket")
        store.commit(r)
    # rebucket to modulus 8, staged but not yet committed
    rewritten = store.read(spark, "t").drop("bucket").withColumn(
        "bucket", F.pmod("key_hash", F.lit(8)).cast("int")
    )
    store.stage_rewrite("t", rewritten, "3rb", partition_by="bucket")
    assert store.compact(spark, "t", 3, partition_by="bucket", min_versions=2) is False
    assert store._pending["t"] == ["3rb"]
    # the round's delta chains on top of the rewrite and commits cleanly
    delta = spark.range(100, 110).select(
        F.col("id").alias("key_hash"),
        F.pmod("id", F.lit(8)).cast("int").alias("bucket"),
    )
    store.stage_append("t", delta, 3, partition_by="bucket")
    store.commit(3)
    out = store.read(spark, "t")
    assert out.count() == 40
    assert (
        out.filter(
            F.col("bucket") != F.pmod("key_hash", F.lit(8)).cast("int")
        ).count()
        == 0
    )


def test_crawl_with_frequent_compaction_matches_uninterrupted(spark, tmp_path):
    pages_df = spark.createDataFrame(fixture_web.pages_rows(), schema=schemas.PAGES)
    seeds_df = spark.createDataFrame(fixture_web.SEEDS, schema=schemas.SEEDS)
    base = dict(scope_host=fixture_web.SCOPE, max_depth=3, host_budget=1)

    plain = run_crawl(
        spark, seeds_df, pages_df, CrawlConfig(**base, use_bloom=False)
    )
    ckpt = str(tmp_path / "ck")
    compacted = run_crawl(
        spark,
        seeds_df,
        pages_df,
        CrawlConfig(**base, checkpoint_dir=ckpt, compact_every=2),
    )
    assert compacted.rounds == plain.rounds > 4  # budget=1 → many rounds
    v_seen = {(r["url"], r["depth"]) for r in plain.url_seen.collect()}
    v_comp = {(r["url"], r["depth"]) for r in compacted.url_seen.collect()}
    assert v_seen == v_comp
    # compaction really happened: far fewer url_seen versions than rounds
    n_versions = len(_versions_on_disk(ckpt, "url_seen"))
    assert n_versions < compacted.rounds
    # metrics survived compaction (sum over all rounds)
    total = (
        compacted.metrics.filter(F.col("metric") == "frontier_urls")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert total == compacted.summary["num_endpoints"]
