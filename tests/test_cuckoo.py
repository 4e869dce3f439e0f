"""Cuckoo-filter URL-seen prefilter: part semantics + DataFrame plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from breakchecker_spark.operators import cuckoo


def test_part_no_false_negatives_and_low_fp():
    part = cuckoo.CuckooPart.sized_for(5000)
    rng = np.random.default_rng(7)
    members = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    others = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    part.add(members)
    assert part.might_contain(members).all()  # no false negatives
    fp_rate = part.might_contain(others).mean()
    assert fp_rate < 0.02  # 16-bit fingerprints, 4-slot buckets


def test_part_delete_removes_membership():
    part = cuckoo.CuckooPart.sized_for(1000)
    keys = np.arange(1000, dtype=np.int64) * 7919 + 13
    part.add(keys)
    victims = keys[:100]
    removed = part.delete(victims)
    assert removed == 100
    # deleted keys can still false-positive via twins, but the bulk
    # must be gone; survivors must all remain
    assert part.might_contain(victims).mean() < 0.1
    assert part.might_contain(keys[100:]).all()


def test_twin_delete_keeps_other_key():
    """Two distinct keys with identical fingerprint AND bucket pair
    (indistinguishable twins): deleting one must not make the other a
    false negative. Requires copy-per-insert semantics (ADVICE r3 —
    the old presence-check dedupe violated this)."""
    part = cuckoo.CuckooPart(nbuckets=64)
    # brute-force a twin pair under this part's hash geometry
    keys = np.arange(0, 200_000, dtype=np.int64)
    fps = cuckoo._fingerprints(keys.view(np.uint64).copy())
    i1s = cuckoo._index1(keys.view(np.uint64).copy(), part.nbuckets)
    combo = fps.astype(np.int64) * part.nbuckets + i1s
    _, first_idx, counts = np.unique(combo, return_index=True, return_counts=True)
    dup_combo = combo[first_idx[counts > 1][0]]
    pair = keys[combo == dup_combo][:2]
    assert len(pair) == 2 and pair[0] != pair[1]
    part.add(pair)
    part.delete(pair[:1])
    assert part.might_contain(pair[1:]).all()


def test_incremental_update_equals_rebuild(spark):
    a = spark.range(0, 3000).select(F.xxhash64("id").alias("key_hash"))
    b = spark.range(3000, 5000).select(F.xxhash64("id").alias("key_hash"))
    full = cuckoo.build_parts(a.unionByName(b), n_parts=4, expected_per_part=4000)
    incr = cuckoo.update_parts(
        cuckoo.build_parts(a, n_parts=4, expected_per_part=4000),
        b,
        n_parts=4,
        expected_per_part=4000,
    )
    # membership agrees on every key of the union (exact table sizes
    # differ only via insertion order of twins)
    probe = spark.range(0, 5000).select(F.xxhash64("id").alias("key_hash"))

    def hits(parts):
        reg = []
        out = cuckoo.filter_new(probe, a.unionByName(b), parts, n_parts=4,
                                cache_registry=reg)
        n = out.count()
        for df in reg:
            df.unpersist()
        return n

    assert hits(full) == 0  # every probed key is truly seen
    assert hits(incr) == 0


def test_filter_new_equals_exact_anti_join(spark):
    seen = spark.range(0, 4000).select(F.xxhash64("id").alias("key_hash"))
    cands = spark.range(2000, 7000).select(
        F.xxhash64("id").alias("key_hash"), F.col("id").alias("orig")
    )
    parts = cuckoo.build_parts(seen, n_parts=8, expected_per_part=2000)
    got = {
        r["orig"]
        for r in cuckoo.filter_new(cands, seen, parts, n_parts=8).collect()
    }
    want = {
        r["orig"]
        for r in cands.join(seen, "key_hash", "left_anti").collect()
    }
    assert got == want == set(range(4000, 7000))


def test_filter_new_broadcast_guard_falls_back(spark):
    """Survivors above max_broadcast_rows → the plan must drop the
    broadcast hint (anti-join fallback, ADVICE r3 — this path was
    unguarded) and still return exactly the anti-join result, with no
    caller cache_registry needed for the guard to be active."""
    seen = spark.range(0, 4000).select(F.xxhash64("id").alias("key_hash"))
    cands = spark.range(0, 5000).select(
        F.xxhash64("id").alias("key_hash"), F.col("id").alias("orig")
    )
    parts = cuckoo.build_parts(seen, n_parts=4, expected_per_part=2000)
    want = set(range(4000, 5000))

    guarded = cuckoo.filter_new(
        cands, seen, parts, n_parts=4, max_broadcast_rows=100
    )
    assert "ResolvedHint" not in guarded._jdf.queryExecution().analyzed().toString()
    assert {r["orig"] for r in guarded.collect()} == want

    unguarded = cuckoo.filter_new(
        cands, seen, parts, n_parts=4, max_broadcast_rows=None
    )
    assert "ResolvedHint" in unguarded._jdf.queryExecution().analyzed().toString()
    assert {r["orig"] for r in unguarded.collect()} == want

    # candidate_bound below the threshold proves safety → broadcast kept
    bounded = cuckoo.filter_new(
        cands, seen, parts, n_parts=4, max_broadcast_rows=100_000,
        candidate_bound=5000,
    )
    assert "ResolvedHint" in bounded._jdf.queryExecution().analyzed().toString()
    assert {r["orig"] for r in bounded.collect()} == want


def test_delete_reopens_urls_for_recrawl(spark):
    """The cuckoo advantage: expire keys without rebuilding. After
    delete, the prefilter lets the key through and (with the exact
    row also removed) it surfaces as new."""
    seen = spark.range(0, 1000).select(F.xxhash64("id").alias("key_hash"))
    parts = cuckoo.build_parts(seen, n_parts=4, expected_per_part=1000)
    expired = spark.range(0, 100).select(F.xxhash64("id").alias("key_hash"))
    parts2 = cuckoo.delete_keys(parts, expired, n_parts=4)
    seen2 = seen.join(expired, "key_hash", "left_anti")
    cands = spark.range(0, 1000).select(
        F.xxhash64("id").alias("key_hash"), F.col("id").alias("orig")
    )
    got = {
        r["orig"]
        for r in cuckoo.filter_new(cands, seen2, parts2, n_parts=4).collect()
    }
    assert got == set(range(0, 100))
