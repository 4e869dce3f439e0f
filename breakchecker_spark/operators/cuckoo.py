"""Partitioned cuckoo-filter URL-seen prefilter — the bloom alternative.

The north rule names "a partitioned bloom/cuckoo URL-seen set"; this
is the cuckoo half (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT'14 — public literature). Same table-of-parts
layout as the bloom (operators/seen.py): one (part_id, bits) row per
``pmod(key_hash, n_parts)`` partition, probed via
``cogroup().applyInPandas`` with no driver state and no whole-filter
broadcast.

What cuckoo buys over bloom:

* **deletion** — expiry/recrawl can remove keys without rebuilding
  (a counting bloom costs 4-8× the bits for the same ability);
* **incremental INSERT maintenance** — new keys are inserted into the
  existing parts (:func:`update_parts` cogroup), the exact analogue of
  the bloom path's per-round OR-merge;
* slightly better fp rate per bit at 16-bit fingerprints.

What bloom buys over cuckoo: inserts cannot fail (the cuckoo evict
loop can, at which point the part must be resized), and delta filters
union by bitwise OR with no state read-back. The crawl loop defaults
to bloom for that reason; the cuckoo operator is the drop-in for
pipelines that need deletion.

Semantics contract (same as bloom): ``might_contain`` has no false
negatives for any key whose inserts outnumber its deletes, so
probe-miss candidates are definitely new and skip the exact check;
probe hits are confirmed against the exact table. Deletion follows the
standard cuckoo-filter rules (Fan et al. §3.3): every insert stores a
copy — even when an identical fingerprint is already resident, because
that resident may be a *different* key's indistinguishable twin, and
deduping against it would let a later delete of the twin silently
remove this key too (a false negative). ``delete`` removes one stored
copy; delete only keys that were actually inserted, at most as many
times as they were inserted. Consequence: inserting the same key more
than 2×4 slots' worth of times overflows its two buckets — callers
insert each key once (filter_new output is already deduplicated).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("nbuckets", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)

_SLOTS = 4  # fingerprints per bucket (the paper's sweet spot)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain construction), vectorized."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _M1
    x = (x ^ (x >> np.uint64(27))) * _M2
    return x ^ (x >> np.uint64(31))


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    fp = (_mix(keys) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _index1(keys: np.ndarray, nbuckets: int) -> np.ndarray:
    return (_mix(keys ^ np.uint64(0x9E3779B97F4A7C15)) & np.uint64(nbuckets - 1)).astype(
        np.int64
    )


def _index2(i1: np.ndarray, fp: np.ndarray, nbuckets: int) -> np.ndarray:
    # partial-key cuckoo: the alternate bucket is derivable from
    # (bucket, fingerprint) alone — required for eviction
    return (i1 ^ (_mix(fp.astype(np.uint64)) & np.uint64(nbuckets - 1)).astype(np.int64))


class CuckooPart:
    """One partition's filter: (nbuckets, 4) uint16 fingerprint table."""

    def __init__(self, nbuckets: int, table: np.ndarray | None = None) -> None:
        self.nbuckets = nbuckets
        self.table = (
            table
            if table is not None
            else np.zeros((nbuckets, _SLOTS), dtype=np.uint16)
        )

    @classmethod
    def sized_for(cls, expected: int) -> "CuckooPart":
        need = max(int(expected / (_SLOTS * 0.95)) + 1, 4)
        nbuckets = 1 << (need - 1).bit_length()  # power of two for xor indexing
        return cls(nbuckets)

    @classmethod
    def from_bytes(cls, nbuckets: int, raw: bytes) -> "CuckooPart":
        table = np.frombuffer(raw, dtype=np.uint16).reshape(nbuckets, _SLOTS).copy()
        return cls(nbuckets, table)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    # ------------------------------------------------------------ ops

    def add(self, keys: np.ndarray, max_kicks: int = 500) -> None:
        """Insert each key (per-key kick loop; maintenance path only —
        the probe path below is fully vectorized)."""
        keys = keys.astype(np.int64).view(np.uint64)
        fps = _fingerprints(keys)
        i1s = _index1(keys, self.nbuckets)
        i2s = _index2(i1s, fps, self.nbuckets)
        rng_state = np.uint64(0x853C49E6748FEA9B)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            # NB: no presence check — a resident identical fingerprint
            # may belong to a different key (twin); always store a copy
            # so delete-one-copy can never false-negative another key
            # (module docstring, Fan et al. §3.3).
            placed = False
            for idx in (i1, i2):
                empty = np.flatnonzero(self.table[idx] == 0)
                if empty.size:
                    self.table[idx, empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # evict loop
            idx = int(i1)
            cur = fp
            for _ in range(max_kicks):
                rng_state = _mix(np.array([rng_state], dtype=np.uint64))[0]
                slot = int(rng_state % np.uint64(_SLOTS))
                cur, self.table[idx, slot] = self.table[idx, slot], cur
                idx = int(
                    _index2(
                        np.array([idx], dtype=np.int64),
                        np.array([cur], dtype=np.uint16),
                        self.nbuckets,
                    )[0]
                )
                empty = np.flatnonzero(self.table[idx] == 0)
                if empty.size:
                    self.table[idx, empty[0]] = cur
                    break
            else:
                raise RuntimeError(
                    "cuckoo part over capacity — resize (rebuild with larger "
                    "expected_per_part)"
                )

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe (no false negatives)."""
        keys = keys.astype(np.int64).view(np.uint64)
        fps = _fingerprints(keys)
        i1s = _index1(keys, self.nbuckets)
        i2s = _index2(i1s, fps, self.nbuckets)
        hit1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, keys: np.ndarray) -> int:
        """Remove one stored copy per present key; returns removals."""
        keys = keys.astype(np.int64).view(np.uint64)
        fps = _fingerprints(keys)
        i1s = _index1(keys, self.nbuckets)
        i2s = _index2(i1s, fps, self.nbuckets)
        removed = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for idx in (i1, i2):
                slots = np.flatnonzero(self.table[idx] == fp)
                if slots.size:
                    self.table[idx, slots[0]] = 0
                    removed += 1
                    break
        return removed


# ---------------------------------------------------------- DataFrame ops


def _keyed(df: DataFrame, n_parts: int) -> DataFrame:
    return df.select(
        F.pmod(F.col("key_hash"), F.lit(n_parts)).cast("int").alias("part_id"),
        "key_hash",
    )


def build_parts(
    seen: DataFrame, n_parts: int = 32, expected_per_part: int = 100_000
) -> DataFrame:
    """Build the partitioned cuckoo table from the exact seen table."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = CuckooPart.sized_for(expected_per_part)
        part.add(pdf["key_hash"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "part_id": [int(pdf["part_id"].iloc[0])],
                "nbuckets": [part.nbuckets],
                "bits": [part.to_bytes()],
            }
        )

    return (
        _keyed(seen, n_parts).groupBy("part_id").applyInPandas(_build, CUCKOO_SCHEMA)
    )


def _rewrite_parts(
    parts: DataFrame, keys: DataFrame, n_parts: int, expected_per_part: int, op: str
) -> DataFrame:
    def _apply(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = existing part rows (0 or 1), right = this partition's keys
        if left.empty:
            part = CuckooPart.sized_for(expected_per_part)
            pid = int(right["part_id"].iloc[0])
        else:
            part = CuckooPart.from_bytes(
                int(left["nbuckets"].iloc[0]), left["bits"].iloc[0]
            )
            pid = int(left["part_id"].iloc[0])
        ks = right["key_hash"].to_numpy(dtype=np.int64)
        if op == "add":
            part.add(ks)
        else:
            part.delete(ks)
        return pd.DataFrame(
            {"part_id": [pid], "nbuckets": [part.nbuckets], "bits": [part.to_bytes()]}
        )

    return (
        parts.groupBy("part_id")
        .cogroup(_keyed(keys, n_parts).groupBy("part_id"))
        .applyInPandas(_apply, CUCKOO_SCHEMA)
    )


def update_parts(
    parts: DataFrame,
    new_keys: DataFrame,
    n_parts: int = 32,
    expected_per_part: int = 100_000,
) -> DataFrame:
    """Incremental maintenance: insert this round's new keys into the
    existing parts — the cuckoo analogue of the bloom OR-merge.

    Untouched parts pass through unchanged only if present in
    ``parts``; parts with no prior row are created fresh."""
    return _rewrite_parts(parts, new_keys, n_parts, expected_per_part, "add")


def delete_keys(
    parts: DataFrame, keys: DataFrame, n_parts: int = 32
) -> DataFrame:
    """Remove keys (expiry / forced recrawl) — the bloom can't do this."""
    return _rewrite_parts(parts, keys, n_parts, 0, "delete")


def filter_new(
    candidates: DataFrame,
    seen: DataFrame,
    cuckoo_table: DataFrame,
    n_parts: int = 32,
    cache_registry: list | None = None,
    max_broadcast_rows: int | None = 4_000_000,
    candidate_bound: int | None = None,
) -> DataFrame:
    """Candidates whose key is not in the seen set — cuckoo-prefiltered.

    Mirrors operators/seen.py:filter_new's bloom shape: probe misses
    are definitely new (no false negatives) and bypass the exact
    check; probe hits confirm with a broadcast semi/anti pair, so the
    seen table is scanned, never shuffled. Results are exactly equal
    to a plain anti-join (tests/test_cuckoo.py).

    ``max_broadcast_rows`` / ``candidate_bound``: the same driver-OOM
    guard as the bloom path (seen.py). Survivors scale with the
    round's duplicate links, not with the filter's fp rate, so they
    are not inherently bounded; above the threshold the plan falls
    back to a shuffling anti-join. ``candidate_bound`` (a driver-known
    candidate-count upper bound) proves safety without the count job;
    ``None`` for ``max_broadcast_rows`` disables the guard."""
    cand_cols = candidates.columns
    cand = candidates.withColumn(
        "part_id", F.pmod(F.col("key_hash"), F.lit(n_parts)).cast("int")
    )
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series(dtype=bool))
        if right.empty:
            return left.assign(maybe_seen=False)
        part = CuckooPart.from_bytes(
            int(right["nbuckets"].iloc[0]), right["bits"].iloc[0]
        )
        return left.assign(
            maybe_seen=part.might_contain(left["key_hash"].to_numpy(dtype=np.int64))
        )

    probed = (
        cand.groupBy("part_id")
        .cogroup(cuckoo_table.groupBy("part_id"))
        .applyInPandas(_probe, schema=out_schema)
    )
    need_guard = max_broadcast_rows is not None and not (
        candidate_bound is not None and candidate_bound <= max_broadcast_rows
    )
    if cache_registry is not None:
        probed = probed.cache()
        cache_registry.append(probed)
    elif need_guard:
        # guard stays active without a caller registry: cache so the
        # count job doesn't recompute the probe (session-evicted)
        probed = probed.cache()
    definitely_new = probed.filter(~F.col("maybe_seen")).select(*cand_cols)
    survivors = probed.filter(F.col("maybe_seen")).select(*cand_cols)
    if need_guard:
        big = survivors.count() > max_broadcast_rows
        if cache_registry is None:
            # release the guard's cache on the registry-less path —
            # same leak fix as seen.filter_new (ADVICE r4)
            probed.unpersist()
        if big:
            new_survivors = survivors.join(
                seen.select("key_hash"), "key_hash", "left_anti"
            )
            return definitely_new.unionByName(new_survivors)
    confirmed = seen.select("key_hash").join(
        F.broadcast(survivors.select("key_hash")), "key_hash", "left_semi"
    )
    new_survivors = survivors.join(
        F.broadcast(confirmed.select("key_hash")), "key_hash", "left_anti"
    )
    return definitely_new.unionByName(new_survivors)
