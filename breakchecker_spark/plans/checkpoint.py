"""Atomic, resumable snapshot store for crawl state.

Production deployments write these tables as Iceberg
(``df.writeTo(...).using("iceberg")`` — atomic snapshot commits, exact
resume via snapshot ids). This sandbox has no Iceberg runtime jars, so
the store reproduces the three Iceberg properties the north rule needs
— **atomic per-round commits**, **append-only fast paths**, and
**exact resume** — on plain parquet:

* every table version is an immutable directory
  ``<root>/<table>/v<round>/``;
* *replace* tables (frontier, bloom) list one live version; *append*
  tables (url_seen, contacts, metrics) list every committed version —
  readers union them (Iceberg-manifest style), so a round writes only
  its delta, never the accumulated table;
* a round commits by atomically renaming ``_manifest.json.tmp`` →
  ``_manifest.json`` (os.replace is atomic on POSIX); orphan dirs from
  a killed round are ignored on resume.

The interface is format-agnostic: swap the parquet I/O for Iceberg
calls and nothing above this module changes.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F


def parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Spark job. Recursive so
    directory-partitioned tables (bucket=N subdirs) count correctly."""
    total = 0
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def partition_stats(path: str) -> Dict[str, tuple]:
    """Per-partition (files, rows, bytes) from parquet footers — no
    Spark job. Keys are the partition directory relative to the version
    root ("bucket=7", nested "a=1/b=2", or "" for an unpartitioned
    table). This is the raw material of the lineage table: who wrote
    how much into which partition, observable at commit time for free
    because the staging path already reads these footers for its
    returned row counts."""
    stats: Dict[str, tuple] = {}
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        part = os.path.dirname(os.path.relpath(f, path))
        md = pq.ParquetFile(f).metadata
        files, rows, nbytes = stats.get(part, (0, 0, 0))
        stats[part] = (files + 1, rows + md.num_rows, nbytes + os.path.getsize(f))
    return stats


# per-partition lineage rows, written driver-side at commit (no Spark
# job — same pyarrow fast path as the metrics table). One row per
# (staged table version, partition dir) per commit; history survives
# compaction because it describes what each COMMIT staged, not what is
# currently live. The analogue of Iceberg's per-snapshot manifest-entry
# stats (record_count / file_size per data file, rolled up to the
# partition).
LINEAGE_ARROW = pa.schema(
    [
        ("round", pa.int64()),
        ("table", pa.string()),
        ("version", pa.string()),
        ("partition", pa.string()),
        ("files", pa.int64()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
    ]
)


class CheckpointStore:
    """Versioned table store with an atomic multi-table commit per round."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")
        self._pending: Dict[str, List[int]] = {}
        # (table, version-str) → partition_stats for everything staged
        # since the last commit; flushed into the lineage table by it
        self._pending_lineage: Dict[tuple, Dict[str, tuple]] = {}

    # ------------------------------------------------------------ state

    def reset(self) -> None:
        """Drop all committed state (fresh-run semantics on a dirty dir)."""
        if os.path.exists(self.root):
            shutil.rmtree(self.root)
        os.makedirs(self.root, exist_ok=True)
        self._pending = {}
        self._pending_lineage = {}

    def manifest(self) -> Optional[dict]:
        """Last committed state, or None for a fresh store."""
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def last_round(self) -> int:
        """Round number of the last commit (-1 when fresh)."""
        m = self.manifest()
        return -1 if m is None else m["round"]

    def _committed_versions(self, table: str) -> List[int]:
        m = self.manifest()
        if m is None or table not in m["tables"]:
            return []
        return list(m["tables"][table])

    # ------------------------------------------------------------- I/O

    def _dir(self, table: str, version: int) -> str:
        return os.path.join(self.root, table, f"v{version}")

    def _write(
        self, table: str, df: DataFrame, version: int, partition_by: str | None = None
    ) -> None:
        path = self._dir(table, version)
        if os.path.exists(path):
            shutil.rmtree(path)  # orphan from a killed run
        if partition_by is None:
            # Size the output files instead of inheriting the plan's
            # partitioning (guide §6): a per-round delta is often KB
            # while the producing plan has core-count partitions, and
            # local scans split per-file (files.minPartitionNum =
            # parallelism defeats small-file packing) — so every
            # downstream read of a 32-file KB-sized delta costs 32
            # task schedules. AQE's rebalance writes one file for
            # small deltas and ~advisory-size files at scale — the
            # same adaptive rule both locally and on a cluster.
            df = df.hint("rebalance")
        writer = df.write.mode("overwrite")
        if partition_by is not None:
            # one shuffle of the (small) delta → one file per partition
            # value per version; Iceberg's bucket-transform layout on
            # plain parquet. Readers recover the column via per-version
            # partition discovery (see read()).
            writer = df.repartition(F.col(partition_by)).write.mode(
                "overwrite"
            ).partitionBy(partition_by)
        # snappy, deliberately: an interleaved 100k-page A/B measured
        # zstd at 128.6 s vs snappy at 45.0 s for the same crawl —
        # zstd-jni pays a per-file setup cost that dominates when a
        # round stages ~128 small delta files (32 buckets × 4 tables).
        # At real cluster scale with large files zstd wins on bytes;
        # flip via SPARK_GRAFT_CKPT_CODEC.
        writer.option(
            "compression", os.environ.get("SPARK_GRAFT_CKPT_CODEC", "snappy")
        ).parquet(path)

    def _record_lineage(self, table: str, version) -> int:
        """Footer-walk a freshly staged version once: remember its
        per-partition stats for the commit's lineage rows and return
        the total row count (the walk the stage_* return value already
        needed — lineage costs no extra I/O)."""
        stats = partition_stats(self._dir(table, version))
        self._pending_lineage[(table, str(version))] = stats
        return sum(rows for _files, rows, _bytes in stats.values())

    def stage_replace(self, table: str, df: DataFrame, round_no: int) -> int:
        """Write a full new version; commit makes it the only live one.
        Returns the staged row count (from parquet footers, no job)."""
        self._write(table, df, round_no)
        self._pending[table] = [round_no]
        return self._record_lineage(table, round_no)

    def stage_append(
        self,
        table: str,
        df: DataFrame,
        round_no: int,
        partition_by: str | None = None,
    ) -> int:
        """Write only this round's delta; readers union all versions.
        Returns the delta row count (from parquet footers, no job).

        ``partition_by`` lays the delta out as <dir>/<col>=<v>/ files —
        the plain-parquet analogue of Iceberg bucket partitioning; the
        url_seen table uses it with a key_hash bucket so membership
        probes can prune buckets and never shuffle the seen side."""
        self._write(table, df, round_no, partition_by=partition_by)
        # chain off an earlier same-commit staging (compaction) if any
        base = self._pending.get(table, self._committed_versions(table))
        self._pending[table] = list(base) + [round_no]
        return self._record_lineage(table, round_no)

    def commit(self, round_no: int, extra: dict | None = None) -> None:
        """Atomically publish all staged tables as the current state.

        Also flushes this commit's per-partition lineage (north rule:
        "per-partition lineage + metrics"): one row per staged
        (table version, partition dir) with file/row/byte counts,
        appended as a tiny driver-side parquet delta under the
        ``lineage`` table — no Spark job, and atomic with the commit
        because the manifest swap publishes both together."""
        m = self.manifest() or {"tables": {}}
        tables = dict(m["tables"])
        tables.update(self._pending)
        if self._pending_lineage:
            committed = list(tables.get("lineage", []))
            # same-round recommits (e.g. a resume-time rewrite) get a
            # distinct version dir so read() never unions one dir twice
            tag = round_no
            while tag in committed or str(tag) in map(str, committed):
                tag = f"{tag}l"
            rows = [
                {
                    "round": round_no,
                    "table": table,
                    "version": version,
                    "partition": part,
                    "files": files,
                    "rows": nrows,
                    "bytes": nbytes,
                }
                for (table, version), stats in sorted(self._pending_lineage.items())
                for part, (files, nrows, nbytes) in sorted(stats.items())
            ]
            path = self._dir("lineage", tag)
            if os.path.exists(path):
                shutil.rmtree(path)  # orphan from a killed run
            os.makedirs(path, exist_ok=True)
            pq.write_table(
                pa.Table.from_pylist(rows, schema=LINEAGE_ARROW),
                os.path.join(path, "part-00000.parquet"),
                compression="zstd",
            )
            tables["lineage"] = committed + [tag]
        manifest = {"round": round_no, "tables": tables}
        if extra:
            manifest.update(extra)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path)
        self._pending = {}
        self._pending_lineage = {}

    def stage_append_rows(
        self,
        table: str,
        rows: List[dict],
        schema: "pa.Schema",
        round_no: int,
    ) -> int:
        """Append a tiny driver-side delta with pyarrow — NO Spark job.

        The metrics table is a handful of rows per round; staging it
        through a Spark write was a whole job of fixed scheduler cost
        per round (r2 verdict). Spark reads the pyarrow-written file
        back exactly like its own output."""
        path = self._dir(table, round_no)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        tbl = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(
            tbl, os.path.join(path, "part-00000.parquet"), compression="zstd"
        )
        base = self._pending.get(table, self._committed_versions(table))
        self._pending[table] = list(base) + [round_no]
        self._record_lineage(table, round_no)
        return tbl.num_rows

    def stage_rewrite(
        self,
        table: str,
        df: DataFrame,
        tag: str | int,
        partition_by: str | None = None,
    ) -> str:
        """Stage a full rewrite of an append table as its only version.

        Used for one-time layout migrations (e.g. re-deriving the
        url_seen bucket column after a ``seen_buckets`` config change);
        published atomically by the next commit(), exactly like
        compact(). Returns the staged directory path so the caller can
        re-read it (truncating plan lineage)."""
        self._write(table, df, tag, partition_by=partition_by)
        self._pending[table] = [tag]
        self._record_lineage(table, tag)
        return self._dir(table, tag)

    def compact(
        self,
        spark: SparkSession,
        table: str,
        round_no: int,
        partition_by: str | None = None,
        min_versions: int = 8,
    ) -> bool:
        """Merge an append table's committed versions into one.

        The Iceberg ``rewrite_data_files`` maintenance analogue: after
        many rounds an append table is hundreds of small delta files
        (versions × buckets for url_seen); readers pay listing + open
        cost per file. Compaction reads every live version and writes
        one consolidated version dir (tagged ``<round>c``), staged as
        the only live version; the round's own delta then appends on
        top of it and the next commit() publishes both atomically — a
        kill mid-compaction leaves the old manifest and every old
        version dir intact. Superseded dirs are removed by gc() after
        the commit.

        No-op (returns False) unless the table has ≥ ``min_versions``
        committed versions. Call before stage_append for the round.

        Skipped when a rewrite is already pending for the table (e.g.
        the resume-time rebucket in plans/crawl.py): that rewrite is
        itself a single consolidated version, and reading committed
        (pre-rewrite) versions here would both clobber the pending
        rewrite and — when the old layout lacked the partition column —
        crash on repartition. The rewrite subsumes the compaction.
        """
        if table in self._pending:
            return False
        versions = self._committed_versions(table)
        if len(versions) < min_versions:
            return False
        df = self.read(spark, table)
        if df is None:
            return False
        tag = f"{round_no}c"
        self._write(table, df, tag, partition_by=partition_by)
        self._pending[table] = [tag]
        self._record_lineage(table, tag)
        return True

    def table_rows(self, table: str) -> Optional[int]:
        """Committed row count from parquet footers — no Spark job.
        None if the table has no committed versions."""
        versions = self._committed_versions(table)
        if not versions:
            return None
        return sum(parquet_rows(self._dir(table, v)) for v in versions)

    def gc(self) -> int:
        """Delete version dirs no committed manifest references.

        Safe only after commit(): anything not in the manifest is
        either a superseded (compacted-away) version or an orphan from
        a killed round. Returns the number of dirs removed."""
        m = self.manifest()
        if m is None:
            return 0
        removed = 0
        for table in os.listdir(self.root):
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            live = {f"v{v}" for v in m["tables"].get(table, [])}
            for d in os.listdir(tdir):
                if d.startswith("v") and d not in live:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
                    removed += 1
        return removed

    def verify_integrity(self) -> List[dict]:
        """Audit every live table version against its committed lineage.

        Re-walks the parquet footers of each version the manifest
        references and compares per-partition (files, rows, bytes)
        with what the writing commit recorded — detecting lost,
        truncated, or foreign data files *before* a resume trusts the
        checkpoint (the plain-parquet analogue of Iceberg validating
        manifest entries against data files). Driver-side only, no
        Spark job. Returns one dict per discrepancy (empty = intact);
        versions that predate lineage recording are skipped."""
        m = self.manifest()
        if m is None:
            return []
        recorded: Dict[tuple, tuple] = {}
        for v in m["tables"].get("lineage", []):
            d = self._dir("lineage", v)
            for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
                for r in pq.read_table(f).to_pylist():
                    recorded[(r["table"], r["version"], r["partition"])] = (
                        r["files"],
                        r["rows"],
                        r["bytes"],
                    )
        problems: List[dict] = []
        for table, versions in m["tables"].items():
            if table == "lineage":
                continue
            for v in versions:
                expected = {
                    part: s
                    for (t, ver, part), s in recorded.items()
                    if t == table and ver == str(v)
                }
                if not expected:
                    continue  # pre-lineage version (or zero-row delta)
                actual = partition_stats(self._dir(table, v))
                for part in sorted(set(actual) | set(expected)):
                    if actual.get(part) != expected.get(part):
                        problems.append(
                            {
                                "table": table,
                                "version": str(v),
                                "partition": part,
                                "expected": expected.get(part),
                                "actual": actual.get(part),
                            }
                        )
        return problems

    def read(self, spark: SparkSession, table: str) -> Optional[DataFrame]:
        """Read a table at its last committed state (None if absent).

        Each version is read separately (its own partition-discovery
        basePath, so directory-partition columns like bucket= are
        recovered) and unioned by name — the Iceberg-manifest read
        pattern on plain parquet."""
        versions = self._committed_versions(table)
        if not versions:
            return None
        # a zero-row partitionBy write leaves no data files — such a
        # version contributed nothing; skip it (schema can't be read)
        versions = [
            v
            for v in versions
            if glob.glob(
                os.path.join(self._dir(table, v), "**", "*.parquet"), recursive=True
            )
        ]
        if not versions:
            return None
        dfs = [spark.read.parquet(self._dir(table, v)) for v in versions]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out
