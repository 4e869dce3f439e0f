"""Atomic, resumable snapshot store for crawl state.

Production deployments write these tables as Iceberg
(``df.writeTo(...).using("iceberg")`` — atomic snapshot commits, exact
resume via snapshot ids). This sandbox has no Iceberg runtime jars, so
the store reproduces the two Iceberg properties the north rule needs —
**atomic per-round commits** and **exact resume** — on plain parquet:

* every table version is written to an immutable directory
  ``<root>/<table>/v<round>/``;
* a round is committed by atomically renaming ``_manifest.json.tmp`` →
  ``_manifest.json`` at the store root (os.replace is atomic on POSIX);
* a killed run resumes from the last committed manifest; orphan
  directories from a partially-written round are simply ignored.

The interface is format-agnostic: swap ``_write``/``_read`` for Iceberg
calls and nothing above this module changes.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    """Versioned table store with an atomic multi-table commit per round."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")

    # ------------------------------------------------------------ state

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

    # ------------------------------------------------------------- I/O

    def _table_dir(self, table: str, round_no: int) -> str:
        return os.path.join(self.root, table, f"v{round_no}")

    def stage(self, table: str, df: DataFrame, round_no: int) -> str:
        """Write one table version (not yet visible to readers)."""
        path = self._table_dir(table, round_no)
        if os.path.exists(path):
            shutil.rmtree(path)  # orphan from a killed run
        df.write.mode("overwrite").parquet(path)
        return path

    def commit(self, round_no: int, tables: Dict[str, int], extra: dict | None = None) -> None:
        """Atomically publish {table: version} as the current state."""
        manifest = {"round": round_no, "tables": tables}
        if extra:
            manifest.update(extra)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path)

    def read(self, spark: SparkSession, table: str) -> Optional[DataFrame]:
        """Read a table at its last committed version (None if absent)."""
        m = self.manifest()
        if m is None or table not in m["tables"]:
            return None
        return spark.read.parquet(self._table_dir(table, m["tables"][table]))
