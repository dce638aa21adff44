"""Thin snapshot/manifest table layer over parquet (Iceberg stand-in).

The north rule requires resumability "from Iceberg snapshot checkpoints";
no Iceberg runtime jar ships in this sandbox (SURVEY.md §7.3), so this
module supplies the same *semantics* on plain parquet, behind an interface
a real Iceberg catalog can replace one-for-one:

* every write produces an immutable ``snap-NNNNNN`` with a JSON manifest
  (schema, data paths, parent pointer, row count) — appends REFERENCE the
  parent's data files instead of rewriting them, exactly like Iceberg
  manifests;
* ``_LATEST`` is advanced by atomic rename — readers never observe a
  half-written snapshot (the reference's CHECKBIT header plays this
  corruption-fence role, /root/reference/src/util.cpp:45-75);
* time travel: ``read(name, snapshot_id)`` pins any historical snapshot;
  ``rollback`` re-points ``_LATEST``.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root

    # ---- paths -----------------------------------------------------------
    def _table(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _snap_dir(self, name: str, snap_id: int) -> str:
        return os.path.join(self._table(name), f"snap-{snap_id:06d}")

    def _latest_path(self, name: str) -> str:
        return os.path.join(self._table(name), "_LATEST")

    # ---- metadata --------------------------------------------------------
    def snapshots(self, name: str) -> list[int]:
        t = self._table(name)
        if not os.path.isdir(t):
            return []
        out = []
        for d in os.listdir(t):
            if d.startswith("snap-") and os.path.exists(
                os.path.join(t, d, "manifest.json")
            ):
                out.append(int(d.split("-")[1]))
        return sorted(out)

    def latest(self, name: str) -> int | None:
        p = self._latest_path(name)
        if not os.path.exists(p):
            return None
        return int(open(p).read().strip())

    def manifest(self, name: str, snap_id: int) -> dict:
        with open(os.path.join(self._snap_dir(name, snap_id), "manifest.json")) as f:
            return json.load(f)

    # ---- write -----------------------------------------------------------
    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> int:
        """Commit ``df`` as a new snapshot; returns its id.

        ``append`` reuses the parent snapshot's data files by reference —
        only the new rows are written (manifest-level append, no rewrite).
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unknown mode {mode!r}")
        parent = self.latest(name)
        snap_id = (parent + 1) if parent is not None else 0
        snap_dir = self._snap_dir(name, snap_id)
        data_dir = os.path.join(snap_dir, f"data-{uuid.uuid4().hex[:8]}")
        df.write.mode("errorifexists").parquet(data_dir)
        n_new = df.sparkSession.read.parquet(data_dir).count()

        paths = [data_dir]
        n_rows = n_new
        if mode == "append" and parent is not None:
            pm = self.manifest(name, parent)
            paths = pm["data_paths"] + paths
            n_rows += pm["n_rows"]

        manifest = {
            "snapshot_id": snap_id,
            "parent": parent,
            "mode": mode,
            "schema": df.schema.json(),
            "data_paths": paths,
            "n_rows": n_rows,
        }
        tmp = os.path.join(snap_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(snap_dir, "manifest.json"))
        self._advance_latest(name, snap_id)
        return snap_id

    def _advance_latest(self, name: str, snap_id: int) -> None:
        tmp = self._latest_path(name) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, self._latest_path(name))  # atomic commit point

    # ---- read ------------------------------------------------------------
    def read(
        self, spark: SparkSession, name: str, snapshot: int | None = None
    ) -> DataFrame:
        snap_id = self.latest(name) if snapshot is None else snapshot
        if snap_id is None:
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        m = self.manifest(name, snap_id)
        return spark.read.parquet(*m["data_paths"])

    def rollback(self, name: str, snapshot: int) -> None:
        if snapshot not in self.snapshots(name):
            raise ValueError(f"unknown snapshot {snapshot} for table {name!r}")
        self._advance_latest(name, snapshot)
