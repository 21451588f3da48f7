"""Iceberg-shaped table layer with a partitioned-parquet sandbox fallback.

The north rule stores documents/violations/verdicts in Iceberg tables and
keys resume on snapshot ids. This container has no Iceberg runtime jars, so
the engine talks to a thin :class:`Lakehouse` interface instead:

* with Iceberg available (``use_iceberg=True`` and the catalog configured),
  calls map 1:1 onto ``df.writeTo(table).append()`` / ``spark.table`` /
  snapshot metadata;
* otherwise the fallback implements the same contract on a directory layout:
  each ``append`` writes a ``snap-<id>`` data directory FIRST and only then
  commits it to ``_snapshots.json`` — readers only see committed snapshots,
  giving the same atomic-append / time-travel semantics resume relies on.

Either way the engine code above this interface is identical — swap-in is a
constructor flag, not a fork (SURVEY.md §7.3.5).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401


class Lakehouse:
    """Iceberg-shaped table contract. A real Iceberg binding must implement
    exactly THREE methods with these semantics (the swap is mechanical —
    tests/test_pipeline.py::test_lakehouse_interface_conformance is the
    executable spec any implementation must pass):

    * ``append(table, df, meta=None) -> snapshot_id`` — atomic commit; the
      returned id names the commit; ``meta`` (e.g. the source cursor) rides
      the commit itself (Iceberg: snapshot summary properties via
      ``df.writeTo(t).option("snapshot-property.X", v).append()``), so a
      crash can never separate data from its provenance stamp;
    * ``read(table, as_of=None)`` — current state, or time-travel to a
      snapshot id (Iceberg: ``VERSION AS OF``);
    * ``read_since(table, after) -> (df | None, cursor)`` — rows appended
      strictly after snapshot ``after`` (Iceberg: incremental scan with
      ``start-snapshot-id``/``end-snapshot-id``), plus the new cursor.

    ``snapshots``/``current_snapshot``/``snapshot_meta`` are derived
    conveniences over the same snapshot log (Iceberg: the ``.snapshots``
    metadata table)."""

    def __init__(self, spark: SparkSession, root: str,
                 use_iceberg: bool = False):
        self.spark = spark
        self.root = root
        if use_iceberg:  # pragma: no cover - jars absent in sandbox
            raise NotImplementedError(
                "Iceberg runtime jars are not present in this container; "
                "configure spark.sql.catalog.<name> and route writeTo/table "
                "calls here")
        os.makedirs(root, exist_ok=True)

    # -- internals -----------------------------------------------------------
    def _meta_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_snapshots.json")

    def _load_meta(self, table: str) -> list[dict]:
        p = self._meta_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _commit(self, table: str, snaps: list[dict]) -> None:
        p = self._meta_path(table)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, p)  # atomic on POSIX

    # -- public (Iceberg-shaped) ---------------------------------------------
    def append(self, table: str, df: DataFrame,
               meta: dict | None = None) -> str:
        """Write data, then commit — readers never see a partial append.

        ``meta`` is stored ON the snapshot entry (Iceberg: snapshot summary
        properties), making the commit self-describing: an incremental
        writer stamps its source cursor here, and a crashed-then-rerun tick
        can detect an already-committed batch without a side channel."""
        snapshot_id = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:6]}"
        data_dir = os.path.join(self.root, table, snapshot_id)
        df.write.mode("overwrite").parquet(data_dir)
        snaps = self._load_meta(table)
        snaps.append({"snapshot_id": snapshot_id, "ts": time.time(),
                      "path": data_dir, "meta": meta or {}})
        self._commit(table, snaps)
        return snapshot_id

    def read(self, table: str, as_of: str | None = None) -> DataFrame:
        """All committed snapshots, or time-travel up to ``as_of``."""
        snaps = self._load_meta(table)
        if as_of is not None:
            cut = [i for i, s in enumerate(snaps)
                   if s["snapshot_id"] == as_of]
            if not cut:
                raise ValueError(f"unknown snapshot {as_of}")
            snaps = snaps[:cut[0] + 1]
        if not snaps:
            raise ValueError(f"table {table} has no committed snapshots")
        return self.spark.read.parquet(*[s["path"] for s in snaps])

    def read_since(self, table: str,
                   after: str | None) -> tuple[DataFrame | None, str | None]:
        """Incremental read: rows appended strictly AFTER snapshot ``after``
        (None ⇒ everything), up to the current snapshot — the
        snapshot-checkpoint primitive an incremental validation run keys on
        (Iceberg's incremental scan between snapshot ids): a resumed
        consumer validates only new appends, records the returned cursor in
        its manifest, and re-running with the same cursor re-reads nothing.

        Returns ``(df, cursor)``; ``df`` is None when there is nothing new,
        and ``cursor`` always names the newest committed snapshot (or
        ``after`` when the table is unchanged).
        """
        snaps = self._load_meta(table)
        if after is not None:
            idx = [i for i, s in enumerate(snaps)
                   if s["snapshot_id"] == after]
            if not idx:
                raise ValueError(f"unknown snapshot {after}")
            new = snaps[idx[0] + 1:]
        else:
            new = snaps
        if not new:
            return None, after
        df = self.spark.read.parquet(*[s["path"] for s in new])
        return df, new[-1]["snapshot_id"]

    def snapshots(self, table: str) -> list[dict]:
        return self._load_meta(table)

    def current_snapshot(self, table: str) -> str | None:
        snaps = self._load_meta(table)
        return snaps[-1]["snapshot_id"] if snaps else None

    def snapshot_meta(self, table: str, snapshot_id: str | None = None) -> dict:
        """Commit metadata of ``snapshot_id`` (default: newest). Empty dict
        for an unknown/empty table — callers probe with this, never raise."""
        snaps = self._load_meta(table)
        if not snaps:
            return {}
        if snapshot_id is None:
            return snaps[-1].get("meta", {}) or {}
        for s in snaps:
            if s["snapshot_id"] == snapshot_id:
                return s.get("meta", {}) or {}
        return {}
