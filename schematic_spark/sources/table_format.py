"""TableFormat — thin storage abstraction (SURVEY §7).

North rule targets Iceberg tables; this sandbox has no
iceberg-spark-runtime jar and is offline, so the layer picks at runtime:

* **IcebergFormat** when the Iceberg Spark extensions are on the
  classpath — real snapshots (``VERSION AS OF``), schema evolution DDL,
  append/overwrite through the catalog;
* **ParquetDirFormat** otherwise — parquet directories plus a
  ``_snapshots.json`` manifest emulating snapshot ids (monotonic,
  content-addressed) so checkpoint/resume code is identical either way.

Only this module knows which backend is live; the suite, checkpoint and
lineage code speak TableFormat.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


class TableFormat:
    """Interface: read/write/append + snapshot listing + time travel.

    ``partition_by`` requests storage-level partitioning on the named
    columns (hive-style dirs for parquet, identity partitioning for
    Iceberg) so downstream filters on those columns prune at the FILE
    level — e.g. the checkpoint layer partitions violations by bucket.
    """

    def read(self, spark, table, snapshot_id=None) -> DataFrame:
        raise NotImplementedError

    def write(self, df, table, mode="overwrite", partition_by=None) -> str:
        raise NotImplementedError

    def snapshots(self, spark, table) -> list[dict]:
        raise NotImplementedError


@dataclass
class IcebergFormat(TableFormat):
    """Real Iceberg catalog tables (requires runtime jar)."""

    catalog: str = "spark_catalog"

    def read(self, spark, table, snapshot_id=None) -> DataFrame:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(table)

    def write(self, df, table, mode="overwrite", partition_by=None) -> str:
        if mode == "overwrite":
            writer = df.writeTo(table).using("iceberg")
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(
                    *[F.col(c) for c in partition_by]
                )
            writer.createOrReplace()
        else:
            df.writeTo(table).append()
        snaps = self.snapshots(df.sparkSession, table)
        return str(snaps[-1]["snapshot_id"]) if snaps else ""

    def snapshots(self, spark, table) -> list[dict]:
        rows = spark.sql(f"SELECT * FROM {table}.snapshots").collect()
        return [
            {"snapshot_id": r["snapshot_id"],
             "committed_at": str(r["committed_at"])}
            for r in rows
        ]


@dataclass
class ParquetDirFormat(TableFormat):
    """Parquet directory per table + _snapshots.json manifest.

    Layout::

        <root>/<table>/_snapshots.json
        <root>/<table>/snap-<id>/part-*.parquet

    Each write lands in a fresh ``snap-<id>`` dir and appends a manifest
    entry; reads resolve the latest (or requested) snapshot. Appends
    list parent snapshots so the manifest is a lineage chain like
    Iceberg's."""

    root: str

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_snapshots.json")

    def _load_manifest(self, table: str) -> list[dict]:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _store_manifest(self, table: str, manifest: list[dict]) -> None:
        os.makedirs(self._table_dir(table), exist_ok=True)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic swap

    def read(self, spark, table, snapshot_id=None) -> DataFrame:
        manifest = self._load_manifest(table)
        if not manifest:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        if snapshot_id is None:
            entry = manifest[-1]
        else:
            entry = next(
                e for e in manifest if e["snapshot_id"] == snapshot_id
            )
        paths = [
            os.path.join(self._table_dir(table), d)
            for d in entry["dirs"]
        ]
        if len(paths) == 1:
            return spark.read.parquet(paths[0])
        # multiple snapshot roots: Spark refuses to merge several
        # hive-partitioned roots in one call (CONFLICTING_DIRECTORY_
        # STRUCTURES) — read each root and union (schemas may differ by
        # layout: partition columns land at the end)
        out = None
        for p in paths:
            d = spark.read.parquet(p)
            out = d if out is None else out.unionByName(
                d, allowMissingColumns=True
            )
        return out

    def write(self, df, table, mode="overwrite", partition_by=None) -> str:
        manifest = self._load_manifest(table)
        snap_seq = len(manifest)
        snap_id = f"{snap_seq:06d}-{uuid.uuid5(uuid.NAMESPACE_URL, table + str(snap_seq)).hex[:12]}"
        snap_dir = f"snap-{snap_id}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(
            os.path.join(self._table_dir(table), snap_dir)
        )
        if mode == "append" and manifest:
            dirs = manifest[-1]["dirs"] + [snap_dir]
            parent = manifest[-1]["snapshot_id"]
        else:
            dirs = [snap_dir]
            parent = manifest[-1]["snapshot_id"] if manifest else None
        manifest.append({
            "snapshot_id": snap_id,
            "parent_id": parent,
            "mode": mode,
            "dirs": dirs,
            "partition_by": list(partition_by) if partition_by else [],
        })
        self._store_manifest(table, manifest)
        return snap_id

    def snapshots(self, spark, table) -> list[dict]:
        return self._load_manifest(table)


def resolve_format(
    spark: SparkSession, *, parquet_root: str | None = None
) -> TableFormat:
    """Iceberg when available, else parquet-dir emulation."""
    if iceberg_available(spark):
        return IcebergFormat()
    return ParquetDirFormat(root=parquet_root or "/tmp/schematic_spark_tables")
