"""Iceberg-backed table layer with a parquet fallback.

SURVEY §1.4/§7 mandates Iceberg-backed DataFrame pipelines as the durable
storage layer (the reference's binary map cache, src/map/planar_graph.h:
128-252, generalized to a catalog table). The layout contract is the same
either way:

* layer tables (chains / points / edges / checkpoint stages) are written
  PARTITIONED BY A CELL PREFIX — cell coordinates right-shifted by
  `prefix_bits` — so spatially-local queries prune partitions at scan
  time (Iceberg partition transforms or hive-style parquet directories);
* `TableStore.write/read` is the only IO seam: every caller is agnostic
  to which backend actually materialized the table.

Iceberg needs its runtime jar + a catalog conf
(`spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`,
`type=hadoop`, `warehouse=<dir>`) — standard public Spark/Iceberg setup.
When the class is absent (this sandbox), the store transparently falls
back to hive-partitioned parquet under the same directory layout, which
preserves the partition-pruning behavior the layout exists for.

Upsert + snapshot semantics are part of the SEAM, not just a doc recipe:

* ``upsert(df, name, partition_by)`` — partition-scoped overwrite (the
  MERGE-free idempotent re-ingest): only the cell-prefix partitions
  present in ``df`` are replaced. Iceberg: ``writeTo().overwritePartitions()``
  (dynamic overwrite, touched-partition metadata swap). Fallback: a NEW
  hardlink-snapshot version directory + a dynamic
  ``partitionOverwriteMode`` write into it — untouched partitions cost
  one hardlink per file, no data copy.
* ``snapshots(name)`` / ``rollback(name, snapshot)`` — Iceberg reads the
  ``<t>.snapshots`` metadata table / calls
  ``CALL <catalog>.system.rollback_to_snapshot(...)``. Fallback keeps
  every overwrite/upsert as a ``v=<N>`` directory with an atomically
  swapped ``_CURRENT`` pointer file — rollback repoints, exactly
  Iceberg's snapshot-pointer model. (Deviation: fallback ``append``
  writes in place and does not snapshot.)

Other real-catalog recipes (standard public Iceberg-on-Spark SQL):
compaction via ``CALL <catalog>.system.rewrite_data_files(table =>
'<db>.<t>', strategy => 'binpack')`` off the query path; time travel via
``SELECT ... FROM <t> VERSION AS OF <snap_id>`` to reproduce a past
bench/correctness run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rayjoin_spark.plans.scaling import GridSpec

#: default: 2^5 grid cells per partition bucket in each axis
DEFAULT_PREFIX_BITS = 5


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def configure_iceberg(spark: SparkSession, catalog: str, warehouse: str) -> None:
    """Set the standard hadoop-catalog confs (public Iceberg quickstart)."""
    spark.conf.set(f"spark.sql.catalog.{catalog}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{catalog}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{catalog}.warehouse", warehouse)


def with_cell_prefix(
    df: DataFrame, grid: GridSpec, prefix_bits: int = DEFAULT_PREFIX_BITS,
    cx: str = "cx", cy: str = "cy",
) -> DataFrame:
    """Add the partition columns p_cx/p_cy = cell >> prefix_bits."""
    return df.withColumn("p_cx", F.shiftright(F.col(cx), prefix_bits)).withColumn(
        "p_cy", F.shiftright(F.col(cy), prefix_bits)
    )


class TableStore:
    """write/read seam over Iceberg (preferred) or parquet (fallback).

    >>> store = TableStore(spark, "/data/warehouse")
    >>> store.write(edge_cells_with_prefix, "edges_a", partition_by=["p_cx"])
    >>> df = store.read("edges_a").filter(F.col("p_cx") == 3)   # pruned scan
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        catalog: str = "rayjoin",
        namespace: str = "db",
        force_parquet: bool = False,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.catalog = catalog
        self.namespace = namespace
        self.iceberg = (not force_parquet) and iceberg_available(spark)
        if self.iceberg:
            configure_iceberg(spark, catalog, warehouse)
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        else:
            os.makedirs(warehouse, exist_ok=True)

    # ---------------------------------------------------------------- api
    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.warehouse, self.namespace, name)

    # ------------------------------------------- fallback snapshot layout
    def _pointer_file(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_CURRENT")

    def _version_dir(self, name: str, v: int) -> str:
        return os.path.join(self._table_dir(name), f"v={v}")

    def _current_version(self, name: str) -> int:
        with open(self._pointer_file(name)) as f:
            return int(f.read().strip())

    def _set_current(self, name: str, v: int) -> None:
        tmp = self._pointer_file(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer_file(name))

    def _next_version(self, name: str) -> int:
        d = self._table_dir(name)
        os.makedirs(d, exist_ok=True)
        vs = [int(e.split("=", 1)[1]) for e in os.listdir(d) if e.startswith("v=")]
        return max(vs, default=0) + 1

    def _path(self, name: str) -> str:
        """Current fallback data directory (resolves the version pointer)."""
        return self._version_dir(name, self._current_version(name))

    @staticmethod
    def _hardlink_tree(src: str, dst: str) -> None:
        """Snapshot `src` into `dst` with hardlinks — O(#files), no data
        copy (parquet files are immutable once written; a dynamic
        overwrite REPLACES partition files rather than mutating them, so
        shared links are safe)."""
        for root, _, files in os.walk(src):
            rel = os.path.relpath(root, src)
            tgt = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(tgt, exist_ok=True)
            for fn in files:
                os.link(os.path.join(root, fn), os.path.join(tgt, fn))

    # ------------------------------------------------------------- verbs
    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        if self.iceberg:
            w = df.writeTo(self._ident(name)).using("iceberg")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
        elif mode == "append":
            # fallback deviation (documented): appends land in the current
            # version in place, no snapshot
            w = df.write.mode("append")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._path(name))
        else:
            v = self._next_version(name)
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._version_dir(name, v))
            self._set_current(name, v)

    def upsert(self, df: DataFrame, name: str, partition_by: list[str]) -> None:
        """Partition-scoped overwrite (MERGE-free idempotent re-ingest):
        replaces ONLY the partitions present in `df`, keeps the rest.
        Iceberg: dynamic overwritePartitions (a metadata swap of touched
        partitions). Fallback: hardlink-snapshot the current version, then
        a spark.sql.sources.partitionOverwriteMode=dynamic write into the
        new version — prior versions stay readable for rollback."""
        if self.iceberg:
            df.writeTo(self._ident(name)).overwritePartitions()
            return
        v = self._next_version(name)
        new_dir = self._version_dir(name, v)
        self._hardlink_tree(self._path(name), new_dir)
        old = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(new_dir)
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
        self._set_current(name, v)

    def snapshots(self, name: str) -> list[int]:
        """Snapshot ids, oldest first (Iceberg: the snapshots metadata
        table; fallback: the version directories)."""
        if self.iceberg:
            rows = self.spark.sql(
                f"SELECT snapshot_id FROM {self._ident(name)}.snapshots "
                "ORDER BY committed_at"
            ).collect()
            return [r["snapshot_id"] for r in rows]
        d = self._table_dir(name)
        return sorted(
            int(e.split("=", 1)[1]) for e in os.listdir(d) if e.startswith("v=")
        )

    def rollback(self, name: str, snapshot: int) -> None:
        """Point the table back at an earlier snapshot (bad-write undo).
        Iceberg: system.rollback_to_snapshot; fallback: atomic repoint of
        the _CURRENT pointer file."""
        if self.iceberg:
            self.spark.sql(
                f"CALL {self.catalog}.system.rollback_to_snapshot("
                f"'{self.namespace}.{name}', {snapshot})"
            )
            return
        if not os.path.isdir(self._version_dir(name, snapshot)):
            raise ValueError(f"unknown snapshot {snapshot} for table {name}")
        self._set_current(name, snapshot)

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def backend(self) -> str:
        return "iceberg" if self.iceberg else "parquet"
