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

Operating recipes under a real catalog (not executable in this sandbox —
no Iceberg jar — but standard public Iceberg-on-Spark SQL):

* MERGE-free upsert of a layer table (idempotent re-ingest): write the
  new batch to a staging table, then
  ``INSERT OVERWRITE <t> SELECT * FROM <t_stage>`` scoped by the cell-
  prefix partition predicate — only the touched partitions rewrite, the
  rest of the table is untouched metadata-wise (dynamic overwrite mode);
* snapshot rollback after a bad write:
  ``CALL <catalog>.system.rollback_to_snapshot('<db>.<t>', <snap_id>)``
  with snapshot ids from ``<t>.snapshots`` — the engine's stage outputs
  are append-only, so rollback is always safe;
* compaction for the small-files the per-stage writers produce:
  ``CALL <catalog>.system.rewrite_data_files(table => '<db>.<t>',
  strategy => 'binpack')`` scheduled off the query path;
* time travel for reproducing a past bench/correctness run:
  ``SELECT ... FROM <t> VERSION AS OF <snap_id>``.
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

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, self.namespace, name)

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
        else:
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def backend(self) -> str:
        return "iceberg" if self.iceberg else "parquet"
