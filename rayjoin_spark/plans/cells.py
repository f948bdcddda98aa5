"""Uniform-grid cell indexing as a key column (no materialized index).

The reference builds a CSR bucket array over a gsize x gsize grid by
rasterizing each edge's bbox to the cells it covers (reference
src/grid/uniform_grid.h:44-86, 3-phase count/scan/fill :131-245). In Spark
the same spatial partitioning is just a key column: explode each edge over
its covered cell rectangle and let the shuffle hash-partition on the cell.
The count/prefix-sum/fill machinery is exactly what a shuffle write does
internally — we never materialize it.

Also provides the per-cell workload metrics the reference exposes as
histograms (src/grid/uniform_grid.h:360-494), which drive explicit salting
of hot cells at scale (see operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.plans.scaling import GridSpec


def cell_of(grid: GridSpec, col):
    return grid.cell_of(col)


def with_cell_bbox(edges: DataFrame, grid: GridSpec) -> DataFrame:
    """Add the covered-cell rectangle [ix1,ix2] x [iy1,iy2] of each edge's bbox
    (conservative over-approximation, mirroring reference
    src/grid/uniform_grid.h:63-83: candidate generation may over-approximate,
    never under-approximate)."""
    cx1 = grid.cell_of(F.col("x1"))
    cx2 = grid.cell_of(F.col("x2"))
    cy1 = grid.cell_of(F.col("y1"))
    cy2 = grid.cell_of(F.col("y2"))
    return (
        edges.withColumn("ix1", F.least(cx1, cx2))
        .withColumn("ix2", F.greatest(cx1, cx2))
        .withColumn("iy1", F.least(cy1, cy2))
        .withColumn("iy2", F.greatest(cy1, cy2))
    )


def explode_edges_to_cells(edges: DataFrame, grid: GridSpec) -> DataFrame:
    """One row per (cell, edge) the edge's bbox covers.

    Equivalent of the reference's `iterate_cell` double loop
    (src/grid/uniform_grid.h:79-83) — `explode(sequence(...))` twice.
    The output keeps ix1/iy1 so downstream joins can dedup candidate pairs
    without ever computing the exact intersection point (see
    operators/lsi.py).
    """
    e = with_cell_bbox(edges, grid)
    return e.withColumn("cx", F.explode(F.sequence("ix1", "ix2"))).withColumn(
        "cy", F.explode(F.sequence("iy1", "iy2"))
    )


def cell_counts(edge_cells: DataFrame) -> DataFrame:
    """Edges per cell — the reference's grid histogram input
    (src/grid/uniform_grid.h:169-199)."""
    return edge_cells.groupBy("cx", "cy").agg(F.count("*").alias("ne"))


def cell_workload(edge_cells_a: DataFrame, edge_cells_b: DataFrame) -> DataFrame:
    """Per-cell join workload ne_a * ne_b — the skew diagnostic the reference
    prints (src/grid/uniform_grid.h:444-494). Drives hot-cell salting."""
    ca = cell_counts(edge_cells_a).withColumnRenamed("ne", "ne_a")
    cb = cell_counts(edge_cells_b).withColumnRenamed("ne", "ne_b")
    return (
        ca.join(cb, ["cx", "cy"], "inner")
        .withColumn("workload", F.col("ne_a") * F.col("ne_b"))
    )


def workload_histogram(workload: DataFrame, n_buckets: int = 16) -> DataFrame:
    """log2-bucketed histogram of per-cell workload (PrintHistogram analog)."""
    b = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.log2(F.col("workload").cast("double") + F.lit(1.0))).cast("int"),
    )
    return (
        workload.withColumn("bucket", b)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_cells"), F.sum("workload").alias("total_workload"))
        .orderBy("bucket")
    )
