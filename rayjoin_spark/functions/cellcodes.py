"""Hierarchical cell encoding (S2/H3 analog): Morton/Z-order quadtree ids.

BASELINE's north star names "batched H3/S2 cell encoding" as the unit of
spatial bucketing. The public H3/S2 libraries are not in this container,
and the semantics the engine needs — a hierarchical space-filling cell id
whose PREFIX is the parent cell — are exactly a Morton (Z-order) code
over the snapped uniform grid, the same construction S2 uses on each cube
face (Hilbert there, Z-order here; both are bit-interleavings with prefix
nesting). Two implementations, same results:

* `morton_id` — pure JVM column math (bit interleave as a sum of
  shift/mask terms inside whole-stage codegen): the hot path;
* `morton_id_pandas` — the Arrow-vectorized pandas-UDF variant the north
  star describes (NumPy bit ops over Arrow batches), kept for parity and
  tested equal to the column version.

Level semantics: level L uses the top L bits of each axis; the id packs
(cell_y bit, cell_x bit) pairs from the most significant level down, so
`parent_id(id, k) = id >> 2k` — ancestor ids are prefixes, ranges of a
cell's descendants are contiguous (the property that makes Z-order ids
joinable/partitionable at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.plans.scaling import GridSpec, Scaling

#: default quadtree depth: 2^11 = 2048 cells per axis (the grid default)
DEFAULT_LEVEL = 11


def cell_xy(scaling: Scaling, grid: GridSpec, x: Column, y: Column) -> tuple[Column, Column]:
    """Snapped grid cell of raw double coordinates."""
    return grid.cell_of(scaling.scale_x(x)), grid.cell_of(scaling.scale_y(y))


def interleave_bits(cx: Column, cy: Column, level: int = DEFAULT_LEVEL) -> Column:
    """Morton id: bit i of cx -> bit 2i, bit i of cy -> bit 2i+1 (bigint).

    A sum of shift/mask terms — pure codegen, no UDF. `level` bits per
    axis (cells must be < 2^level)."""
    cx, cy = cx.cast("bigint"), cy.cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(level):
        out = out + F.shiftleft(F.shiftright(cx, i).bitwiseAND(1), 2 * i)
        out = out + F.shiftleft(F.shiftright(cy, i).bitwiseAND(1), 2 * i + 1)
    return out


def morton_id(
    df: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    x: str = "x",
    y: str = "y",
    level: int = DEFAULT_LEVEL,
    out: str = "cell_id",
) -> DataFrame:
    cx, cy = cell_xy(scaling, grid, F.col(x), F.col(y))
    return df.withColumn(out, interleave_bits(cx, cy, level))


def parent_id(cell: Column, levels_up: int) -> Column:
    """Ancestor cell id `levels_up` levels coarser (prefix property)."""
    return F.shiftright(cell.cast("bigint"), 2 * levels_up)


def morton_id_pandas(
    df: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    x: str = "x",
    y: str = "y",
    level: int = DEFAULT_LEVEL,
    out: str = "cell_id",
) -> DataFrame:
    """Arrow-batched pandas-UDF variant (NumPy bit interleave) — identical
    results to `morton_id`; exists because the north-star protocol names
    the Arrow-vectorized form explicitly. Use the column version on hot
    paths (no Python boundary)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    rx, ry = scaling.rx, scaling.ry
    dx, dy = scaling.dx, scaling.dy
    cs = grid.cell_scale
    from rayjoin_spark.plans.scaling import INTERNAL_MIN

    # NB: no type hints — `from __future__ import annotations` stringifies
    # them and pandas_udf cannot resolve the deferred names; the returnType
    # argument carries the schema instead (PandasUDFType SCALAR default)
    @pandas_udf("bigint")
    def _morton(xs, ys):
        import numpy as np

        # same double ops as Scaling.scale_* / GridSpec.cell_of
        xi = (xs.to_numpy() * rx + dx).astype(np.int64)
        yi = (ys.to_numpy() * ry + dy).astype(np.int64)
        cx = ((xi - INTERNAL_MIN) * cs).astype(np.int64)
        cy = ((yi - INTERNAL_MIN) * cs).astype(np.int64)
        acc = np.zeros(len(xs), dtype=np.int64)
        for i in range(level):
            acc |= ((cx >> i) & 1) << (2 * i)
            acc |= ((cy >> i) & 1) << (2 * i + 1)
        return pd.Series(acc)

    return df.withColumn(out, _morton(F.col(x), F.col(y)))
