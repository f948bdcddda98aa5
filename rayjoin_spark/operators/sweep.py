"""Union-of-rectangles area — the classic sweep-line measure problem
(Bentley 1977), distributed: how much ground does a set of axis-aligned
boxes actually cover, counting overlap once?

Role in the engine: the coverage analytic over bbox sets the spatial
stack already produces everywhere (edge bboxes in plans/cells.py,
clipped tile payloads, range_report candidate blocks) — "what fraction
of the map does layer A's ink cover", the areal sibling of
grid_cell_counts. The reference's grid machinery answers per-cell
counts (src/grid/uniform_grid.h:169-199); this answers the measure.

Decomposition: space is tiled (fixed width 2^tile_shift); each
rectangle is clipped to the tiles it overlaps (bounded explode, the
edges-to-cells contract of plans/cells.py — fan-out linear in the tile
span). Tiles partition the plane, so per-tile union areas are
independent and their sum is the global union area. Within one tile the
classic sequential sweep runs in an Arrow-batched pandas group
(applyInPandas — the documented custom-operator fallback for genuinely
non-SQL per-group logic): an x-ordered event sweep over a
y-compressed coverage-count array — each box updates its own y cells
once on enter and once on leave (vectorized slices), the covered
length is maintained incrementally by cells crossing 0 <-> >0, and
each inter-event slab contributes width x covered.

Exactness: all coordinates are int64, half-open boxes [x1,x2)x[y1,y2),
every contribution is an integer product — no epsilon anywhere;
per-tile area <= 4^tile_shift fits bigint for tile_shift <= 31. The
DuckDB oracle computes the SAME numbers by a DIFFERENT route (global
SQL slab sweep with running-max window functions, no pandas, no event
walk) — an independent algorithmic cross-check, not a transliteration.

Scale shape: one bounded 2-D explode + clip (codegen), one shuffle on
the tile key, per-tile python bounded by tile occupancy (pick
tile_shift so a tile holds ~10^3-10^4 clipped boxes; a pathological
all-boxes-in-one-tile input degrades to the sequential sweep, which is
the same remedy as every grid operator here: refine the grid).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tile(col: str, width: int) -> F.Column:
    # floor division exact for negative coords: subtract-pmod form
    # (event_rollup's documented pattern; Spark DIV truncates, pmod >= 0)
    return F.expr(f"(({col}) - pmod({col}, {width})) DIV {width}")


def _sweep_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Event sweep over one tile: y-coordinate compression + an active
    coverage-count array updated incrementally at each box edge. A box
    touches its own y-range cells exactly twice (enter/leave), each a
    vectorized slice op, and the running covered length is maintained by
    counting cells crossing 0 <-> >0 — so per-tile work is
    O(n log n + sum of per-box y-cell spans), not slabs x boxes."""
    import numpy as np

    if pdf.empty:
        return pd.DataFrame({"tile_x": [], "tile_y": [], "area": []})
    tx = int(pdf["tile_x"].iloc[0])
    ty = int(pdf["tile_y"].iloc[0])
    x1 = pdf["cx1"].to_numpy(np.int64)
    x2 = pdf["cx2"].to_numpy(np.int64)
    y1 = pdf["cy1"].to_numpy(np.int64)
    y2 = pdf["cy2"].to_numpy(np.int64)
    ys = np.unique(np.concatenate([y1, y2]))
    seg_len = np.diff(ys)
    a_idx = np.searchsorted(ys, y1)
    b_idx = np.searchsorted(ys, y2)
    # events: (x, is_leave, box) — enters before leaves at equal x is
    # irrelevant for area (zero-width slab between them), sort by x only
    ev_x = np.concatenate([x1, x2])
    ev_leave = np.concatenate(
        [np.zeros(len(x1), bool), np.ones(len(x2), bool)]
    )
    ev_box = np.concatenate([np.arange(len(x1)), np.arange(len(x2))])
    order = np.argsort(ev_x, kind="stable")
    cnt = np.zeros(len(seg_len), dtype=np.int64)
    covered = 0
    area = 0
    prev_x = None
    for e in order:
        x = int(ev_x[e])
        if prev_x is not None and x > prev_x:
            area += (x - prev_x) * covered
        prev_x = x
        box = ev_box[e]
        a, b = a_idx[box], b_idx[box]
        if ev_leave[e]:
            cnt[a:b] -= 1
            covered -= int(seg_len[a:b][cnt[a:b] == 0].sum())
        else:
            covered += int(seg_len[a:b][cnt[a:b] == 0].sum())
            cnt[a:b] += 1
    return pd.DataFrame({"tile_x": [tx], "tile_y": [ty], "area": [area]})


def union_area(
    rects: DataFrame,
    tile_shift: int = 16,
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
) -> DataFrame:
    """Per-tile union-of-rectangles area over half-open int boxes
    [x1,x2)x[y1,y2); degenerate boxes (empty interval on either axis)
    are dropped. Returns (tile_x, tile_y, area:bigint) for occupied
    tiles; the global union area is the caller's sum (tiles partition
    the plane, so the sum never double-counts). See module docstring
    for the algorithm, exactness and scale contract.
    """
    width = 1 << tile_shift
    r = rects.select(
        F.col(x1).cast("bigint").alias("x1"),
        F.col(y1).cast("bigint").alias("y1"),
        F.col(x2).cast("bigint").alias("x2"),
        F.col(y2).cast("bigint").alias("y2"),
    ).filter((F.col("x1") < F.col("x2")) & (F.col("y1") < F.col("y2")))
    exploded = (
        r.withColumn(
            "tile_x",
            F.explode(
                F.sequence(_tile("x1", width), _tile(f"x2 - 1", width))
            ),
        )
        .withColumn(
            "tile_y",
            F.explode(
                F.sequence(_tile("y1", width), _tile(f"y2 - 1", width))
            ),
        )
        .select(
            "tile_x",
            "tile_y",
            F.greatest(F.col("x1"), F.col("tile_x") * width).alias("cx1"),
            F.least(F.col("x2"), (F.col("tile_x") + 1) * width).alias("cx2"),
            F.greatest(F.col("y1"), F.col("tile_y") * width).alias("cy1"),
            F.least(F.col("y2"), (F.col("tile_y") + 1) * width).alias("cy2"),
        )
    )
    return exploded.groupBy("tile_x", "tile_y").applyInPandas(
        _sweep_group, "tile_x long, tile_y long, area long"
    )
