"""Nearest-edge join (map matching): each query point -> the nearest
polyline segment, by EXACT point-to-segment squared distance.

The reference's grid answers "which edges intersect" (LSI, src/algo/
lsi.h:27-103) and "which face contains" (PIP upward ray, src/algo/
pip.h:12-115); the natural third query over the same uniform grid is
"which edge is closest" — the map-matching primitive (GPS point -> road
segment). We reuse the PIP/kNN machinery: edges exploded to their covered
cells (plans/cells.py, reference src/grid/uniform_grid.h:63-83) and the
kNN Chebyshev ring expansion (operators/knn.py), resolving a query as
soon as its current-best distance is strictly inside the ring-covered
radius.

Exactness: for snapped-int coordinates in [-2^28, 2^28] (plans/
scaling.py), the point-to-segment squared distance is

    d2 = |q - a|^2                 if dot <= 0 or len2 = 0  (int64)
       = |q - b|^2                 if dot >= len2           (int64)
       = cross^2 / len2            otherwise                (rational)

with dot = (b-a).(q-a) and cross = (b-a)x(q-a), |cross| <= 2^59,
len2 <= 2^59, so cross^2 <= 2^118 fits decimal(38,0). The total-order
key is floor(d2) plus two 59-bit fractional limbs (exact long division
via decimal pmod/DIV — the operators/pip.py limb technique): distinct
rationals n1/l1 != n2/l2 differ by >= 1/(l1*l2) >= 2^-118, so 118
fractional bits separate all distinct distances; ties break by eid.
floor(d2) itself fits int64 (d2 <= 2*2^58).

Scale shape: identical to knn_points — each round is one equi-join of
the active queries' ring cells against the hash-partitioned (broadcast
when small) edge-cell table; only unresolved queries survive; lineage is
cut per round with localCheckpoint. Ring r explodes the 8r perimeter
cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.operators.knn import _ring_offsets
from rayjoin_spark.plans.cells import (
    SPLIT_CELLS_DEFAULT,
    edge_cell_stats,
    explode_edges_to_cells,
)
from rayjoin_spark.plans.scaling import GridSpec, Scaling

#: 2^59 as a decimal literal for the fractional limb shifts
_SHIFT = "CAST(576460752303423488 AS decimal(38,0))"

#: exact limb key exprs over columns (c2 decimal(38,0), len2d decimal(38,0));
#: each step's numerator is <= 2^59 * 2^59 = 2^118 < 10^38 — no overflow.
_D2F_SQL = f"c2 DIV len2d"
_LO1_SQL = f"(pmod(c2, len2d) * {_SHIFT}) DIV len2d"
_LO2_SQL = f"(pmod(pmod(c2, len2d) * {_SHIFT}, len2d) * {_SHIFT}) DIV len2d"


# named sub-expressions for the perpendicular case, expanded textually into
# the limb exprs (kept as SQL so the whole key stays one codegen'd project)
_C2_SQL = (
    "(CAST((x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1) AS decimal(38,0))"
    " * CAST((x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1) AS decimal(38,0)))"
)
_LEN2D_SQL = "CAST((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) AS decimal(38,0))"


def _key_struct():
    """The exact distance key as one column expression (see module doc)."""
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    wx = F.col("qx") - F.col("x1")
    wy = F.col("qy") - F.col("y1")
    vx = F.col("qx") - F.col("x2")
    vy = F.col("qy") - F.col("y2")
    dot = dx * wx + dy * wy
    len2 = dx * dx + dy * dy
    d2a = wx * wx + wy * wy
    d2b = vx * vx + vy * vy
    endpoint = (len2 == 0) | (dot <= 0) | (dot >= len2)
    d2_end = F.when((len2 == 0) | (dot <= 0), d2a).otherwise(d2b)

    def limb(sql: str):
        return F.expr(sql.replace("len2d", _LEN2D_SQL).replace("c2", _C2_SQL)).cast(
            "bigint"
        )

    zero = F.lit(0).cast("bigint")
    return F.struct(
        F.when(endpoint, d2_end).otherwise(limb(_D2F_SQL)).alias("d2f"),
        F.when(endpoint, zero).otherwise(limb(_LO1_SQL)).alias("lo1"),
        F.when(endpoint, zero).otherwise(limb(_LO2_SQL)).alias("lo2"),
        F.col("eid").alias("eid"),
    )


def nearest_edge(
    points: DataFrame,
    edges: DataFrame,
    scaling: Scaling,
    grid: GridSpec | None = None,
    query_id: str = "point_id",
    broadcast_max: int = 2_000_000,
    max_rounds: int | None = None,
) -> DataFrame:
    """Nearest segment per query point.

    points: (query_id, x, y) doubles; edges: build_edges shape (eid,
    x1..y2 snapped ints, ...). Returns (query_id, eid, dist2) where dist2
    = floor of the exact squared snapped-int distance; the argmin itself
    is decided on the full 118-fractional-bit key, ties by smallest eid.
    """
    grid = grid or GridSpec(64)
    if max_rounds is None:
        max_rounds = 2 * grid.grid_size + 2
    cell_w = int(1.0 / grid.cell_scale)

    # long-edge pre-split, same 'auto' decision as lsi_join / PipIndex:
    # a long diagonal segment at a fine grid would otherwise explode its
    # bbox QUADRATICALLY (plans/cells.py module doc). dropDuplicates
    # below already absorbs the fragment-seam duplicate (cell, eid) rows.
    k = None
    (_, span, _, _) = edge_cell_stats(edges, grid)
    if span > SPLIT_CELLS_DEFAULT:
        k = SPLIT_CELLS_DEFAULT

    ec = (
        explode_edges_to_cells(edges, grid, k)
        .select(
            F.col("cx").alias("ecx"),
            F.col("cy").alias("ecy"),
            "eid",
            "x1",
            "y1",
            "x2",
            "y2",
        )
        .dropDuplicates(["ecx", "ecy", "eid"])
        .persist()
    )
    if ec.count() <= broadcast_max:
        ec = F.broadcast(ec)

    active = (
        points.select(
            F.col(query_id).alias("qid"),
            scaling.scale_x(F.col("x")).alias("qx"),
            scaling.scale_y(F.col("y")).alias("qy"),
        )
        .withColumn("qcx", grid.cell_of(F.col("qx")))
        .withColumn("qcy", grid.cell_of(F.col("qy")))
        .withColumn(
            "best",
            F.lit(None).cast(
                "struct<d2f:bigint,lo1:bigint,lo2:bigint,eid:bigint>"
            ),
        )
        .localCheckpoint(eager=True)
    )
    done = []
    for r in range(max_rounds):
        offs = _ring_offsets(r)
        ring = F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in offs
                ]
            )
        )
        probes = active.withColumn("o", ring).select(
            "qid",
            "qx",
            "qy",
            "qcx",
            "qcy",
            "best",
            (F.col("qcx") + F.col("o.dx")).alias("cx"),
            (F.col("qcy") + F.col("o.dy")).alias("cy"),
        )
        cand = probes.join(
            ec, (F.col("cx") == F.col("ecx")) & (F.col("cy") == F.col("ecy")), "inner"
        ).select("qid", _key_struct().alias("cand"))
        new_best = cand.groupBy("qid").agg(F.min("cand").alias("new"))
        merged = (
            active.join(new_best, "qid", "left")
            .withColumn("best", F.least("best", "new"))  # least skips nulls
            .drop("new")
        )
        # resolved when floor(d2) < (r*cell_w)^2: d2 < floor+1 <= safe2,
        # and any unseen edge lies entirely beyond the covered radius.
        # After ring grid_size the whole grid is swept: stop.
        safe2 = F.lit((r * cell_w) * (r * cell_w))
        is_done = (F.col("best").isNotNull() & (F.col("best.d2f") < safe2)) | F.lit(
            r >= grid.grid_size
        )
        merged = merged.localCheckpoint(eager=True)
        done.append(merged.filter(is_done).select("qid", "best"))
        active = merged.filter(~is_done)
        if active.isEmpty():
            active = None
            break
    if active is not None:
        done.append(active.select("qid", "best"))
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    ec.unpersist()
    return out.filter(F.col("best").isNotNull()).select(
        F.col("qid").alias(query_id),
        F.col("best.eid").alias("eid"),
        F.col("best.d2f").alias("dist2"),
    )
