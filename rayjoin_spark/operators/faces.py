"""Per-face polygon statistics from the planar-graph edge table.

The reference keeps faces implicit — every edge carries the ids of the
polygons on its left and right (reference src/map/map.h:52-60, fields
``left_polygon_id`` / ``right_polygon_id``) and queries resolve a hit
edge to a face id (src/map/map.h:79-87). This module adds the analytic
the reference leaves to downstream tools: exact per-face area and
boundary statistics, straight from that implicit representation.

Shoelace by incident side: an edge traversed p1 -> p2 contributes the
cross term ``x1*y2 - x2*y1`` positively to the face on its LEFT and
negatively to the face on its RIGHT; summing over a face's closed
boundary gives twice its signed area (counterclockwise positive). So

    area2(f) = sum_{left=f} cross(e) - sum_{right=f} cross(e)

— one stack-explode (2 rows per edge) and one map-side-combinable
groupBy, no geometry assembly, no ordering, no joins. All arithmetic is
exact: coords are snapped ints <= 2^28 (plans/scaling.py), each cross
term <= 2^57, and the per-face sum is carried in decimal(38,0) before a
final bigint cast, so a face would need ~2^70 max-magnitude boundary
edges to overflow.

The unbounded outer face (and any face id used as "no polygon") gets
the negative of everything else's total — included in the output, which
doubles as a closure check: all faces' area2 sums to 0 on a closed map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def face_stats(edges: DataFrame, map_id=None) -> DataFrame:
    """edges(x1,y1,x2,y2,left_polygon_id,right_polygon_id) ->
    (face_id, area2, n_edges, perim2_sum) with

    * ``area2``  — twice the exact signed area (bigint; CCW positive);
    * ``n_edges`` — boundary edge count (each edge counts once per side);
    * ``perim2_sum`` — sum of squared edge lengths (exact bigint; a
      portable perimeter proxy — summing double sqrt() lengths would be
      order-dependent across engines).

    ``map_id`` (a column NAME) optionally rides through as an extra
    grouping column for multi-layer inputs: faces of different maps stay
    separate rows instead of silently merging.
    """
    extra = [map_id] if map_id else []
    cross = (
        F.col("x1") * F.col("y2") - F.col("x2") * F.col("y1")
    ).cast("decimal(38,0)")
    len2 = (
        (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
        + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
    ).cast("decimal(38,0)")
    sides = edges.select(
        *extra,
        F.col("left_polygon_id").alias("face_id"),
        cross.alias("signed_cross"),
        len2.alias("len2"),
    ).unionAll(
        edges.select(
            *extra,
            F.col("right_polygon_id").alias("face_id"),
            (-cross).alias("signed_cross"),
            len2.alias("len2"),
        )
    )
    return (
        sides.groupBy(*extra, "face_id")
        .agg(
            F.sum("signed_cross").cast("bigint").alias("area2"),
            F.count("*").cast("bigint").alias("n_edges"),
            F.sum("len2").cast("bigint").alias("perim2_sum"),
        )
    )


def zonal_stats(
    points: DataFrame,
    edges: DataFrame,
    scaling,
    grid=None,
    value_col: str = "value",
    id_col: str = "point_id",
    index=None,
) -> DataFrame:
    """Zonal statistics: aggregate a point-value table per containing face
    of a polygon layer — the raster-analysis classic (zonal mean/min/max)
    re-expressed on the engine's own exact PIP operator.

    points: (id_col, x, y, value_col). Every input point contributes to
    exactly one zone; points outside every polygon aggregate under
    face_id 0 (the PIP miss convention), so totals are conserved —
    sum over zones == sum over input.

    Scale shape: pip_locate's banded cell join (reusable ``index``), one
    id-keyed join to re-attach values (narrow, same key as the locate
    output), one map-side-combinable groupBy on face_id. For float
    values note SUM order-dependence; exact engines should feed integer
    or decimal values.
    """
    from rayjoin_spark.operators.pip import pip_locate

    located = pip_locate(
        points.select(id_col, "x", "y"), edges, scaling, grid, index=index
    )
    j = located.join(points.select(id_col, value_col), id_col)
    v = F.col(value_col)
    return j.groupBy("face_id").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum(v).alias("sum_val"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )


def face_within(
    edges_a: DataFrame,
    edges_b: DataFrame,
    grid=None,
) -> DataFrame:
    """Polygon-containment join: which B faces lie entirely inside which
    A face. The ST_Within decomposition on the engine's own primitives:

        within(f_b, f_a)  <=>  pip(rep_vertex(f_b)) = f_a
                           AND no boundary edge of f_b intersects any
                               boundary edge of f_a (LSI pairs poison)

    — for a valid planar layer pair this is exactly containment (one
    boundary point inside + boundaries never crossing => all inside);
    on arbitrary segment soups it is still a well-defined, deterministic
    contract (the one the oracle re-derives independently).

    rep_vertex(f) is the lexicographic min (x, y) over the endpoints of
    f's boundary edges (both sides, reference face ids per
    src/map/map.h:52-60); it re-enters PIP through Scaling.identity()
    (snapped ints pass through the snap unchanged).

    Scale shape: one 4-way explode + combinable struct-min for reps
    (face-table sized), one pip_locate (banded cell join), one lsi_join
    (cell equi-join) whose pairs collapse to a DISTINCT face-pair poison
    table, one left_anti join. No cross join anywhere.
    """
    from rayjoin_spark.operators.lsi import lsi_join
    from rayjoin_spark.operators.pip import pip_locate
    from rayjoin_spark.plans.scaling import GridSpec, Scaling

    grid = grid or GridSpec(64)
    vb = edges_b.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("left_polygon_id").alias("f"),
                    F.col("x1").alias("x"), F.col("y1").alias("y"),
                ),
                F.struct(
                    F.col("left_polygon_id").alias("f"),
                    F.col("x2").alias("x"), F.col("y2").alias("y"),
                ),
                F.struct(
                    F.col("right_polygon_id").alias("f"),
                    F.col("x1").alias("x"), F.col("y1").alias("y"),
                ),
                F.struct(
                    F.col("right_polygon_id").alias("f"),
                    F.col("x2").alias("x"), F.col("y2").alias("y"),
                ),
            )
        ).alias("v")
    ).select("v.f", "v.x", "v.y")
    rep = (
        # face 0 is the exterior / "no polygon" marker (reference
        # src/map/map.h:52-60): the unbounded face is not a polygon and
        # must never be reported as contained
        vb.filter(F.col("f") != 0)
        .groupBy("f")
        .agg(F.min(F.struct("x", "y")).alias("m"))
        .select(
            F.col("f").alias("point_id"),
            F.col("m.x").cast("double").alias("x"),
            F.col("m.y").cast("double").alias("y"),
        )
    )
    located = pip_locate(rep, edges_a, Scaling.identity(), grid).select(
        F.col("point_id").alias("face_b"), F.col("face_id").alias("face_a")
    )
    pairs = lsi_join(edges_a, edges_b, grid).select("eid_a", "eid_b")
    fa = edges_a.select(
        F.col("eid").alias("eid_a"),
        F.col("left_polygon_id").alias("la"),
        F.col("right_polygon_id").alias("ra"),
    )
    fb = edges_b.select(
        F.col("eid").alias("eid_b"),
        F.col("left_polygon_id").alias("lb"),
        F.col("right_polygon_id").alias("rb"),
    )
    poison = (
        pairs.join(fa, "eid_a")
        .join(fb, "eid_b")
        .select(
            F.explode(F.array("la", "ra")).alias("face_a"),
            F.array("lb", "rb").alias("bs"),
        )
        .select("face_a", F.explode("bs").alias("face_b"))
        .distinct()
    )
    return (
        located.filter(F.col("face_a") != 0)
        .join(poison, ["face_a", "face_b"], "left_anti")
        .select(
            F.col("face_b").cast("bigint").alias("face_b"),
            F.col("face_a").cast("bigint").alias("face_a"),
        )
    )
