"""PIP — point-in-polygon location via the upward-ray walk.

Semantics mirror the reference exactly (reference src/algo/pip.h:12-115 and
the grid walk src/app/pip_grid.h:37-70): for each query point, among base
edges whose x-range straddles the point (with Simulation-of-Simplicity by
query-map id, which also eliminates vertical edges), find the edge whose
intersection with the upward vertical ray has the smallest y; ties (shared
vertices) break by slope; the hit edge's face resolves via p1.x < p2.x
(src/map/map.h:79-87); a miss is the exterior face 0 (src/config.h:8).

Physical plan (all JVM-side):

* per round, active points equi-join edge-cells on (cx, cy) — the grid
  walk's "test this cell";
* exact comparisons: sign tests are int64; the argmin key is
  floor(n * 2^62 / b) computed with three int64 limbs and assembled in
  decimal(38,0) — an exact total-order key for the rational n/b (distinct
  candidate rationals differ by >= 2^-58 at our snap scale, so keys of
  distinct values differ; equal values give equal keys). The reference
  compares these in double (src/algo/pip.h:53) and hopes ("Roundoff error
  should not cause it, I hope"); we are exact;
* argmin per point is one `min_by(struct(...), struct(y_key, slope, eid))`
  partial-aggregating map-side — no window sort;
* empty cells are skipped: a broadcast map cx -> sorted non-empty cys lets
  each point jump straight to its next candidate cell (the reference walks
  cell-by-cell because a GPU step is ~free; a Spark round is a join, so we
  make rounds count).

Scale note: the walk touches only unresolved points each round and in
practice resolves ~all points in 1-3 non-empty cells; each round is an
equi-join co-partitioned on (cx, cy). The column-skip broadcast is
gsize^2 ints worst case — for gsize beyond ~8k on dense layers, switch
skip_empty_cells=False (plain +1 walk) or shard the skip map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.plans.cells import explode_edges_to_cells
from rayjoin_spark.plans.scaling import INTERNAL_MIN, GridSpec, Scaling

_P31 = 1 << 31
_P62_DEC = "4611686018427387904"  # 2^62 as decimal literal


def _floor_div(n, d):
    """floor(n / d) for bigint columns, d > 0 (SQL DIV truncates toward 0)."""
    r = F.pmod(n, d)
    return (n - r) / d  # exact: divisible


def _ykey_expr():
    """Exact decimal(38,0) total-order key for xsect_y = n/b, b>0.

    n = -a*px - c (|n| <= 2^59); key = floor(n * 2^62 / b) via 3 limbs.
    """
    n = (-F.col("a") * F.col("px") - F.col("c")).cast("bigint")
    b = F.col("b")
    r1 = F.pmod(n, b)
    q1 = ((n - r1) / b).cast("bigint")
    t2 = r1 * F.lit(_P31)
    r2 = F.pmod(t2, b)
    q2 = ((t2 - r2) / b).cast("bigint")
    t3 = r2 * F.lit(_P31)
    q3 = ((t3 - F.pmod(t3, b)) / b).cast("bigint")
    lo = q2 * F.lit(_P31) + q3  # < 2^62, non-negative
    return q1.cast("decimal(38,0)") * F.expr(f"CAST({_P62_DEC} AS DECIMAL(38,0))") + lo.cast(
        "decimal(38,0)"
    )


def _slope_key_expr(query_map_id: int):
    """Exact key for slope order a/b (b>0): floor(a * 2^62 / b), 2 limbs.

    The tie rule keeps the larger a/b for query_map_id=1 and the smaller
    for query_map_id=0 (reference src/algo/pip.h:77-92) — encode by sign
    flip so min_by always minimizes.
    """
    a, b = F.col("a"), F.col("b")
    t1 = a * F.lit(_P31)
    r1 = F.pmod(t1, b)
    q1 = ((t1 - r1) / b).cast("bigint")
    t2 = r1 * F.lit(_P31)
    q2 = ((t2 - F.pmod(t2, b)) / b).cast("bigint")
    key = q1.cast("decimal(38,0)") * F.lit(_P31).cast("decimal(38,0)") + q2.cast(
        "decimal(38,0)"
    )
    return (-key) if query_map_id == 1 else key


def prepare_query_points(
    points: DataFrame, scaling: Scaling, grid: GridSpec, x: str = "x", y: str = "y"
) -> DataFrame:
    px = scaling.scale_x(F.col(x))
    py = scaling.scale_y(F.col(y))
    return (
        points.withColumn("px", px)
        .withColumn("py", py)
        .withColumn("pcx", grid.cell_of(F.col("px")))
        .withColumn("pcy", grid.cell_of(F.col("py")))
    )


def _candidate_filter(cand: DataFrame, query_map_id: int) -> DataFrame:
    """x-range + below-edge filters with SoS (reference src/algo/pip.h:39-69)."""
    x_min = F.least("x1", "x2")
    x_max = F.greatest("x1", "x2")
    px, py = F.col("px"), F.col("py")
    if query_map_id == 0:
        in_x = (px > x_min) & (px <= x_max)
    else:
        in_x = (px >= x_min) & (px < x_max)
    s = px * F.col("a") + py * F.col("b") + F.col("c")
    sos_a = -F.col("a") if query_map_id == 0 else F.col("a")
    sos_b = -F.col("b") if query_map_id == 0 else F.col("b")
    s_eff = F.when(s != 0, s).when(F.col("a") != 0, sos_a).otherwise(sos_b)
    return cand.filter(in_x & (s_eff < 0))


def pip_locate(
    points: DataFrame,
    base_edges: DataFrame,
    scaling: Scaling,
    grid: GridSpec | None = None,
    query_map_id: int = 1,
    point_id: str = "point_id",
    max_rounds: int | None = None,
    skip_empty_cells: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Locate each query point in the base layer.

    Returns (point_id, closest_eid, face_id, [carried point columns]):
    closest_eid is NULL and face_id = 0 (exterior) for misses.
    """
    grid = grid or GridSpec()
    spark = points.sparkSession
    edge_cells = explode_edges_to_cells(base_edges, grid).select(
        "cx",
        "cy",
        "eid",
        "x1",
        "y1",
        "x2",
        "y2",
        "a",
        "b",
        "c",
        "left_polygon_id",
        "right_polygon_id",
    )
    edge_cells = edge_cells.persist()
    # broadcast skip map: cx -> sorted non-empty cell ys
    if skip_empty_cells:
        col_cells = (
            edge_cells.select("cx", "cy")
            .distinct()
            .groupBy("cx")
            .agg(F.array_sort(F.collect_set("cy")).alias("cys"))
        )
        col_cells = F.broadcast(col_cells)

    pts = prepare_query_points(points, scaling, grid, x="x", y="y").select(
        F.col(point_id).alias("point_id"), "px", "py", "pcx", "pcy"
    )
    active = pts.withColumn("cur_cy", F.col("pcy")).localCheckpoint(eager=True)
    results = []
    if max_rounds is None:
        max_rounds = grid.grid_size + 1
    cell_scale = grid.cell_scale

    for rnd in range(max_rounds):
        # cut lineage every round: each round's frontier is materialized, so
        # neither the final union nor the next round replays history
        if skip_empty_cells:
            stepped = (
                active.join(col_cells, F.col("pcx") == F.col("cx"), "left")
                .withColumn(
                    "next_cy",
                    F.array_min(F.filter("cys", lambda c: c >= F.col("cur_cy"))),
                )
                .select("point_id", "px", "py", "pcx", "pcy", "next_cy")
            )
        else:
            stepped = active.withColumn(
                "next_cy",
                F.when(F.col("cur_cy") < grid.grid_size, F.col("cur_cy")),
            ).select("point_id", "px", "py", "pcx", "pcy", "next_cy")
        stepped = stepped.localCheckpoint(eager=True)
        misses = stepped.filter(F.col("next_cy").isNull()).select("point_id")
        nxt = stepped.filter(F.col("next_cy").isNotNull())
        results.append(
            misses.withColumn("closest_eid", F.lit(None).cast("bigint")).withColumn(
                "hit", F.lit(False)
            )
        )
        if nxt.isEmpty():
            active = None
            break

        cand = nxt.join(
            edge_cells,
            (F.col("pcx") == F.col("cx")) & (F.col("next_cy") == F.col("cy")),
            "inner",
        )
        cand = _candidate_filter(cand, query_map_id)
        ykey = _ykey_expr()
        skey = _slope_key_expr(query_map_id)
        best = cand.groupBy("point_id").agg(
            F.min_by(
                F.struct(
                    "eid",
                    "x1",
                    "y1",
                    "x2",
                    "y2",
                    "a",
                    "b",
                    "c",
                    "next_cy",
                ),
                F.struct(ykey.alias("yk"), skey.alias("sk"), F.col("eid").alias("ek")),
            ).alias("e")
        )
        best = best.select("point_id", "e.*")
        # need px back for the acceptance test
        best = best.join(nxt.select("point_id", "px", "py", "pcx", "pcy"), "point_id")
        # acceptance (reference src/algo/pip.h:98-114): accept if the edge's
        # high end is in this cell, else reject if xsect_y falls above it
        # (both cell calcs in double, as the reference does)
        y_max = F.greatest("y1", "y2")
        cell_of_ymax = ((y_max - F.lit(INTERNAL_MIN)) * F.lit(cell_scale)).cast("int")
        xsect_yd = (-F.col("a") * F.col("px") - F.col("c")).cast("double") / F.col("b")
        cell_of_xsect = ((xsect_yd - F.lit(INTERNAL_MIN)) * F.lit(cell_scale)).cast("int")
        accepted = best.filter(
            (cell_of_ymax == F.col("next_cy")) | (cell_of_xsect <= F.col("next_cy"))
        ).localCheckpoint(eager=True)
        results.append(
            accepted.select(
                "point_id", F.col("eid").alias("closest_eid"), F.lit(True).alias("hit")
            )
        )
        # unresolved: had no accepted best this round -> advance past this cell
        active = (
            nxt.join(accepted.select("point_id"), "point_id", "left_anti")
            .withColumn("cur_cy", F.col("next_cy") + 1)
            .select("point_id", "px", "py", "pcx", "pcy", "cur_cy")
        )

    if active is not None:
        # ran out of rounds: remaining points are misses
        results.append(
            active.select("point_id")
            .withColumn("closest_eid", F.lit(None).cast("bigint"))
            .withColumn("hit", F.lit(False))
        )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    # face resolution (reference src/map/map.h:79-87): hit edge's face is
    # right_polygon_id if p1.x < p2.x else left_polygon_id; miss -> 0
    edge_faces = base_edges.select(
        F.col("eid").alias("closest_eid"),
        F.when(F.col("x1") < F.col("x2"), F.col("right_polygon_id"))
        .otherwise(F.col("left_polygon_id"))
        .alias("face_id"),
    )
    out = out.join(edge_faces, "closest_eid", "left").withColumn(
        "face_id", F.coalesce(F.col("face_id"), F.lit(0))
    )
    return out.select("point_id", "closest_eid", "face_id")
