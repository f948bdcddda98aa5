"""PIP — point-in-polygon location via the upward-ray walk.

Semantics mirror the reference exactly (reference src/algo/pip.h:12-115 and
the grid walk src/app/pip_grid.h:37-70): for each query point, among base
edges whose x-range straddles the point (with Simulation-of-Simplicity by
query-map id, which also eliminates vertical edges), find the edge whose
intersection with the upward vertical ray has the smallest y; ties (shared
vertices) break by slope; the hit edge's face resolves via p1.x < p2.x
(src/map/map.h:79-87); a miss is the exterior face 0 (src/config.h:8).

Physical plan (all JVM-side):

* per round, active points equi-join edge-cells on (cx, cy) over a
  geometrically growing band of non-empty cells — the grid walk's "test
  this cell", O(log column) rounds instead of one per cell;
* exact comparisons: sign tests are int64; the argmin key is
  floor(n * 2^62 / b) as a lexicographic pair of int64 limbs — an exact
  total-order key for the rational n/b (distinct candidate rationals
  differ by >= 2^-58 at our snap scale, so keys of distinct values
  differ; equal values give equal keys). The reference compares these in
  double (src/algo/pip.h:53) and hopes ("Roundoff error should not cause
  it, I hope"); we are exact;
* argmin per point is one `min_by(payload, key_struct)` — partial-
  aggregating map-side, no window sort, no join-back (px rides in the
  payload);
* empty cells are skipped: a broadcast map cx -> sorted non-empty cys
  lets each point jump straight to its next candidate cells.

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

# Exact total-order key for xsect_y = n_/b (b > 0), where n_ = -a*px - c,
# |n_| <= 2^59: floor(n_ * 2^62 / b) represented as a LEXICOGRAPHIC PAIR of
# int64 limbs (hi = floor(n_/b), possibly negative; lo = the next 62
# fractional bits, non-negative) — struct comparison of plain bigints stays
# in codegen, where a decimal(38,0) key would fall back to interpreted
# compare. `x - pmod(x, b)` is an exact multiple of b, so DIV is an exact
# floor step (a bigint `/` would detour through double and lose bits above
# 2^53). Distinct candidate rationals differ by >= 1/(b1*b2) >= 2^-58, so
# distinct values get distinct keys; equal values get equal keys.
_YK_HI_SQL = "(n_ - pmod(n_, b)) DIV b"
_YK_LO_SQL = """
((pmod(n_, b) * 2147483648 - pmod(pmod(n_, b) * 2147483648, b)) DIV b) * 2147483648
+ ((pmod(pmod(n_, b) * 2147483648, b) * 2147483648
    - pmod(pmod(pmod(n_, b) * 2147483648, b) * 2147483648, b)) DIV b)
"""

# floor(a * 2^62 / b) as the pair (floor(a*2^31/b), next 31 bits) — exact
# key for the slope tie order a/b (reference src/algo/pip.h:77-92).
_SK_HI_SQL = "(a * 2147483648 - pmod(a * 2147483648, b)) DIV b"
_SK_LO_SQL = """
(pmod(a * 2147483648, b) * 2147483648
 - pmod(pmod(a * 2147483648, b) * 2147483648, b)) DIV b
"""


def _argmin_key(query_map_id: int):
    """Ordering struct (yk_hi, yk_lo, sk_hi, sk_lo, eid) — all bigint.

    Slope tie rule keeps the larger a/b for query_map_id=1, smaller for 0;
    componentwise negation reverses the lexicographic slope order (valid
    because tuple equality is componentwise)."""
    yk_hi, yk_lo = F.expr(_YK_HI_SQL), F.expr(_YK_LO_SQL)
    sk_hi, sk_lo = F.expr(_SK_HI_SQL), F.expr(_SK_LO_SQL)
    if query_map_id == 1:
        sk_hi, sk_lo = -sk_hi, -sk_lo
    return F.struct(
        yk_hi.alias("yk_hi"),
        yk_lo.alias("yk_lo"),
        sk_hi.alias("sk_hi"),
        sk_lo.alias("sk_lo"),
        F.col("eid").alias("ek"),
    )


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
) -> DataFrame:
    """Locate each query point in the base layer.

    Returns (point_id, closest_eid, face_id, [carried point columns]):
    closest_eid is NULL and face_id = 0 (exterior) for misses.
    """
    grid = grid or GridSpec()
    # vertical edges can never qualify: the SoS x-interval (x_min, x_max] /
    # [x_min, x_max) is empty when x1 == x2 (reference src/algo/pip.h:44-46
    # "this also eliminates vertical edges"). Dropping them up front keeps
    # grid columns sparse so the upward walk skips straight past them —
    # without this, a column of stacked vertical edges forces one join
    # round per cell.
    base_edges = base_edges.filter(F.col("x1") != F.col("x2"))
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
        # persist: every round broadcasts this map — without the persist
        # each round re-runs the distinct+groupBy over all edge cells
        col_cells = (
            edge_cells.select("cx", "cy")
            .distinct()
            .groupBy("cx")
            .agg(F.array_sort(F.collect_set("cy")).alias("cys"))
            .persist()
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

    band0, band_max = 4, 64
    for rnd in range(max_rounds):
        # Walk a BAND of the next `bsize` non-empty cells per round
        # (geometrically growing) instead of one cell: the reference's
        # per-cell GPU step is ~free, a Spark round is a join, so rounds
        # must be O(log columns) not O(cells). Equivalent semantics: any
        # edge deferred by the acceptance guard re-registers in the cell
        # containing its ray crossing, which lands in a later band.
        bsize = min(band0 << rnd, band_max)
        if skip_empty_cells:
            stepped = (
                active.join(col_cells, F.col("pcx") == F.col("cx"), "left")
                .withColumn(
                    "band",
                    F.slice(
                        F.array_sort(F.filter("cys", lambda c: c >= F.col("cur_cy"))),
                        1,
                        bsize,
                    ),
                )
                .withColumn("band", F.when(F.size("band") > 0, F.col("band")))
                .select("point_id", "px", "py", "pcx", "pcy", "band")
            )
        else:
            lo, hi = F.col("cur_cy"), F.least(
                F.col("cur_cy") + bsize - 1, F.lit(grid.grid_size - 1)
            )
            stepped = active.withColumn(
                "band",
                F.when(F.col("cur_cy") < grid.grid_size, F.sequence(lo, hi)),
            ).select("point_id", "px", "py", "pcx", "pcy", "band")
        misses = stepped.filter(F.col("band").isNull()).select("point_id")
        nxt = stepped.filter(F.col("band").isNotNull()).withColumn(
            "band_top", F.element_at("band", -1)
        )
        results.append(
            misses.withColumn("closest_eid", F.lit(None).cast("bigint")).withColumn(
                "hit", F.lit(False)
            )
        )
        if nxt.isEmpty():
            active = None
            break

        cand = nxt.withColumn("band_cy", F.explode("band")).join(
            edge_cells,
            (F.col("pcx") == F.col("cx")) & (F.col("band_cy") == F.col("cy")),
            "inner",
        )
        cand = _candidate_filter(cand, query_map_id).withColumn(
            "n_", -F.col("a") * F.col("px") - F.col("c")
        )
        # px rides inside the payload struct so no join-back is needed for
        # the acceptance test (a 2M-row equi-join saved per round)
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
                    "band_top",
                    "px",
                ),
                _argmin_key(query_map_id),
            ).alias("e")
        )
        best = best.select("point_id", "e.*")
        # acceptance (reference src/algo/pip.h:98-114, band generalization):
        # accept if the edge's high end is within the searched band, else
        # reject if the ray crossing falls above it (both cell calcs in
        # double, as the reference does)
        y_max = F.greatest("y1", "y2")
        cell_of_ymax = ((y_max - F.lit(INTERNAL_MIN)) * F.lit(cell_scale)).cast("int")
        xsect_yd = (-F.col("a") * F.col("px") - F.col("c")).cast("double") / F.col("b")
        cell_of_xsect = ((xsect_yd - F.lit(INTERNAL_MIN)) * F.lit(cell_scale)).cast("int")
        accepted = best.filter(
            (cell_of_ymax <= F.col("band_top")) | (cell_of_xsect <= F.col("band_top"))
        ).localCheckpoint(eager=True)
        results.append(
            accepted.select(
                "point_id", F.col("eid").alias("closest_eid"), F.lit(True).alias("hit")
            )
        )
        # unresolved: no accepted best this round -> advance past the band;
        # checkpointing the (small) next frontier instead of the full
        # `stepped` keeps per-round IO proportional to what is left
        active = (
            nxt.join(accepted.select("point_id"), "point_id", "left_anti")
            .withColumn("cur_cy", F.col("band_top") + 1)
            .select("point_id", "px", "py", "pcx", "pcy", "cur_cy")
            .localCheckpoint(eager=True)
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
