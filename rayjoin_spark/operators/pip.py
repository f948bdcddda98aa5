"""PIP — point-in-polygon location via the upward-ray argmin.

Semantics mirror the reference exactly (reference src/algo/pip.h:12-115 and
the grid walk src/app/pip_grid.h:37-70): for each query point, among base
edges whose x-range straddles the point (with Simulation-of-Simplicity by
query-map id, which also eliminates vertical edges), find the edge whose
intersection with the upward vertical ray has the smallest y; ties (shared
vertices) break by slope; the hit edge's face resolves via p1.x < p2.x
(src/map/map.h:79-87); a miss is the exterior face 0 (src/config.h:8).

Physical plan (all JVM-side, three strategies):

* ``auto`` (default): ONE banded round — each point equi-joins edge-cells
  on (cx, cy) over the first `band0` non-empty cells of its grid column at
  or above it, argmin with the reference's acceptance guard — then the few
  unresolved points re-join over their ENTIRE remaining column (where the
  global argmin needs no guard). Exactly one intermediate Spark job per
  call (an eager checkpoint of the small accepted set), vs one per walk
  round. Sound because any edge whose acceptance fails has its ray
  crossing registered in a cell above the searched band (the bbox
  rectangle explode covers the crossing cell), so the completion pass
  re-finds it.
* ``single``: whole-column join for every point, no guard, ZERO
  intermediate jobs. Right when columns are short (lattices, small maps).
* ``walk``: the reference's cell walk as a driver loop over geometrically
  growing bands (4, 8, ... 64 cells/round). O(log column) join rounds;
  use when columns are so dense that whole-column candidate generation
  would blow up (the 100 TB escape hatch — per-round work is bounded by
  the band, at the price of driver-synchronized rounds).

* exact comparisons everywhere: sign tests are int64; the argmin key is
  floor(n * 2^62 / b) as a lexicographic pair of int64 limbs — an exact
  total-order key for the rational n/b (distinct candidate rationals
  differ by >= 2^-58 at our snap scale, so keys of distinct values
  differ; equal values give equal keys). The reference compares these in
  double (src/algo/pip.h:53) and hopes ("Roundoff error should not cause
  it, I hope"); we are exact;
* argmin per point is one `min_by(payload, key_struct)` — partial-
  aggregating map-side, no window sort, no join-back (px and the hit
  edge's face ride in the payload);
* empty cells are skipped: a broadcast map cx -> sorted non-empty cys
  lets each point jump straight to its candidate cells.

Scale note: each pass is an equi-join co-partitioned on (cx, cy). The
column-skip map is gsize^2 ints worst case — while its total entry count
fits `PipIndex.skipmap_max_entries` it is broadcast; beyond that it is
automatically SHARDED across executors (plain hash join on cx), so dense
layers at gsize >= 8k never funnel the map through the driver.
`PipIndex` makes the exploded edge-cells and the skip map reusable
across pip_locate calls over the same base layer (the overlay locates
both vertex sets against both maps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.plans.cells import (
    SPLIT_CELLS_DEFAULT,
    edge_cell_stats,
    explode_edges_to_cells,
)
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


class PipIndex:
    """Reusable PIP index over one base layer: the exploded non-vertical
    edge-cells (persisted) + the broadcastable column skip-map.

    The Spark analog of the reference's built grid (src/grid/uniform_grid.h)
    held across queries: build once per layer, pass to every pip_locate over
    that layer (overlay does two locates per side).

    When the exploded edge-cells table is small (<= broadcast_max_rows),
    point-vs-cell joins broadcast it — every PIP pass becomes a narrow
    map-side join with zero shuffle of the point side. Above the cap the
    join shuffles on (cx, cy), the 100 TB path."""

    def __init__(self, base_edges: DataFrame, grid: GridSpec,
                 broadcast_max_rows: int = 2_000_000,
                 skipmap_max_entries: int = 4_000_000,
                 split_long_edges: int | str | None = "auto",
                 stats: tuple | None = None):
        self.grid = grid
        self._bcast_max = broadcast_max_rows
        self._skipmap_max = skipmap_max_entries
        self._joinable = None
        self._skipmap = None
        self._n_rows = None
        self._n_cells = None
        # vertical edges can never qualify: the SoS x-interval (x_min, x_max]
        # / [x_min, x_max) is empty when x1 == x2 (reference
        # src/algo/pip.h:44-46 "this also eliminates vertical edges").
        # Dropping them up front keeps grid columns sparse.
        self.base_edges = base_edges.filter(F.col("x1") != F.col("x2"))
        # long-edge pre-split (plans/cells.py): fragments may duplicate a
        # (cell, eid) row at seams — harmless for PIP, whose per-point
        # min_by argmin and acceptance guard are duplicate-insensitive
        # `stats` = a precomputed edge_cell_stats(base_edges, grid) tuple
        # (overlay shares one agg between its lsi_join and PipIndexes);
        # NOTE it describes base_edges BEFORE the vertical-edge filter —
        # fine for the split decision (a conservative over-estimate)
        k = None
        if split_long_edges == "auto":
            if stats is None:
                stats = edge_cell_stats(self.base_edges, grid)
            if stats[1] > SPLIT_CELLS_DEFAULT:
                k = SPLIT_CELLS_DEFAULT
        elif split_long_edges:
            k = int(split_long_edges)
        # upper bound on edge-cell rows from the shared stats agg (exact
        # bbox-explode total pre-vertical-filter; the split estimate is
        # itself an upper bound): lets the broadcast decisions below skip
        # the exact-size job when the bound is already under the cap.
        # Only valid in auto mode — stats' split estimate assumes the
        # default fragment length, not an explicit override.
        self._est_rows = None
        if stats is not None and split_long_edges == "auto":
            self._est_rows = stats[3] if k else stats[2]
        self.edge_cells = (
            explode_edges_to_cells(self.base_edges, grid, k)
            .select(
                "cx", "cy", "eid", "x1", "y1", "x2", "y2", "a", "b", "c",
                "left_polygon_id", "right_polygon_id",
            )
            .persist()
        )
        # column skip map: cx -> sorted non-empty cell ys (broadcast-sized).
        # collect_set dedups with map-side partial aggregation — a prior
        # .distinct() here would just add a second full shuffle of the
        # edge-cells frame to the index build
        self.col_cells = (
            self.edge_cells.select("cx", "cy")
            .groupBy("cx")
            .agg(F.array_sort(F.collect_set("cy")).alias("cys"))
            .persist()
        )

    def _sizes(self) -> tuple[int, int]:
        """(n edge-cell rows, n distinct non-empty cells) in ONE agg job —
        the distinct-cell count equals the skip map's total entry count
        (sum of its array sizes). Also materializes the edge_cells persist;
        runs exactly once per index."""
        if self._n_rows is None:
            row = self.edge_cells.agg(
                F.count("*").alias("n"),
                F.count_distinct("cx", "cy").alias("nc"),
            ).collect()[0]
            self._n_rows, self._n_cells = int(row["n"]), int(row["nc"])
        return self._n_rows, self._n_cells

    def joinable_cells(self):
        """edge_cells, broadcast-wrapped when small. The stats upper bound
        decides without a job when it is under the cap; only the big regime
        (bound above cap) pays the exact-size agg — where its one job is
        noise next to the query itself."""
        if self._joinable is None:
            if (
                self._bcast_max
                and self._est_rows is not None
                and self._est_rows <= self._bcast_max
            ):
                n_rows = self._est_rows
            else:
                n_rows, _ = self._sizes()
            if self._bcast_max and n_rows <= self._bcast_max:
                self._joinable = F.broadcast(self.edge_cells)
            else:
                # explode-aware broadcast guard: pin the point-vs-cells
                # join to sort-merge so AQE cannot broadcast-convert the
                # exploded side from compressed shuffle stats (its
                # deserialized size blows the 8 GiB cap at fine grids)
                self._joinable = self.edge_cells.hint("merge")
        return self._joinable

    def skipmap_joinable(self):
        """col_cells for the point-side join: broadcast while the total
        entry count (<= gsize^2) fits, else a plain frame — the join then
        SHARDS the skip map across executors by cx (hash shuffle), the
        gsize>=8k dense-layer path the module docstring promises."""
        if self._skipmap is None:
            if (
                self._skipmap_max
                and self._est_rows is not None
                and self._est_rows <= self._skipmap_max
            ):
                n_cells = self._est_rows  # n_cells <= n_rows <= bound
            else:
                _, n_cells = self._sizes()
            if self._skipmap_max and n_cells <= self._skipmap_max:
                self._skipmap = F.broadcast(self.col_cells)
            else:
                self._skipmap = self.col_cells
        return self._skipmap

    def unpersist(self) -> None:
        self.edge_cells.unpersist()
        self.col_cells.unpersist()


def _argmin_in_cells(src: DataFrame, index: PipIndex, query_map_id: int,
                     cells_col: str, with_guard: bool) -> DataFrame:
    """Explode each point over its candidate cells, equi-join the edge-cells
    on (cx, cy), filter, argmin. Returns (point_id, eid, face_id[, band_top,
    x/y payload]) — one row per point that has any candidate."""
    cand = (
        src.withColumn("band_cy", F.explode(cells_col))
        .join(
            index.joinable_cells(),
            (F.col("pcx") == F.col("cx")) & (F.col("band_cy") == F.col("cy")),
            "inner",
        )
    )
    cand = _candidate_filter(cand, query_map_id).withColumn(
        "n_", -F.col("a") * F.col("px") - F.col("c")
    )
    payload = [
        "eid", "x1", "y1", "x2", "y2", "a", "b", "c", "px",
        "left_polygon_id", "right_polygon_id",
    ]
    if with_guard:
        payload.append("band_top")
    best = cand.groupBy("point_id").agg(
        F.min_by(F.struct(*payload), _argmin_key(query_map_id)).alias("e")
    )
    return best.select("point_id", "e.*")


def _face_column():
    """Hit edge's face (reference src/map/map.h:79-87): right_polygon_id if
    p1.x < p2.x in chain order, else left_polygon_id."""
    return F.when(
        F.col("x1") < F.col("x2"), F.col("right_polygon_id")
    ).otherwise(F.col("left_polygon_id"))


def pip_locate(
    points: DataFrame,
    base_edges: DataFrame,
    scaling: Scaling,
    grid: GridSpec | None = None,
    query_map_id: int = 1,
    point_id: str = "point_id",
    max_rounds: int | None = None,
    skip_empty_cells: bool = True,
    mode: str = "auto",
    band0: int = 8,
    index: PipIndex | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Locate each query point in the base layer.

    Returns (point_id, closest_eid, face_id): closest_eid is NULL and
    face_id = 0 (exterior) for misses. See module docstring for the three
    physical strategies (mode = 'auto' | 'single' | 'walk').

    ``caches``: optional list — every frame this call persists (auto
    mode's stepped/accepted) and any implicitly-built PipIndex are
    appended, so long-running sessions can ``.unpersist()`` them after
    materializing the result; repeated un-released locates otherwise
    accumulate storage memory until eviction churn degrades the caches
    that are still live (a reusable `index=` skips the implicit build
    entirely — the preferred repeated-locate pattern).
    """
    grid = grid or (index.grid if index is not None else GridSpec())
    if not skip_empty_cells:
        mode = "walk"
    if index is None:
        index = PipIndex(base_edges, grid)
        if caches is not None:
            caches.append(index)

    pts = prepare_query_points(points, scaling, grid, x="x", y="y").select(
        F.col(point_id).alias("point_id"), "px", "py", "pcx", "pcy"
    )

    if mode == "walk":
        hits = _pip_walk(pts, index, query_map_id, max_rounds, skip_empty_cells, grid)
    else:
        # attach the remaining column (non-empty cells at/above the point)
        stepped = (
            pts.join(index.skipmap_joinable(), F.col("pcx") == F.col("cx"), "left")
            .withColumn("cands", F.filter("cys", lambda c: c >= F.col("pcy")))
            .select("point_id", "px", "py", "pcx", "pcy", "cands")
        )
        if mode == "auto":
            # both the banded pass and the completion pass consume stepped;
            # uncached, the completion recomputes the skip-map join + the
            # per-point array filter over the whole point set (same-session
            # A/B at gsize 15000 / 1M points: ~15-20% of the locate).
            # persist (not checkpoint): deterministic, partition-parallel,
            # and plan-canonicalized so repeat locates reuse it.
            stepped = stepped.persist()
            if caches is not None:
                caches.append(stepped)
        if mode == "single":
            src = stepped.filter(F.size("cands") > 0)
            hits = _argmin_in_cells(src, index, query_map_id, "cands", False)
            hits = hits.select("point_id", F.col("eid").alias("closest_eid"),
                               _face_column().alias("face_id"))
        else:  # auto: one guarded band round + whole-column completion
            banded = (
                stepped.filter(F.size("cands") > 0)
                .withColumn("band", F.slice("cands", 1, band0))
                .withColumn("band_top", F.element_at("band", -1))
            )
            bestA = _argmin_in_cells(banded, index, query_map_id, "band", True)
            # acceptance guard (reference src/algo/pip.h:98-114, band
            # generalization): the band argmin is final iff the edge's high
            # end or its ray crossing lies within the searched band; both
            # cell calcs in double, as the reference does
            y_max = F.greatest("y1", "y2")
            cs = grid.cell_scale
            cell_of_ymax = ((y_max - F.lit(INTERNAL_MIN)) * F.lit(cs)).cast("int")
            xsect_yd = (-F.col("a") * F.col("px") - F.col("c")).cast("double") / F.col("b")
            cell_of_xsect = ((xsect_yd - F.lit(INTERNAL_MIN)) * F.lit(cs)).cast("int")
            # persist (not an eager checkpoint): both consumers below —
            # the anti-join and the final union — reuse the one cached
            # computation with NO intermediate job and no serial disk
            # write; at cluster scale the band pass stays a fully
            # parallel stage
            accepted = (
                bestA.filter(
                    (cell_of_ymax <= F.col("band_top"))
                    | (cell_of_xsect <= F.col("band_top"))
                )
                .select("point_id", F.col("eid").alias("closest_eid"),
                        _face_column().alias("face_id"))
                .persist()
            )
            if caches is not None:
                caches.append(accepted)
            # completion: unresolved points join their whole remaining
            # column — the global argmin there needs no guard (a rejected
            # band argmin re-registers at its crossing cell above the band)
            rest = stepped.join(accepted.select("point_id"), "point_id", "left_anti")
            rest = rest.filter(F.size("cands") > 0)
            bestB = _argmin_in_cells(rest, index, query_map_id, "cands", False)
            bestB = bestB.select("point_id", F.col("eid").alias("closest_eid"),
                                 _face_column().alias("face_id"))
            hits = accepted.unionByName(bestB)

    out = pts.select("point_id").join(hits, "point_id", "left")
    return out.select(
        "point_id",
        "closest_eid",
        F.coalesce(F.col("face_id"), F.lit(0)).alias("face_id"),
    )


def _pip_walk(
    pts: DataFrame,
    index: PipIndex,
    query_map_id: int,
    max_rounds: int | None,
    skip_empty_cells: bool,
    grid: GridSpec,
) -> DataFrame:
    """The legacy driver-loop walk over geometrically growing bands; kept as
    the escape hatch for layers whose grid columns are too dense for the
    whole-column completion pass. Returns hit rows (point_id, closest_eid,
    face_id)."""
    col_cells = index.skipmap_joinable() if skip_empty_cells else None

    active = pts.withColumn("cur_cy", F.col("pcy")).localCheckpoint(eager=True)
    results = []
    if max_rounds is None:
        max_rounds = grid.grid_size + 1
    cell_scale = grid.cell_scale

    band0, band_max = 4, 64
    for rnd in range(max_rounds):
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
        nxt = stepped.filter(F.col("band").isNotNull()).withColumn(
            "band_top", F.element_at("band", -1)
        )
        if nxt.isEmpty():
            break

        # same explode/join/filter/argmin as the auto path — one shared
        # implementation so an SoS or payload fix can never diverge
        best = _argmin_in_cells(nxt, index, query_map_id, "band", True)
        y_max = F.greatest("y1", "y2")
        cell_of_ymax = ((y_max - F.lit(INTERNAL_MIN)) * F.lit(cell_scale)).cast("int")
        xsect_yd = (-F.col("a") * F.col("px") - F.col("c")).cast("double") / F.col("b")
        cell_of_xsect = ((xsect_yd - F.lit(INTERNAL_MIN)) * F.lit(cell_scale)).cast("int")
        accepted = best.filter(
            (cell_of_ymax <= F.col("band_top")) | (cell_of_xsect <= F.col("band_top"))
        ).localCheckpoint(eager=True)
        results.append(
            accepted.select(
                "point_id",
                F.col("eid").alias("closest_eid"),
                _face_column().alias("face_id"),
            )
        )
        # unresolved: no accepted best this round -> advance past the band;
        # checkpointing the (small) next frontier keeps per-round IO
        # proportional to what is left
        active = (
            nxt.join(accepted.select("point_id"), "point_id", "left_anti")
            .withColumn("cur_cy", F.col("band_top") + 1)
            .select("point_id", "px", "py", "pcx", "pcy", "cur_cy")
            .localCheckpoint(eager=True)
        )

    if not results:
        return (
            pts.select("point_id")
            .limit(0)
            .withColumn("closest_eid", F.lit(None).cast("bigint"))
            .withColumn("face_id", F.lit(None).cast("bigint"))
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
