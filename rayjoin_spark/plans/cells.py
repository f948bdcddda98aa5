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

Long edges at fine grids: the bbox rectangle explode is QUADRATIC in the
edge's cell span for diagonal edges (a unit lattice diagonal at gsize 15000
spans ~234x234 cells = 54k rows; the reference's continental inputs never
hit this because their edges are tiny relative to its 15000 grid,
expr/env.sh:12). `explode_edges_to_cells(..., max_cells_per_edge=k)`
pre-splits each edge into ceil(span/k) parametric fragments and explodes
each fragment's own (conservative, +-1-widened) sub-bbox — linear in the
span. Geometry columns are untouched (fragments carry the PARENT edge's
coordinates/equation/eid), so every downstream exact predicate is
unchanged; candidate completeness holds because any point ON the edge lies
in some fragment's widened sub-bbox. Consumers that relied on "one row per
(cell, edge)" must dedup pairs by eid after their predicate (operators/
lsi.py does; PIP's min_by argmin is duplicate-insensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.plans.scaling import GridSpec

#: default fragment length (in cells) for long-edge pre-splitting; also the
#: auto-split trigger: spans <= this explode exactly as before
SPLIT_CELLS_DEFAULT = 8


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


def explode_edges_to_cells(
    edges: DataFrame, grid: GridSpec, max_cells_per_edge: int | None = None
) -> DataFrame:
    """One row per (cell, edge) the edge's bbox covers.

    Equivalent of the reference's `iterate_cell` double loop
    (src/grid/uniform_grid.h:79-83) — `explode(sequence(...))` twice.
    The output keeps ix1/iy1 so downstream joins can dedup candidate pairs
    without ever computing the exact intersection point (see
    operators/lsi.py).

    With ``max_cells_per_edge=k`` set, edges spanning more than k cells are
    pre-split into parametric fragments (see module docstring): ix1..iy2
    become the FRAGMENT's conservative sub-bbox, a pair of edges may emit
    the same (cell, eid_a, eid_b) candidate more than once, and the output
    may contain duplicate (cell, eid) rows at fragment seams.
    """
    if max_cells_per_edge:
        e = _fragment_cell_bboxes(edges, grid, max_cells_per_edge)
    else:
        e = with_cell_bbox(edges, grid)
    return e.withColumn("cx", F.explode(F.sequence("ix1", "ix2"))).withColumn(
        "cy", F.explode(F.sequence("iy1", "iy2"))
    )


def _fragment_cell_bboxes(edges: DataFrame, grid: GridSpec, k: int) -> DataFrame:
    """Replace each edge's bbox with ceil(span/k) fragment sub-bboxes.

    Fragment f of n covers the parameter range [f/n, (f+1)/n] of the
    segment; its endpoints are computed in exact int64 (x1 + (x2-x1)*f DIV n
    is within 1 of the true value — DIV truncates toward zero, floor is
    within 1) and widened by +-1 snapped unit, then clamped to the parent
    bbox, so the union of fragment bboxes covers every point of the segment
    while never exceeding the parent bbox. A span<=k edge has n=1 and its
    fragment bbox IS the exact parent bbox (f=0 endpoints are x1 and x2;
    the +-1 widen is clamped away) — the unsplit plan, bit-identical.
    """
    e = with_cell_bbox(edges, grid)
    span = F.greatest(F.col("ix2") - F.col("ix1"), F.col("iy2") - F.col("iy1")) + 1
    e = e.withColumn(
        "_nf",
        F.when(span <= k, F.lit(1)).otherwise(F.ceil(span / F.lit(k))).cast("bigint"),
    ).withColumn("_f", F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_nf") - 1)))
    fx0 = F.expr("x1 + ((x2 - x1) * _f) DIV _nf")
    fx1 = F.expr("x1 + ((x2 - x1) * (_f + 1)) DIV _nf")
    fy0 = F.expr("y1 + ((y2 - y1) * _f) DIV _nf")
    fy1 = F.expr("y1 + ((y2 - y1) * (_f + 1)) DIV _nf")
    lox = F.greatest(F.least(fx0, fx1) - 1, F.least("x1", "x2"))
    hix = F.least(F.greatest(fx0, fx1) + 1, F.greatest("x1", "x2"))
    loy = F.greatest(F.least(fy0, fy1) - 1, F.least("y1", "y2"))
    hiy = F.least(F.greatest(fy0, fy1) + 1, F.greatest("y1", "y2"))
    return (
        e.withColumn("ix1", grid.cell_of(lox))
        .withColumn("ix2", grid.cell_of(hix))
        .withColumn("iy1", grid.cell_of(loy))
        .withColumn("iy2", grid.cell_of(hiy))
        .drop("_nf", "_f")
    )


#: memo for edge_cell_stats keyed on (analyzed-plan semanticHash, schema,
#: gsize, k). A stale or colliding entry steers the auto-split decision and
#: the explode-aware broadcast guard — heuristics, but the guard is
#: OOM-protective, so the key includes the full column signature on top of
#: the 32-bit semanticHash: a wrong hit then needs a same-schema 32-bit
#: collision within the <=512 live entries (~1e-5 birthday mass), against
#: plans that in practice differ in relations the hash covers. Caching
#: across FRESH DataFrame objects carrying the same logical plan (e.g.
#: sources/derived.edges_a rebuilt per bench repeat) removes the flat
#: two-extra-jobs constant every split_long_edges='auto' call otherwise
#: pays (round-4 VERDICT #1).
_STATS_MEMO: dict[tuple, tuple[int, int, int, int]] = {}
_STATS_MEMO_CAP = 512


def _stats_key(edges: DataFrame, grid: GridSpec, k: int):
    try:
        h = edges._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # pragma: no cover - foreign/mocked DataFrame
        return None
    return (int(h), tuple(edges.columns), grid.grid_size, int(k))


def edge_cell_stats(
    edges: DataFrame, grid: GridSpec, k: int = SPLIT_CELLS_DEFAULT
) -> tuple[int, int, int, int]:
    """One cheap narrow agg over the (pre-explode) edge table:
    (n_edges, max_span_cells, est_rows_unsplit, est_rows_split).

    est_rows_unsplit = exact total bbox-explode rows; est_rows_split = an
    upper-bound estimate under max_cells_per_edge=k fragmentation (each
    fragment bbox <= (k+3)^2 cells incl. the +-1 widen and DIV slack).
    Drives the auto-split decision and the explode-aware broadcast guard in
    operators/lsi.py and operators/pip.py. Memoized per logical plan
    (semanticHash) + grid + k — see _STATS_MEMO.
    """
    key = _stats_key(edges, grid, k)
    if key is not None and key in _STATS_MEMO:
        return _STATS_MEMO[key]
    e = with_cell_bbox(edges, grid)
    sx = F.col("ix2") - F.col("ix1") + 1
    sy = F.col("iy2") - F.col("iy1") + 1
    span = F.greatest(sx, sy)
    frag_est = F.when(span <= k, sx * sy).otherwise(
        F.ceil(span / F.lit(k)) * F.least(sx, F.lit(k + 3)) * F.least(sy, F.lit(k + 3))
    )
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.max(span), F.lit(0)).alias("mx"),
        F.coalesce(F.sum(sx * sy), F.lit(0)).alias("eu"),
        F.coalesce(F.sum(frag_est), F.lit(0)).alias("es"),
    ).collect()[0]
    out = (int(row["n"]), int(row["mx"]), int(row["eu"]), int(row["es"]))
    if key is not None:
        if len(_STATS_MEMO) >= _STATS_MEMO_CAP:
            _STATS_MEMO.clear()
        _STATS_MEMO[key] = out
    return out


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


def round0_radius(
    density: float,
    k: int,
    n_queries: int,
    r_max: int = 6,
    cand_cap: int = 40_000_000,
) -> int:
    """Shared round-0 annulus radius for the point-query loops
    (operators/knn.py, operators/nearest.py): a query RESOLVES only when
    its k-th hit lies inside the radius-r inscribed circle of the covered
    window, so pick the smallest r whose circle's expected Poisson mass
    pi*r^2*density reaches k + 3*sqrt(k) + 2 (~3-sigma margin, <~0.2%
    expected survivors — typical queries finish in ONE round), then
    shrink while the round-0 candidate volume
    n_queries*(2r+1)^2*density exceeds cand_cap: at many queries the
    variable join cost dominates the per-round fixed cost a big r
    amortizes (and nearest's two-phase argmin evaluates its slim join
    twice). density = expected index rows per grid cell."""
    import math

    need = k + 3.0 * math.sqrt(k) + 2.0
    r = 1
    while r < r_max and math.pi * r * r * density < need:
        r += 1
    while r > 1 and n_queries * ((2 * r + 1) ** 2) * density > cand_cap:
        r -= 1
    return r
