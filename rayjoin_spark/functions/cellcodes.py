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


def compact_cells(cells: DataFrame, level: int, cell: str = "cell_id") -> DataFrame:
    """Minimal multi-level covering — the S2 ``CellUnion::Normalize``
    analog over Morton quadtree ids.

    Input: cell ids at one quadtree `level` (duplicates allowed; the set
    is what matters). Output: ``(cell_id, level)`` rows where every
    complete quartet of siblings has been merged into its parent,
    recursively — the canonical smallest covering of the same region,
    unique for a given input set.

    Plan shape (scale): one pass per level from fine to coarse. Each pass
    is a single hash shuffle on the parent id (a window count), and the
    frame entering pass *k+1* holds only the promoted parents — at most a
    quarter of pass *k*'s rows — so the first pass dominates and total
    work is O(n) with at most `level` (≤ 11) shuffles of geometrically
    shrinking data. No collect, no iteration-until-convergence: the depth
    is the fixed quadtree depth.
    """
    from functools import reduce

    from pyspark.sql import Window

    cur = cells.select(F.col(cell).cast("bigint").alias("cell_id")).distinct()
    out_parts: list[DataFrame] = []
    for lvl in range(level, 0, -1):
        w = Window.partitionBy(F.shiftright(F.col("cell_id"), 2))
        sized = cur.withColumn("_sib", F.count("*").over(w))
        out_parts.append(
            sized.filter(F.col("_sib") < 4).select(
                "cell_id", F.lit(lvl).cast("int").alias("level")
            )
        )
        # all four children present -> promote the parent one level up;
        # the quartet collapses to one row (duplicates from the 4 siblings
        # drop partition-locally: the frame is already hashed on parent)
        cur = (
            sized.filter(F.col("_sib") == 4)
            .select(F.shiftright(F.col("cell_id"), 2).alias("cell_id"))
            .dropDuplicates(["cell_id"])
        )
    out_parts.append(cur.select("cell_id", F.lit(0).cast("int").alias("level")))
    return reduce(lambda a, b: a.unionByName(b), out_parts)


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


# --------------------------------------------------------------- Hilbert


def hilbert_xy2d(x: int, y: int, level: int = DEFAULT_LEVEL) -> int:
    """Pure-python Hilbert index of grid cell (x, y) — the reference the
    column/NumPy twins are tested against, and the spec of the variant:

    MSB-first base-4 state machine over the Z2 x Z2 orientation group
    (sw = axes swapped, ng = both axes complemented). At each level the
    effective quadrant (rx, ry) is the raw bit pair pushed through the
    accumulated transform; the emitted digit is (3*rx) XOR ry (quadrant
    visit order (0,0) -> (0,1) -> (1,1) -> (1,0)); the child transform
    composes by XOR (the group is abelian): quadrant (0,0) appends a
    transpose, (1,0) an anti-transpose, ry=1 the identity.

    Properties pinned by tests (what makes it a Hilbert curve): bijection
    onto [0, 4^level), unit-step adjacency of consecutive indices, and
    prefix nesting (id >> 2k is the ancestor's id, same as Morton)."""
    d = sw = ng = 0
    for k in range(level - 1, -1, -1):
        bx = (x >> k) & 1
        by = (y >> k) & 1
        tx, ty = (by, bx) if sw else (bx, by)
        rx, ry = tx ^ ng, ty ^ ng
        d |= ((3 * rx) ^ ry) << (2 * k)
        if ry == 0:
            sw ^= 1
            if rx == 1:
                ng ^= 1
    return d


def hilbert_id(
    df: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    x: str = "x",
    y: str = "y",
    level: int = DEFAULT_LEVEL,
    out: str = "cell_id",
) -> DataFrame:
    """Hilbert quadtree id of each row's snapped grid cell — pure JVM
    column math (the `hilbert_xy2d` state machine unrolled, one chained
    projection per level so Catalyst never duplicates the when-trees),
    no UDF. Hilbert ids keep ALL consecutive ids in adjacent cells
    (Morton has long jumps at quadrant seams), so range-partitioning on
    them gives strictly better spatial locality for range scans — the
    reason S2 itself uses Hilbert order on each cube face. Prefix
    nesting matches Morton: `parent_id` works unchanged."""
    cx, cy = cell_xy(scaling, grid, F.col(x), F.col(y))
    return hilbert_from_cells(df, cx, cy, level=level, out=out)


def hilbert_from_cells(
    df: DataFrame,
    cx: Column,
    cy: Column,
    level: int = DEFAULT_LEVEL,
    out: str = "cell_id",
) -> DataFrame:
    """`hilbert_id` over already-integer grid cell columns (the
    `interleave_bits` analog; DataFrame-shaped because the unrolled state
    machine needs one named projection per level)."""
    df = (
        df.withColumn("_hx", cx.cast("bigint"))
        .withColumn("_hy", cy.cast("bigint"))
        .withColumn("_sw", F.lit(0))
        .withColumn("_ng", F.lit(0))
        .withColumn("_hd", F.lit(0).cast("bigint"))
    )
    for k in range(level - 1, -1, -1):
        bx = F.shiftright(F.col("_hx"), k).bitwiseAND(F.lit(1))
        by = F.shiftright(F.col("_hy"), k).bitwiseAND(F.lit(1))
        tx = F.when(F.col("_sw") == 1, by).otherwise(bx)
        ty = F.when(F.col("_sw") == 1, bx).otherwise(by)
        df = (
            df.withColumn("_rx", tx.bitwiseXOR(F.col("_ng")))
            .withColumn("_ry", ty.bitwiseXOR(F.col("_ng")))
            .withColumn(
                "_hd",
                F.col("_hd")
                + F.shiftleft(
                    (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")).cast("bigint"),
                    2 * k,
                ),
            )
            .withColumn(
                "_ng",
                F.col("_ng").bitwiseXOR(
                    F.when((F.col("_ry") == 0) & (F.col("_rx") == 1), 1).otherwise(0)
                ),
            )
            .withColumn(
                "_sw",
                F.col("_sw").bitwiseXOR(F.when(F.col("_ry") == 0, 1).otherwise(0)),
            )
        )
    return df.withColumn(out, F.col("_hd")).drop(
        "_hx", "_hy", "_sw", "_ng", "_hd", "_rx", "_ry"
    )


def hilbert_id_pandas(
    df: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    x: str = "x",
    y: str = "y",
    level: int = DEFAULT_LEVEL,
    out: str = "cell_id",
) -> DataFrame:
    """Arrow-batched NumPy twin of `hilbert_id` (vectorized state machine,
    one pass over the level bits) — tested equal to the column version."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    rx_, ry_ = scaling.rx, scaling.ry
    dx_, dy_ = scaling.dx, scaling.dy
    cs = grid.cell_scale
    from rayjoin_spark.plans.scaling import INTERNAL_MIN

    @pandas_udf("bigint")
    def _hilbert(xs, ys):
        import numpy as np

        xi = (xs.to_numpy() * rx_ + dx_).astype(np.int64)
        yi = (ys.to_numpy() * ry_ + dy_).astype(np.int64)
        cx = ((xi - INTERNAL_MIN) * cs).astype(np.int64)
        cy = ((yi - INTERNAL_MIN) * cs).astype(np.int64)
        sw = np.zeros(len(xs), dtype=np.int64)
        ng = np.zeros_like(sw)
        d = np.zeros_like(sw)
        for k in range(level - 1, -1, -1):
            bx = (cx >> k) & 1
            by = (cy >> k) & 1
            tx = np.where(sw == 1, by, bx)
            ty = np.where(sw == 1, bx, by)
            rx = tx ^ ng
            ry = ty ^ ng
            d |= ((3 * rx) ^ ry) << (2 * k)
            quad0 = ry == 0
            ng = ng ^ (quad0 & (rx == 1)).astype(np.int64)
            sw = sw ^ quad0.astype(np.int64)
        return pd.Series(d)

    return df.withColumn(out, _hilbert(F.col(x), F.col(y)))


def adaptive_cells(
    df: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    x: str = "x",
    y: str = "y",
    cap: int = 256,
    max_level: int = DEFAULT_LEVEL,
    id_col: str = "point_id",
) -> DataFrame:
    """Adaptive quadtree partitioning: assign each point the LEAF cell of
    the quadtree obtained by splitting every cell holding more than
    `cap` points (down to `max_level`) — the skew answer for spatial
    data, and this engine's declarative replacement for the reference's
    GPU adaptive-grouping machinery (grouped per-cell workloads,
    src/grid/uniform_grid.h histogram path): hot regions get fine cells,
    empty ones stay coarse, every emitted partition holds <= cap points
    unless it is a forced max_level leaf.

    No driver loop and no convergence iteration: the leaf containing a
    point is the SHALLOWEST ancestor whose count is <= cap (counts only
    shrink going down, so that node is exactly where splitting stops).
    Plan shape: one full-depth Morton pass; per-level counts by prefix
    rollup (O(max_level) map-side-combinable aggs over geometrically
    shrinking frames, finest localCheckpointed once); the leaf table is
    at most ~4x(n/cap) rows; assignment is one equi-join of the points'
    bounded (max_level+1)-way prefix explode against the broadcast-sized
    leaf table. Output: (id_col, cell_id, level, n_in_cell)."""
    ids = morton_id(df, scaling, grid, x, y, level=max_level, out="_m").select(
        id_col, "_m"
    )
    ids = ids.localCheckpoint(eager=True)
    finest = (
        ids.groupBy(F.col("_m").alias("cell_id"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    frames = {max_level: finest}
    for lvl in range(max_level - 1, -1, -1):
        frames[lvl] = (
            frames[lvl + 1]
            .groupBy(F.shiftright(F.col("cell_id"), 2).alias("cell_id"))
            .agg(F.sum("n").cast("bigint").alias("n"))
        )
    leaves = []
    for lvl in range(0, max_level + 1):
        fr = frames[lvl]
        if lvl == 0:
            # the root is a leaf only if nothing needs splitting at all
            leaf = fr.filter(F.col("n") <= cap)
        else:
            par = frames[lvl - 1].select(
                F.col("cell_id").alias("_pc"), F.col("n").alias("_pn")
            )
            j = fr.withColumn("_par", F.shiftright(F.col("cell_id"), 2)).join(
                par, F.col("_par") == F.col("_pc")
            )
            cond = F.col("_pn") > cap
            if lvl < max_level:
                cond = cond & (F.col("n") <= cap)  # max_level leaves are forced
            leaf = j.filter(cond).select("cell_id", "n")
        leaves.append(leaf.select("cell_id", "n", F.lit(lvl).cast("int").alias("level")))
    from functools import reduce

    leaf_tab = reduce(lambda a, b: a.unionByName(b), leaves)
    probe = ids.withColumn(
        "level", F.explode(F.sequence(F.lit(0), F.lit(max_level)))
    ).withColumn(
        "cell_id",
        F.expr(f"shiftright(_m, ({max_level} - level) * 2)"),
    )
    return probe.join(F.broadcast(leaf_tab), ["level", "cell_id"]).select(
        id_col,
        "cell_id",
        "level",
        F.col("n").alias("n_in_cell"),
    )


# --------------------------------------------------------------- geohash

#: the public geohash base-32 alphabet (no a/i/l/o)
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_bits(cx: Column, cy: Column, level: int, precision: int) -> Column:
    """The geohash bit packing over integer grid cells: MSB-first
    alternation starting with the X axis (geohash's longitude-first
    order — note this is the TRANSPOSE of `interleave_bits`), truncated
    to 5*precision bits. Uses the top bits of each axis, so finer cells
    hash into the same prefix as their ancestors. Pure codegen."""
    total = 5 * precision
    need = (total + 1) // 2
    if level < need:
        raise ValueError(f"precision {precision} needs level >= {need}, got {level}")
    cx, cy = cx.cast("bigint"), cy.cast("bigint")
    out = F.lit(0).cast("bigint")
    for t in range(total):
        src = cx if t % 2 == 0 else cy
        out = out + F.shiftleft(
            F.shiftright(src, level - 1 - t // 2).bitwiseAND(1), total - 1 - t
        )
    return out


def geohash_str(bits: Column, precision: int) -> Column:
    """Base-32 rendering of `geohash_bits` (5 bits per character,
    MSB-first) — the standard public alphabet, prefix-stable: the first
    p-1 chars of a p-char hash ARE the (p-1)-precision hash."""
    arr = F.array(*[F.lit(c) for c in GEOHASH32])
    chars = [
        F.element_at(
            arr,
            (
                F.shiftright(bits, 5 * (precision - 1 - j)).bitwiseAND(31) + 1
            ).cast("int"),
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_id(
    df: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    x: str = "x",
    y: str = "y",
    precision: int = 4,
    out: str = "geohash",
) -> DataFrame:
    """Geohash of each row's snapped grid cell — GRID-RELATIVE: the cells
    come from the engine's snapped frame (Scaling + GridSpec, including
    the reference's 0.999 edge clamp), so strings are comparable within
    an engine run / layer pair, and become the true WGS84 geohash when
    the scaling is built over (-180..180, -90..90) with a power-of-two
    grid (the bit packing + alphabet are the canonical public ones,
    pinned by test against a textbook bisection encoder)."""
    level = grid.grid_size.bit_length() - 1
    if (1 << level) != grid.grid_size:
        raise ValueError(f"geohash needs a power-of-two grid, got {grid.grid_size}")
    cx, cy = cell_xy(scaling, grid, F.col(x), F.col(y))
    return df.withColumn(
        out, geohash_str(geohash_bits(cx, cy, level, precision), precision)
    )


def quadkey_str(cell: Column, level: int, out_len: int | None = None) -> Column:
    """Bing-maps quadkey of a Morton cell id: the base-4 digits of
    `interleave_bits(cx, cy, level)` MSB-first (digit = 2*ybit + xbit —
    exactly the Bing scheme), one character per level. Truncating the
    string IS the parent quadkey (same prefix property, string form).
    Pure codegen. ``out_len`` (if given) must be in 1..level — a longer
    string has no digits to draw from (the JVM shift would wrap mod 64
    and render garbage), and 0 would silently alias to full length."""
    n = level if out_len is None else out_len
    if not 1 <= n <= level:
        raise ValueError(f"out_len must be in 1..{level}, got {out_len}")
    cell = cell.cast("bigint")
    digits = [
        F.shiftright(cell, 2 * (level - 1 - j)).bitwiseAND(3).cast("string")
        for j in range(n)
    ]
    return F.concat(*digits)


import math as _math


def web_mercator_tiles(
    df: DataFrame,
    lon_col: str = "lon_udeg",
    lat_col: str = "lat_udeg",
    zoom: int = 11,
    tx: str = "tx",
    ty: str = "ty",
) -> DataFrame:
    """Slippy-map (OSM/XYZ) tile coordinates at ``zoom`` for WGS84
    microdegree integer columns — the Web-Mercator tiling every web map
    serves:

        tx = floor((lon + 180) / 360 * 2^z)
        ty = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * 2^z)

    ``tx`` is EXACT int64 arithmetic over microdegrees
    ((lon_u + 180e6) * 2^z DIV 360e6 — no float anywhere), so the x
    split is engine-exact; zoom is validated <= 22 so the product stays
    in int64 with margin. ``ty`` needs the Mercator transcendental and
    is evaluated in double via the ln form asinh(t) = ln(t + sqrt(t*t+1))
    — the SAME expression, over the same quantized integer inputs, that
    the DuckDB oracle runs, so the gate compare over deterministic
    fixtures is a fixed outcome rather than a probabilistic one. lat
    clamps to the Web-Mercator +-85.05113 deg band, both outputs to
    [0, 2^z - 1]. Pure codegen, zero shuffle; (tx, ty) feed
    `interleave_bits` / `quadkey_str` for hierarchical tile keys.

    Inputs MUST be integer microdegrees (quantize with
    CAST(round(deg * 1e6) AS BIGINT)) — quantization is what makes both
    engines see bit-identical doubles downstream.
    """
    if not 0 <= zoom <= 22:
        raise ValueError(f"zoom must be in 0..22, got {zoom}")
    n = 1 << zoom
    txc = F.expr(
        f"greatest(CAST(0 AS BIGINT), least(CAST({n - 1} AS BIGINT), "
        f"((CAST({lon_col} AS BIGINT) + 180000000) * {n}) DIV 360000000))"
    )
    lat_c = F.greatest(
        F.lit(-85_051_130).cast("bigint"),
        F.least(F.lit(85_051_130).cast("bigint"), F.col(lat_col).cast("bigint")),
    )
    lat_rad = lat_c.cast("double") / F.lit(1e6) * F.lit(_math.pi / 180.0)
    t = F.tan(lat_rad)
    merc = F.log(t + F.sqrt(t * t + F.lit(1.0)))  # asinh, ln form
    ty_raw = F.floor(
        (F.lit(1.0) - merc / F.lit(_math.pi)) / F.lit(2.0) * F.lit(float(n))
    ).cast("bigint")
    tyc = F.greatest(
        F.lit(0).cast("bigint"), F.least(F.lit(n - 1).cast("bigint"), ty_raw)
    )
    return df.withColumn(tx, txc).withColumn(ty, tyc)


def tile_bounds(
    df: DataFrame,
    tx_col: str = "tx",
    ty_col: str = "ty",
    zoom: int = 11,
) -> DataFrame:
    """Inverse of `web_mercator_tiles`: the geographic bbox of a slippy
    tile — what a tile server stamps on every rendered tile.

    Longitude edges are EXACT integer microdegrees: west = FLOOR of the
    rational edge tx * 360e6 / 2^z, east = CEIL of (tx+1) * 360e6 / 2^z,
    so the half-open containment invariant lon_w <= lon < lon_e holds for
    every point of the tile at EVERY zoom (360e6 = 2^9 * 703125: past
    zoom 9 the rational edge is not integral, and flooring both sides
    would put a tile's own boundary points at lon == lon_e). At
    non-dividing zooms adjacent bboxes overlap by 1 microdegree
    (ceil vs floor of the same rational edge); at zoom <= 9 they share
    the edge exactly. Latitude edges need the
    inverse Mercator lat = atan(sinh(pi * (1 - 2*ty/2^z))) — computed in
    double via the exp form sinh(a) = (exp(a) - exp(-a))/2, then
    QUANTIZED to integer microdegrees (round(deg * 1e6)): the module's
    integer contract, and what makes the result engine-portable — JVM
    Math and libm differ by ULPs on exp/atan, which raw doubles expose
    but a 1e-6-degree rounding absorbs (a flip needs the true value
    within ~1e-10 deg of a rounding boundary). North edge = row ty,
    south edge = row ty+1 (slippy y grows southward). Pure codegen,
    zero shuffle.
    """
    if not 0 <= zoom <= 22:
        raise ValueError(f"zoom must be in 0..22, got {zoom}")
    n = 1 << zoom

    def lon_edge(col_expr: str, ceil: bool = False) -> F.Column:
        add = n - 1 if ceil else 0
        return F.expr(
            f"(CAST({col_expr} AS BIGINT) * 360000000 + {add}) DIV {n} - 180000000"
        )

    def lat_edge(col_expr: str) -> F.Column:
        a = F.expr(f"{_math.pi} * (1.0 - 2.0 * CAST({col_expr} AS DOUBLE) / {float(n)})")
        sinh = (F.exp(a) - F.exp(-a)) / F.lit(2.0)
        deg = F.atan(sinh) * F.lit(180.0 / _math.pi)
        return F.round(deg * F.lit(1e6)).cast("bigint")

    return (
        df.withColumn("lon_w_udeg", lon_edge(tx_col))
        .withColumn("lon_e_udeg", lon_edge(f"{tx_col} + 1", ceil=True))
        .withColumn("lat_n_udeg", lat_edge(ty_col))
        .withColumn("lat_s_udeg", lat_edge(f"{ty_col} + 1"))
    )
