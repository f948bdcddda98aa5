"""Raster <-> vector tile aggregation.

The graft's tiling layer on top of the grid machinery:

* `tile_aggregate` — roll point/cell data up to coarser zoom tiles
  (tile = cell >> shift), one groupBy;
* `rasterize_layer` — vector -> raster: locate every tile center in the
  polygon layer with the engine's own PIP operator; output is a face id
  per tile (a raster coverage);
* `vectorize_raster` — raster -> vector: dissolve same-face neighbor
  tiles and emit the boundary segments between differing faces (the
  vector outline of the raster), via two shifted self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.operators.pip import pip_locate
from rayjoin_spark.plans.scaling import INTERNAL_MIN, GridSpec, Scaling


def tile_of(cell_col, shift: int):
    return F.shiftright(cell_col, shift)


def tile_aggregate(
    points: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    shift: int = 3,
    value_col: str | None = None,
) -> DataFrame:
    """Aggregate points to (tile_x, tile_y): count + optional sum/min/max."""
    p = points.withColumn("cx", grid.cell_of(scaling.scale_x(F.col("x")))).withColumn(
        "cy", grid.cell_of(scaling.scale_y(F.col("y")))
    )
    p = p.withColumn("tile_x", tile_of(F.col("cx"), shift)).withColumn(
        "tile_y", tile_of(F.col("cy"), shift)
    )
    aggs = [F.count("*").alias("n_points")]
    if value_col:
        aggs += [
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        ]
    return p.groupBy("tile_x", "tile_y").agg(*aggs)


def tile_centers(spark, scaling: Scaling, grid: GridSpec, shift: int = 3) -> DataFrame:
    """Center point (in input-domain doubles) of every tile at the zoom."""
    n_tiles = (grid.grid_size + (1 << shift) - 1) >> shift
    t = (
        spark.range(n_tiles)
        .select(F.col("id").alias("tile_x"))
        .crossJoin(spark.range(n_tiles).select(F.col("id").alias("tile_y")))
    )
    # tile spans cells [tile<<shift, (tile+1)<<shift); center in int domain,
    # then unscale to input doubles for pip_locate
    span = (1 << shift) / grid.cell_scale
    cx = F.lit(INTERNAL_MIN) + (F.col("tile_x") + 0.5) * F.lit(span)
    cy = F.lit(INTERNAL_MIN) + (F.col("tile_y") + 0.5) * F.lit(span)
    return t.select(
        (F.col("tile_x") * F.lit(n_tiles) + F.col("tile_y")).alias("point_id"),
        "tile_x",
        "tile_y",
        scaling.unscale_x(cx).alias("x"),
        scaling.unscale_y(cy).alias("y"),
    )


def rasterize_layer(
    edges: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    shift: int = 3,
) -> DataFrame:
    """Vector -> raster: face id of every tile center (exterior = 0)."""
    centers = tile_centers(edges.sparkSession, scaling, grid, shift)
    located = pip_locate(centers, edges, scaling, grid)
    return (
        centers.select("point_id", "tile_x", "tile_y")
        .join(located.select("point_id", "face_id"), "point_id")
        .select("tile_x", "tile_y", "face_id")
    )


def vectorize_raster(raster: DataFrame) -> DataFrame:
    """Raster -> vector: boundary segments between tiles of differing face.

    Emits one row per boundary between a tile and its east/north neighbor
    (orientation 'v' = vertical boundary to the east neighbor, 'h' =
    horizontal boundary to the north), with both face ids. Missing
    neighbors count as exterior face 0.
    """
    base = raster.select("tile_x", "tile_y", "face_id")
    east = base.select(
        (F.col("tile_x") - 1).alias("tile_x"),
        F.col("tile_y"),
        F.col("face_id").alias("face_east"),
    )
    north = base.select(
        F.col("tile_x"),
        (F.col("tile_y") - 1).alias("tile_y"),
        F.col("face_id").alias("face_north"),
    )
    j = (
        base.join(east, ["tile_x", "tile_y"], "left")
        .join(north, ["tile_x", "tile_y"], "left")
        .na.fill({"face_east": 0, "face_north": 0})
    )
    v = j.filter(F.col("face_id") != F.col("face_east")).select(
        "tile_x",
        "tile_y",
        F.lit("v").alias("orientation"),
        F.col("face_id").alias("face_a"),
        F.col("face_east").alias("face_b"),
    )
    h = j.filter(F.col("face_id") != F.col("face_north")).select(
        "tile_x",
        "tile_y",
        F.lit("h").alias("orientation"),
        F.col("face_id").alias("face_a"),
        F.col("face_north").alias("face_b"),
    )
    return v.unionByName(h)


def tile_payloads(clipped: DataFrame, tile: str = "rect_id") -> DataFrame:
    """Assemble served tile payloads from clipped segments (the encode
    step after operators/clip.clip_segments): a deterministic per-tile
    layer serialization plus its content digest, the cache key / ETag a
    tile server needs.

    Each segment serializes as
    ``eid:cx1_num,cy1_num,den1,cx2_num,cy2_num,den2`` (the exact-rational
    endpoints, so the payload is engine- and partitioning-independent);
    the tile payload is the ';'-join in byte order and ``tile_hash`` its
    md5. Output: (tile_id, n_segments, payload_bytes, tile_hash).

    Scale shape: one map-side-combinable groupBy per tile with
    sort_array(collect_list(...)) — per-tile row counts are bounded by
    tile content (served tiles are small by design; cut oversized tiles
    at a deeper zoom upstream, not here). No windows, no driver loop.
    """
    seg = F.concat_ws(
        ",",
        F.col("cy1_num").cast("string"),
        F.col("den1").cast("string"),
        F.col("cx2_num").cast("string"),
        F.col("cy2_num").cast("string"),
        F.col("den2").cast("string"),
    )
    seg = F.concat(
        F.col("eid").cast("string"), F.lit(":"),
        F.col("cx1_num").cast("string"), F.lit(","), seg,
    )
    return (
        clipped.select(F.col(tile).alias("tile_id"), seg.alias("_seg"))
        .groupBy("tile_id")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.array_join(F.sort_array(F.collect_list("_seg")), ";").alias("_payload"),
        )
        .select(
            "tile_id",
            "n_segments",
            F.length("_payload").cast("bigint").alias("payload_bytes"),
            F.md5(F.col("_payload").cast("binary")).alias("tile_hash"),
        )
    )


def tile_pyramid(
    points: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    max_zoom: int,
    value_col: str | None = None,
) -> DataFrame:
    """Full slippy-map tile pyramid in ONE pass: per-point counts (and
    optional value sums) at EVERY zoom level 0..max_zoom, where the
    level-z tile is the level-max cell right-shifted by (max_zoom - z)
    on each axis (quadtree parent chain).

    Plan shape: one bounded explode (max_zoom+1 rows per point) + one
    map-side-combinable groupBy — NOT max_zoom+1 separate jobs and NOT a
    shuffle per level. The explode factor is the pyramid depth (~10-20),
    constant in data size; partial aggregation collapses each executor's
    points into at most (#tiles-touched x depth) rows before the single
    shuffle. At 100 TB this is the cheapest possible pyramid: child->
    parent rollup chains (z+1 -> z) would shuffle per level and
    serialize the levels.
    """
    p = points.withColumn("cx", grid.cell_of(scaling.scale_x(F.col("x")))).withColumn(
        "cy", grid.cell_of(scaling.scale_y(F.col("y")))
    )
    p = p.withColumn(
        "zoom", F.explode(F.sequence(F.lit(0), F.lit(max_zoom)))
    ).withColumn("zoom", F.col("zoom").cast("int")).select(
        "zoom",
        F.expr(f"shiftright(cx, {max_zoom} - zoom)").alias("tile_x"),
        F.expr(f"shiftright(cy, {max_zoom} - zoom)").alias("tile_y"),
        *([F.col(value_col)] if value_col else []),
    )
    aggs = [F.count("*").alias("n_points")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return p.groupBy("zoom", "tile_x", "tile_y").agg(*aggs)


def hotspot_tiles(
    tiles: DataFrame,
    hot_pct: int = 150,
    count_col: str = "n_points",
) -> DataFrame:
    """Getis-Ord-style hotspot flags over a tile-count raster, integer-
    quantized: a tile is HOT when its 3x3 neighborhood sum exceeds
    ``hot_pct`` percent of the neighborhood's expected mass under a
    uniform spread,

        hot  <=>  nbr_sum * n_tiles * 100 > 9 * total * hot_pct

    — one cross-multiplied bigint comparison, no float z-score (the
    classic Gi* divides by a stddev; this variant keeps the same "local
    mass vs global expectation" decision boundary in exact integers, so
    both engines agree bit-for-bit). Empty neighbor tiles contribute 0
    (only OCCUPIED tiles generate rows; a tile bordering the void is
    judged on what's actually there).

    Scale shape: one bounded 9-way offset explode on the (already
    aggregated, tile-table-sized) input + one equi-join on the tile key
    + one combinable groupBy — the cell-neighborhood pattern of
    dist_join applied at raster level. n_tiles/total ride a broadcast
    one-row frame.
    """
    t = tiles.select(
        F.col("tile_x").cast("bigint"),
        F.col("tile_y").cast("bigint"),
        F.col(count_col).cast("bigint").alias("n"),
    )
    stats = t.agg(
        F.count("*").alias("n_tiles"), F.sum("n").alias("total")
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = t.select(
        "tile_x",
        "tile_y",
        "n",
        F.explode(offs).alias("o"),
    ).select(
        "tile_x",
        "tile_y",
        "n",
        (F.col("tile_x") + F.col("o.dx")).alias("nx"),
        (F.col("tile_y") + F.col("o.dy")).alias("ny"),
    )
    nbr = t.select(
        F.col("tile_x").alias("nx"), F.col("tile_y").alias("ny"),
        F.col("n").alias("nn"),
    )
    agg = (
        probes.join(nbr, ["nx", "ny"], "left")
        .groupBy("tile_x", "tile_y", "n")
        .agg(F.sum(F.coalesce("nn", F.lit(0))).alias("nbr_sum"))
    )
    return (
        agg.crossJoin(F.broadcast(stats))
        .select(
            "tile_x",
            "tile_y",
            F.col("n").alias("n_points"),
            F.col("nbr_sum").cast("bigint").alias("nbr_sum"),
            # decimal(38,0) on both sides: at planet scale (total ~1e10,
            # n_tiles ~1e8) the int64 product wraps silently while the
            # HUGEINT oracle doesn't — the bm25 overflow lesson applied
            (
                F.col("nbr_sum").cast("decimal(38,0)")
                * F.col("n_tiles")
                * F.lit(100)
                > F.lit(9) * F.col("total").cast("decimal(38,0)") * F.lit(hot_pct)
            ).alias("hot"),
        )
    )


def _rook_deviations(tiles: DataFrame, count_col: str):
    """Shared scaffolding for moran_i / local_moran: scaled deviations
    s_i = N*x_i - T (decimal(38,0)) over occupied tiles, the bounded
    4-way rook probe explode, and the neighbor lookup frame. Returns
    (s, probes, nbr): s(tile_x, tile_y, n, n_tiles, s),
    probes(tile_x, tile_y, n, s, nx, ny), nbr(nx, ny, sn). Any change
    to the weights scheme or deviation arithmetic lands in BOTH
    statistics through here."""
    t = tiles.select(
        F.col("tile_x").cast("bigint"),
        F.col("tile_y").cast("bigint"),
        F.col(count_col).cast("bigint").alias("n"),
    )
    stats = t.agg(
        F.count("*").cast("decimal(38,0)").alias("n_tiles"),
        F.sum("n").cast("decimal(38,0)").alias("total"),
    )
    s = t.crossJoin(F.broadcast(stats)).select(
        "tile_x",
        "tile_y",
        "n",
        "n_tiles",
        (F.col("n_tiles") * F.col("n") - F.col("total")).alias("s"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1))
        ]
    )
    probes = s.select(
        "tile_x",
        "tile_y",
        "n",
        "s",
        F.explode(offs).alias("o"),
    ).select(
        "tile_x",
        "tile_y",
        "n",
        "s",
        (F.col("tile_x") + F.col("o.dx")).alias("nx"),
        (F.col("tile_y") + F.col("o.dy")).alias("ny"),
    )
    nbr = s.select(
        F.col("tile_x").alias("nx"),
        F.col("tile_y").alias("ny"),
        F.col("s").alias("sn"),
    )
    return s, probes, nbr


def moran_i(
    tiles: DataFrame,
    count_col: str = "n_points",
) -> DataFrame:
    """Global Moran's I spatial autocorrelation over a tile-count raster
    with rook (4-neighbor) binary weights — the one-number "is the
    geocoded-page density clustered, dispersed, or random?" diagnostic
    that pairs with hotspot_tiles' per-tile flags.

    Exact-integer contract: with N tiles, total mass T and per-tile
    count x_i, the scaled deviation s_i = N*x_i - T is an integer and

        I = (N / W) * (sum_{i~j} s_i * s_j) / (sum_i s_i^2)

    (the N^2 from the un-scaled deviations cancels). The result is
    returned as the exact fraction — one row (n_tiles, w_sum, moran_num,
    moran_den) where moran_num = sum over DIRECTED rook neighbor pairs
    of s_i*s_j and moran_den = sum s_i^2, both decimal(38,0) (s_i alone
    overflows int64 once N*x_max > 9.2e18). The decimal side is EXACT
    while |s_i| < ~1e18 (so the summed 36-digit products stay under 38
    digits across ~1e2 x more pairs); past that Spark's ANSI mode fails
    LOUD, never silently — aggregate to a coarser zoom (tile_aggregate)
    first, which is statistically sensible anyway at that density. No
    float crosses an aggregate, so both engines agree digit-for-digit.
    I itself = n_tiles * num / (w_sum * den), left to the caller (it is
    generally irrational).

    Only OCCUPIED tiles participate (the raster contract shared with
    hotspot_tiles: absent tiles are void, not zero-count cells — the
    universe is "tiles that received data").

    Scale shape: one stats agg, one bounded 4-way offset explode +
    equi-join on the tile key (the raster-level cell-neighborhood
    pattern), two combinable sums. No window, no collect.
    """
    s, probes, nbr = _rook_deviations(tiles, count_col)
    cross = probes.join(nbr, ["nx", "ny"], "inner").agg(
        F.count("*").cast("bigint").alias("w_sum"),
        F.sum(F.col("s") * F.col("sn")).cast("decimal(38,0)").alias("moran_num"),
    )
    den = s.agg(
        F.max("n_tiles").cast("bigint").alias("n_tiles"),
        F.sum(F.col("s") * F.col("s")).cast("decimal(38,0)").alias("moran_den"),
    )
    return den.crossJoin(F.broadcast(cross)).select(
        "n_tiles", "w_sum", "moran_num", "moran_den"
    )


def local_moran(
    tiles: DataFrame,
    count_col: str = "n_points",
) -> DataFrame:
    """Local Moran's I (LISA, Anselin 1995) components per tile — the
    per-tile sibling of `moran_i`: which tiles sit in high-high /
    low-low clusters vs high-low outliers. Same exact-integer contract
    and rook weights: with s_i = N*x_i - T,

        I_i  ∝  s_i * sum_{j in N(i)} s_j

    and the emitted row is (tile_x, tile_y, n_points, s, w_i, local_num)
    with w_i the realized neighbor count and local_num = s_i * Σ s_j as
    decimal(38,0) (the caller normalizes by Σ s_k^2 / N from `moran_i`
    if a unit-scaled statistic is wanted; sign + relative magnitude —
    the cluster/outlier call — need no division). Quadrant: s > 0 &
    local_num > 0 = high-high, s < 0 & local_num > 0 = low-low,
    local_num < 0 = spatial outlier.

    Same scale shape as moran_i: broadcast stats, bounded 4-way offset
    explode, one tile equi-join, one combinable groupBy. Same |s_i| <
    ~1e18 exactness bound (ANSI fails loud past it; coarsen first).
    """
    _, probes, nbr = _rook_deviations(tiles, count_col)
    return (
        probes.join(nbr, ["nx", "ny"], "left")
        .groupBy("tile_x", "tile_y", "n", "s")
        .agg(
            F.count(F.col("sn")).cast("bigint").alias("w_i"),
            F.coalesce(F.sum("sn"), F.lit(0).cast("decimal(38,0)")).alias("_nbr_sum"),
        )
        .select(
            "tile_x",
            "tile_y",
            F.col("n").alias("n_points"),
            F.col("s").cast("decimal(38,0)").alias("s"),
            "w_i",
            (F.col("s") * F.col("_nbr_sum")).cast("decimal(38,0)").alias("local_num"),
        )
    )


def raster_diff(
    tiles_a: DataFrame,
    tiles_b: DataFrame,
    count_col: str = "n_points",
) -> DataFrame:
    """Raster change detection between two tile-count epochs (the
    crawl_diff analog at raster level): full-outer join on the tile key,
    each tile classified added / removed / changed / same with the
    signed count delta — the recrawl-targeting signal ("which map areas
    gained or lost density since the last snapshot").

    Returns (tile_x, tile_y, n_a, n_b, delta, status); absent tiles
    read as count 0 on that side (the occupied-tile raster contract:
    absence IS the information here, unlike moran_i's universe).

    Scale shape: ONE full-outer hash join on the tile key + codegen
    classification — both inputs are already tile-table sized.
    """
    a = tiles_a.select(
        F.col("tile_x").cast("bigint"),
        F.col("tile_y").cast("bigint"),
        F.col(count_col).cast("bigint").alias("n_a"),
    )
    b = tiles_b.select(
        F.col("tile_x").cast("bigint"),
        F.col("tile_y").cast("bigint"),
        F.col(count_col).cast("bigint").alias("n_b"),
    )
    j = a.join(b, ["tile_x", "tile_y"], "full_outer").select(
        "tile_x",
        "tile_y",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    return j.select(
        "tile_x",
        "tile_y",
        "n_a",
        "n_b",
        (F.col("n_b") - F.col("n_a")).cast("bigint").alias("delta"),
        F.when(F.col("n_a") == 0, F.lit("added"))
        .when(F.col("n_b") == 0, F.lit("removed"))
        .when(F.col("n_a") != F.col("n_b"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("status"),
    )
