"""Polygon-per-line CSV reader (reference src/map/polygon_parser.h:13-87).

Format (the reference's aux polygon format, used to ingest other tools'
datasets):

    <n_polygons>
    <polygon_id> <x>,<y> <x>,<y> ...      (one line per polygon ring)

``head_eq_tail=True`` mirrors the reference flag: a ring whose last
vertex differs from its first gets the first vertex appended, closing it.

Distributed parse: unlike the CDB grammar (stateful header/point lines),
every polygon is self-contained on ONE line, so this parses with zero
window functions — split + posexplode, fully parallel over file splits.
The header line (a single integer) is only a count; it is validated
against the parsed result but carries no per-row information, so the
parse never synchronizes on it.

``polygons_to_chains`` converts rings into the engine's (chains, points)
model — one chain per ring, interior face = polygon_id + 1 on the left
of the vertex walk (CCW convention), exterior face 0 on the right — so a
polygon CSV becomes joinable/overlayable exactly like a CDB map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_polygon_csv(
    spark: SparkSession,
    path: str,
    head_eq_tail: bool = False,
    pair_delim: str = " ",
    coord_delim: str = ",",
) -> DataFrame:
    """Parse the polygon CSV -> DataFrame(polygon_id, seq, x, y).

    seq is the 0-based vertex position along the ring (after the optional
    head_eq_tail closure append). Raises ValueError when a polygon_id
    falls outside [0, n_polygons) — the reference's CHECK
    (src/map/polygon_parser.h:45-46) — or when the declared count
    disagrees with the parsed line count.
    """
    import re

    raw = (
        spark.read.text(path)
        .withColumn("line", F.trim(F.col("value")))
        .filter(F.length("line") > 0)
    )
    # the single-integer header is the only line without a delimiter pair
    body = raw.filter(F.col("line").rlike(re.escape(coord_delim)))
    toks = F.split("line", re.escape(pair_delim) + "+")
    parsed = body.select(
        F.element_at(toks, 1).cast("long").alias("polygon_id"),
        F.slice(toks, 2, 2_000_000_000).alias("pairs"),
    )
    if head_eq_tail:
        # numeric compare like the reference (vec_x/vec_y values), not
        # textual: "1.0,2" and "1,2.0" are the same closed ring
        def _xy(pair_col):
            sp = F.split(pair_col, re.escape(coord_delim))
            return sp[0].cast("double"), sp[1].cast("double")

        hx, hy = _xy(F.element_at("pairs", 1))
        tx, ty = _xy(F.element_at("pairs", -1))
        parsed = parsed.withColumn(
            "pairs",
            F.when(
                (hx != tx) | (hy != ty),
                F.concat("pairs", F.array(F.element_at("pairs", 1))),
            ).otherwise(F.col("pairs")),
        )
    pts = parsed.select(
        "polygon_id", F.posexplode("pairs").alias("seq", "pair")
    ).select(
        "polygon_id",
        "seq",
        F.split("pair", re.escape(coord_delim))[0].cast("double").alias("x"),
        F.split("pair", re.escape(coord_delim))[1].cast("double").alias("y"),
    )
    # header validation (reference CHECKs) — one tiny agg, driver-side
    hdr = raw.filter(~F.col("line").rlike(re.escape(coord_delim)))
    declared = [int(r["line"]) for r in hdr.limit(2).collect()]
    stats = pts.agg(
        F.count_distinct("polygon_id").alias("n"),
        F.min("polygon_id").alias("lo"),
        F.max("polygon_id").alias("hi"),
    ).collect()[0]
    if len(declared) != 1:
        raise ValueError(f"expected one header line, found {len(declared)}")
    n_declared = declared[0]
    if stats["n"] != n_declared:
        raise ValueError(
            f"header declares {n_declared} polygons, parsed {stats['n']}"
        )
    if stats["n"] and not (0 <= stats["lo"] and stats["hi"] < n_declared):
        raise ValueError(
            f"polygon id out of range [0, {n_declared}): "
            f"saw {stats['lo']}..{stats['hi']}"
        )
    return pts


def polygons_to_chains(polygons: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Ring vertices -> the engine's (chains, points) model.

    One chain per polygon: chain_id = polygon_id, interior face
    polygon_id + 1 on the LEFT of the vertex walk, exterior face 0 on the
    right (face 0 = exterior, reference src/config.h:8; faces are 1-based
    so polygon 0's interior is face 1). first/last point indexes follow
    the CDB convention (cumulative vertex offsets in ring order).
    """
    np_df = polygons.groupBy("polygon_id").agg(F.count("*").alias("n_points"))
    # chain-count-sized frame (one row per polygon): a global running sum
    # here is the same driver-cheap shape as the CDB chain headers
    w_off = F.sum("n_points").over(
        Window.orderBy("polygon_id").rowsBetween(Window.unboundedPreceding, -1)
    )
    chains = np_df.select(
        F.col("polygon_id").alias("chain_id"),
        F.col("n_points").cast("int").alias("n_points"),
        F.coalesce(w_off, F.lit(0)).alias("first_point_idx"),
        (F.coalesce(w_off, F.lit(0)) + F.col("n_points") - 1).alias(
            "last_point_idx"
        ),
        (F.col("polygon_id") + 1).alias("left_polygon_id"),
        F.lit(0).cast("long").alias("right_polygon_id"),
    )
    points = polygons.select(
        F.col("polygon_id").alias("chain_id"), "seq", "x", "y"
    )
    return chains, points
