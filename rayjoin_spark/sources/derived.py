"""Derived deterministic geometry over the driver's TPC-H-ish testdata.

The driver's correctness gate compares each engine query against a DuckDB
oracle over the same parquet tables, so the spatial inputs must be
derivable by *both* engines bit-for-bit. Everything here is pure integer
arithmetic on table keys (Lehmer-style multiplicative hashes mod a prime)
plus the engine's snap-to-grid doubles with literal constants — no
engine-specific hash functions.

Spark builders return DataFrames shaped like plans.layers.build_edges
output; the *_SQL fragments are the equivalent DuckDB CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rayjoin_spark.plans.scaling import INTERNAL_MIN, GridSpec, Scaling

P = 1021  # prime coordinate domain

# fixed joint bbox for all derived geometry (coords are in [-30, 1051])
DERIVED_SCALING = Scaling.from_bbox(-32.0, 1056.0, -32.0, 1056.0)
DERIVED_GRID = GridSpec(64)


def _snap_sql(expr: str, axis: str) -> str:
    """Snap a double expr to the int grid — identical IEEE ops to
    Scaling.scale_x/scale_y (DuckDB CAST rounds, so trunc() first)."""
    r = DERIVED_SCALING.rx if axis == "x" else DERIVED_SCALING.ry
    d = DERIVED_SCALING.dx if axis == "x" else DERIVED_SCALING.dy
    return f"CAST(trunc(({expr}) * {r!r} + {d!r}) AS BIGINT)"


def _cell_sql(expr: str) -> str:
    cs = DERIVED_GRID.cell_scale
    return f"CAST(trunc((({expr}) - ({INTERNAL_MIN})) * {cs!r}) AS INT)"


def _edges_spark(
    df: DataFrame, key, x1m: int, y1m: int, dxk, dyk, lp, rp
) -> DataFrame:
    """Common shape: integer endpoints + snapped ints + int64 line eqn."""
    e = df.select(
        key.alias("eid"),
        (F.pmod(key * x1m, P)).cast("double").alias("xd1"),
        (F.pmod(key * y1m, P)).cast("double").alias("yd1"),
        dxk.alias("dx"),
        dyk.alias("dy"),
        lp.alias("left_polygon_id"),
        rp.alias("right_polygon_id"),
    ).filter((F.col("dx") != 0) | (F.col("dy") != 0))
    e = e.withColumn("xd2", F.col("xd1") + F.col("dx")).withColumn(
        "yd2", F.col("yd1") + F.col("dy")
    )
    s = DERIVED_SCALING
    e = (
        e.withColumn("x1", s.scale_x(F.col("xd1")))
        .withColumn("y1", s.scale_y(F.col("yd1")))
        .withColumn("x2", s.scale_x(F.col("xd2")))
        .withColumn("y2", s.scale_y(F.col("yd2")))
    )
    a0 = F.col("y1") - F.col("y2")
    b0 = F.col("x2") - F.col("x1")
    e = (
        e.withColumn("a", F.when(b0 < 0, -a0).otherwise(a0))
        .withColumn("b", F.when(b0 < 0, -b0).otherwise(b0))
        .withColumn("c", -F.col("x1") * F.col("a") - F.col("y1") * F.col("b"))
    )
    return e.select(
        "eid", "x1", "y1", "x2", "y2", "a", "b", "c",
        "left_polygon_id", "right_polygon_id",
    )


def edges_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # one edge per order key (synthetic lineitem repeats linenumbers)
    li = (
        li.filter(F.pmod(F.col("l_orderkey"), 4) == 0)
        .groupBy("l_orderkey")
        .agg(F.min("l_partkey").alias("pk"), F.min("l_suppkey").alias("sk"))
    )
    return _edges_spark(
        li,
        F.col("l_orderkey"),
        48271,
        16807,
        F.pmod(F.col("pk"), 61) - 30,
        F.pmod(F.col("sk"), 41) - 20,
        F.pmod(F.col("pk"), 100) + 1,
        F.pmod(F.col("sk"), 100) + 1,
    )


def edges_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = o.filter(F.pmod(F.col("o_orderkey"), 4) == 1)
    return _edges_spark(
        o,
        F.col("o_orderkey"),
        69621,
        40692,
        F.pmod(F.col("o_custkey"), 61) - 30,
        F.pmod(F.col("o_orderkey") + F.col("o_custkey"), 41) - 20,
        F.pmod(F.col("o_custkey"), 100) + 1,
        F.pmod(F.col("o_custkey") + 7, 100) + 1,
    )


def query_rects(
    spark: SparkSession,
    sf_dir: str,
    residue: int = 3,
    xm: int = 14741,
    ym: int = 28657,
    wm: int = 37,
    hm: int = 29,
) -> DataFrame:
    """Deterministic axis-aligned query rectangles (raw double corners):
    centers from the same Lehmer hash family as query_points, half-sizes
    from small key residues. One rect per orders key ≡ residue (mod 16).
    The parameters pick the hash family (rect_join's B side passes its
    own) so the derivation convention lives here only — `rects_sql`
    mirrors the same parameters."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = o.filter(F.pmod(F.col("o_orderkey"), 16) == residue)
    k = F.col("o_orderkey")
    cx = F.pmod(k * xm, P).cast("double")
    cy = F.pmod(k * ym, P).cast("double")
    w = (F.pmod(k, wm) + 2).cast("double")
    h = (F.pmod(k, hm) + 2).cast("double")
    return o.select(
        k.alias("rect_id"),
        (cx - w).alias("x1"),
        (cy - h).alias("y1"),
        (cx + w).alias("x2"),
        (cy + h).alias("y2"),
    )


def rects_sql(
    residue: int = 3, xm: int = 14741, ym: int = 28657,
    wm: int = 37, hm: int = 29,
) -> str:
    """DuckDB twin of query_rects + operators/rangequery.snap_rects (the
    snap is monotone with rx,ry > 0, so corner order is preserved).
    Same parameters as query_rects — ONE derivation convention."""
    cx = f"CAST((o_orderkey * {xm}) % {P} AS DOUBLE)"
    cy = f"CAST((o_orderkey * {ym}) % {P} AS DOUBLE)"
    w = f"CAST(o_orderkey % {wm} + 2 AS DOUBLE)"
    h = f"CAST(o_orderkey % {hm} + 2 AS DOUBLE)"
    return f"""
  SELECT o_orderkey AS rect_id,
         {_snap_sql(f'{cx} - {w}', 'x')} AS rx1,
         {_snap_sql(f'{cy} - {h}', 'y')} AS ry1,
         {_snap_sql(f'{cx} + {w}', 'x')} AS rx2,
         {_snap_sql(f'{cy} + {h}', 'y')} AS ry2
  FROM orders WHERE o_orderkey % 16 = {residue}"""


def query_points(
    spark: SparkSession,
    sf_dir: str,
    residue: int = 2,
    mod: int = 4,
    xm: int = 33461,
    ym: int = 20021,
) -> DataFrame:
    """Deterministic point fixture over orders keys. ``xm``/``ym`` pick
    the coordinate hash multipliers (the defaults are THE fixture every
    oracle states; alternates like od_matrix's destination set pass
    their own pair so the derivation convention lives here only)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = o.filter(F.pmod(F.col("o_orderkey"), mod) == residue)
    return o.select(
        F.col("o_orderkey").alias("point_id"),
        F.pmod(F.col("o_orderkey") * xm, P).cast("double").alias("x"),
        F.pmod(F.col("o_orderkey") * ym, P).cast("double").alias("y"),
    )


# ---------------------------------------------------------------- SQL twins

def _edges_sql(src: str, key: str, x1m: int, y1m: int, dx: str, dy: str,
               lp: str, rp: str, flt: str) -> str:
    """DuckDB CTE body producing the same snapped edge table."""
    return f"""
  SELECT eid, x1, y1, x2, y2,
         CASE WHEN (x2 - x1) < 0 THEN -(y1 - y2) ELSE (y1 - y2) END AS a,
         CASE WHEN (x2 - x1) < 0 THEN -(x2 - x1) ELSE (x2 - x1) END AS b,
         -x1 * (CASE WHEN (x2 - x1) < 0 THEN -(y1 - y2) ELSE (y1 - y2) END)
         -y1 * (CASE WHEN (x2 - x1) < 0 THEN -(x2 - x1) ELSE (x2 - x1) END) AS c,
         left_polygon_id, right_polygon_id
  FROM (
    SELECT eid,
           {_snap_sql('xd1', 'x')} AS x1, {_snap_sql('yd1', 'y')} AS y1,
           {_snap_sql('xd1 + dx', 'x')} AS x2, {_snap_sql('yd1 + dy', 'y')} AS y2,
           left_polygon_id, right_polygon_id
    FROM (
      SELECT {key} AS eid,
             CAST(({key} * {x1m}) % {P} AS DOUBLE) AS xd1,
             CAST(({key} * {y1m}) % {P} AS DOUBLE) AS yd1,
             {dx} AS dx, {dy} AS dy,
             {lp} AS left_polygon_id, {rp} AS right_polygon_id
      FROM {src}
      WHERE {flt}
    ) WHERE NOT (dx = 0 AND dy = 0)
  )"""


EDGES_A_SQL = _edges_sql(
    "(SELECT l_orderkey, MIN(l_partkey) AS pk, MIN(l_suppkey) AS sk"
    " FROM lineitem WHERE l_orderkey % 4 = 0 GROUP BY l_orderkey)",
    "l_orderkey", 48271, 16807,
    "(pk % 61) - 30", "(sk % 41) - 20",
    "(pk % 100) + 1", "(sk % 100) + 1",
    "TRUE",
)

EDGES_B_SQL = _edges_sql(
    "orders", "o_orderkey", 69621, 40692,
    "(o_custkey % 61) - 30", "((o_orderkey + o_custkey) % 41) - 20",
    "(o_custkey % 100) + 1", "((o_custkey + 7) % 100) + 1",
    "o_orderkey % 4 = 1",
)


def points_sql(residue: int = 2, mod: int = 4) -> str:
    return f"""
  SELECT o_orderkey AS point_id,
         {_snap_sql(f'CAST((o_orderkey * 33461) % {P} AS DOUBLE)', 'x')} AS px,
         {_snap_sql(f'CAST((o_orderkey * 20021) % {P} AS DOUBLE)', 'y')} AS py
  FROM orders WHERE o_orderkey % {mod} = {residue}"""


def cell_sql(expr: str) -> str:
    return _cell_sql(expr)
