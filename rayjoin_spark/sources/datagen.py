"""Deterministic synthetic fixtures (FIXTURES.md) — no rand(), no external data.

Layer A: an m x m lattice of unit squares with full polygon topology
(polygon id of cell (i,j) = 1 + i*m + j, exterior = 0) expressed as
2-point chains carrying left/right face ids, exactly the reference's
chain data model (reference src/map/planar_graph.h:24-39, CDB format
README.md:73-99). Layer B: the same lattice scaled/rotated/offset so
edges cross layer A generically.

Everything is generated distributed via spark.range + column arithmetic
(pure functions of the row id — reproducible at any scale), mirroring the
reference's seeded workload generators (src/run_query.cu:101-167) without
per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Knuth-style multiplicative hashes for pseudo-uniform positions: pure
# integer arithmetic so DuckDB oracles can reproduce them verbatim.
_MULT_X = 2654435761
_MULT_Y = 2246822519
_MOD = 1 << 32


def lattice_chains(spark: SparkSession, m: int) -> tuple[DataFrame, DataFrame]:
    """Unit-square lattice over [0,m]^2 -> (chains, points) DataFrames.

    Vertical chains walk +y (left face = west cell, right = east cell);
    horizontal chains walk +x (left = north, right = south); exterior = 0.
    chain ids: verticals [0, (m+1)*m), horizontals offset by (m+1)*m.
    """
    nv = (m + 1) * m
    pid = lambda i, j: 1 + i * m + j  # noqa: E731

    v = spark.range(nv).select(
        F.col("id").alias("chain_id"),
        (F.col("id") / m).cast("bigint").alias("i"),
        F.pmod(F.col("id"), m).alias("j"),
    )
    v_chains = v.select(
        "chain_id",
        F.when(F.col("i") > 0, 1 + (F.col("i") - 1) * m + F.col("j"))
        .otherwise(F.lit(0))
        .alias("left_polygon_id"),
        F.when(F.col("i") < m, 1 + F.col("i") * m + F.col("j"))
        .otherwise(F.lit(0))
        .alias("right_polygon_id"),
    )
    v_points = v.withColumn("seq", F.explode(F.array(F.lit(0), F.lit(1)))).select(
        "chain_id",
        "seq",
        F.col("i").cast("double").alias("x"),
        (F.col("j") + F.col("seq")).cast("double").alias("y"),
    )

    h = spark.range(nv).select(
        (F.col("id") + nv).alias("chain_id"),
        F.pmod(F.col("id"), m).alias("i"),
        (F.col("id") / m).cast("bigint").alias("j"),
    )
    h_chains = h.select(
        "chain_id",
        F.when(F.col("j") < m, 1 + F.col("i") * m + F.col("j"))
        .otherwise(F.lit(0))
        .alias("left_polygon_id"),
        F.when(F.col("j") > 0, 1 + F.col("i") * m + (F.col("j") - 1))
        .otherwise(F.lit(0))
        .alias("right_polygon_id"),
    )
    h_points = h.withColumn("seq", F.explode(F.array(F.lit(0), F.lit(1)))).select(
        "chain_id",
        "seq",
        (F.col("i") + F.col("seq")).cast("double").alias("x"),
        F.col("j").cast("double").alias("y"),
    )

    chains = v_chains.unionByName(h_chains)
    points = v_points.unionByName(h_points)
    return chains, points


def transformed_lattice(
    spark: SparkSession,
    m: int,
    scale: float = 0.7,
    angle_deg: float = 13.0,
    dx: float = 0.23,
    dy: float = 0.37,
) -> tuple[DataFrame, DataFrame]:
    """Layer B: affine-transformed lattice (edges cross layer A generically,
    with irrational-slope coordinates exercising the snap-to-grid path)."""
    chains, points = lattice_chains(spark, m)
    c = scale * math.cos(math.radians(angle_deg))
    s = scale * math.sin(math.radians(angle_deg))
    points = points.select(
        "chain_id",
        "seq",
        (F.col("x") * F.lit(c) - F.col("y") * F.lit(s) + F.lit(dx)).alias("x"),
        (F.col("x") * F.lit(s) + F.col("y") * F.lit(c) + F.lit(dy)).alias("y"),
    )
    return chains, points


def uniform_points(
    spark: SparkSession,
    n: int,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    seed: int = 0,
) -> DataFrame:
    """Pseudo-uniform query points (mirrors GeneratePIPQueries,
    reference src/run_query.cu:146-167) — hash positions are pure int
    arithmetic reproducible in any SQL engine. `seed` offsets the hash
    stream (point_ids stay 0..n-1) so repeated benchmark queries against
    a built index can use distinct point sets — identical plans would
    otherwise be satisfied from plan-canonicalized caches and measure a
    cache scan instead of a locate."""
    h_id = F.col("id") + F.lit(seed * 1_000_003)
    hx = F.pmod(h_id * F.lit(_MULT_X), F.lit(_MOD))
    hy = F.pmod(h_id * F.lit(_MULT_Y), F.lit(_MOD))
    return spark.range(n).select(
        F.col("id").alias("point_id"),
        (F.lit(min_x) + hx / F.lit(float(_MOD)) * F.lit(max_x - min_x)).alias("x"),
        (F.lit(min_y) + hy / F.lit(float(_MOD)) * F.lit(max_y - min_y)).alias("y"),
    )


def subdivide_points(points: DataFrame, s: int) -> DataFrame:
    """Split every edge of every chain into `s` collinear segments —
    turns 2-point chains into (s+1)-point polylines (multi-point chains,
    FIXTURES.md §1), exercising the CSR-walk paths with n_points > 2.
    Geometry is unchanged up to snapping."""
    from pyspark.sql import Window

    w = Window.partitionBy("chain_id").orderBy("seq")
    p = (
        points.withColumn("x2", F.lead("x").over(w))
        .withColumn("y2", F.lead("y").over(w))
        .withColumn("max_seq", F.max("seq").over(Window.partitionBy("chain_id")))
    )
    segs = (
        p.filter(F.col("x2").isNotNull())
        .withColumn("t", F.explode(F.sequence(F.lit(0), F.lit(s - 1))))
        .select(
            "chain_id",
            (F.col("seq") * s + F.col("t")).cast("int").alias("seq"),
            (F.col("x") + (F.col("x2") - F.col("x")) * F.col("t") / s).alias("x"),
            (F.col("y") + (F.col("y2") - F.col("y")) * F.col("t") / s).alias("y"),
        )
    )
    last = p.filter(F.col("seq") == F.col("max_seq")).select(
        "chain_id", (F.col("seq") * s).cast("int").alias("seq"), "x", "y"
    )
    return segs.unionByName(last)


def subdivide_fraction(points: DataFrame, s: int = 4, every: int = 20) -> DataFrame:
    """Multi-point-chain mixture: subdivide every `every`-th chain into
    s-segment polylines, leave the rest 2-point. The bench lattice uses
    this so the CSR chain walk (lead-window edge build) and the overlay
    writer's multi-fragment splitting are exercised AT BENCH SCALE, not
    just in unit fixtures."""
    sub = subdivide_points(points.filter(F.pmod(F.col("chain_id"), every) == 0), s)
    rest = points.filter(F.pmod(F.col("chain_id"), every) != 0).select(
        "chain_id", F.col("seq").cast("int").alias("seq"), "x", "y"
    )
    return rest.unionByName(sub)


def uniform_segments(
    spark: SparkSession,
    n: int,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    max_len: float = 1.0,
    eid_offset: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Random query segments of length <= max_len inside the bbox —
    mirrors GenerateLSIQueries (reference src/run_query.cu:101-144) with
    hash positions instead of a stateful RNG. Returns (chains, points)
    shaped like the layer tables (left/right polygon ids are synthetic)."""
    i = F.col("id")
    hx = F.pmod(i * _MULT_X + 17, _MOD) / F.lit(float(_MOD))
    hy = F.pmod(i * _MULT_Y + 31, _MOD) / F.lit(float(_MOD))
    hdx = F.pmod(i * 40503 + 7, _MOD) / F.lit(float(_MOD))
    hdy = F.pmod(i * 65521 + 3, _MOD) / F.lit(float(_MOD))
    base = spark.range(n).select(
        (i + eid_offset).alias("chain_id"),
        (F.lit(min_x) + hx * (max_x - min_x)).alias("x0"),
        (F.lit(min_y) + hy * (max_y - min_y)).alias("y0"),
        ((hdx * 2 - 1) * max_len).alias("dx"),
        ((hdy * 2 - 1) * max_len).alias("dy"),
    ).filter((F.col("dx") != 0) | (F.col("dy") != 0))
    chains = base.select(
        "chain_id",
        (F.pmod(F.col("chain_id"), 50) + 1).alias("left_polygon_id"),
        (F.pmod(F.col("chain_id") + 13, 50) + 1).alias("right_polygon_id"),
    )
    pts = base.withColumn("seq", F.explode(F.array(F.lit(0), F.lit(1)))).select(
        "chain_id",
        "seq",
        F.when(F.col("seq") == 0, F.col("x0")).otherwise(
            F.least(F.greatest(F.col("x0") + F.col("dx"), F.lit(min_x)), F.lit(max_x))
        ).alias("x"),
        F.when(F.col("seq") == 0, F.col("y0")).otherwise(
            F.least(F.greatest(F.col("y0") + F.col("dy"), F.lit(min_y)), F.lit(max_y))
        ).alias("y"),
    )
    return chains, pts


def skewed_segments(
    spark: SparkSession,
    n: int,
    width: float = 100.0,
    height: float = 100.0,
    exponent: int = 3,
    max_len: float = 0.5,
    eid_offset: int = 0,
    salt: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Coastline-like skewed layer: segment density follows a power law in
    x (mass piles up near x=0, like edges hugging a coastline), mirroring
    the per-cell workload histograms the reference prints for real maps
    (reference src/grid/uniform_grid.h:444-494 — a few cells carry orders
    of magnitude more edges). x0 = u^exponent * width concentrates a
    ~u^(1/exponent) fraction of all edges in the first fraction of the
    domain: exponent=3 puts ~22% of edges in the first 1% of columns.
    Deterministic hash positions; same (chains, points) shape as the
    lattice generators."""
    i = F.col("id")
    u = F.pmod(i * _MULT_X + 7 + salt, _MOD) / F.lit(float(_MOD))
    v = F.pmod(i * _MULT_Y + 11 + salt, _MOD) / F.lit(float(_MOD))
    hdx = F.pmod(i * 40503 + 19 + salt, _MOD) / F.lit(float(_MOD))
    hdy = F.pmod(i * 65521 + 23 + salt, _MOD) / F.lit(float(_MOD))
    x0 = u
    for _ in range(exponent - 1):
        x0 = x0 * u  # u^exponent without pow(): exact double product chain
    base = spark.range(n).select(
        (i + eid_offset).alias("chain_id"),
        (x0 * width).alias("x0"),
        (v * height).alias("y0"),
        ((hdx * 2 - 1) * max_len).alias("dx"),
        ((hdy * 2 - 1) * max_len).alias("dy"),
    ).filter((F.col("dx") != 0) | (F.col("dy") != 0))
    chains = base.select(
        "chain_id",
        (F.pmod(F.col("chain_id"), 50) + 1).alias("left_polygon_id"),
        (F.pmod(F.col("chain_id") + 13, 50) + 1).alias("right_polygon_id"),
    )
    pts = base.withColumn("seq", F.explode(F.array(F.lit(0), F.lit(1)))).select(
        "chain_id",
        "seq",
        F.when(F.col("seq") == 0, F.col("x0")).otherwise(
            F.least(F.greatest(F.col("x0") + F.col("dx"), F.lit(0.0)), F.lit(width))
        ).alias("x"),
        F.when(F.col("seq") == 0, F.col("y0")).otherwise(
            F.least(F.greatest(F.col("y0") + F.col("dy"), F.lit(0.0)), F.lit(height))
        ).alias("y"),
    )
    return chains, pts


def synthetic_pages(spark: SparkSession, n: int) -> DataFrame:
    """Common-Crawl-style pages table per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string).
    Deterministic function of the row id."""
    i = F.col("id")
    text = F.concat(
        F.lit("page body "),
        i.cast("string"),
        F.lit(" token"),
        F.pmod(i * 37, 1000).cast("string"),
        F.lit(" lorem ipsum dolor sit amet consectetur "),
        F.pmod(i * 101, 997).cast("string"),
    )
    return spark.range(n).select(
        F.concat(F.lit("https://host"), F.pmod(i, 97).cast("string"), F.lit(".example/p/"), i.cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1600000000) + i).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("pt"), F.lit("zh")),
            (F.pmod(i, 5) + 1).cast("int"),
        ).alias("lang"),
    )
