"""Raster<->vector tiles and page geocoding/location invariants."""

from pyspark.sql import functions as F

from rayjoin_spark.operators.tiles import rasterize_layer, vectorize_raster, tile_centers
from rayjoin_spark.plans.layers import build_edges
from rayjoin_spark.plans.scaling import GridSpec, compute_scaling
from rayjoin_spark.sources.datagen import lattice_chains, synthetic_pages
from rayjoin_spark.sources.pages import geocode_pages, locate_pages

from tests.oracle import build_edges_py, face_of, pip_oracle_one, scale_points_py


def test_rasterize_matches_pip_oracle(spark):
    m = 3
    ca, pa = lattice_chains(spark, m)
    scaling = compute_scaling(pa)
    ea = build_edges(ca, pa, scaling)
    grid = GridSpec(32)
    raster = {(r["tile_x"], r["tile_y"]): r["face_id"]
              for r in rasterize_layer(ea, scaling, grid, shift=3).collect()}
    # oracle: locate each tile center
    ca_py = {r["chain_id"]: (r["left_polygon_id"], r["right_polygon_id"]) for r in ca.collect()}
    ea_py = build_edges_py(ca_py, sorted((r["chain_id"], r["seq"], r["x"], r["y"]) for r in pa.collect()), scaling)
    centers = tile_centers(spark, scaling, grid, shift=3).collect()
    assert len(raster) == len(centers) > 0
    for r in centers:
        px, py = scale_points_py([r["x"]], [r["y"]], scaling)
        best = pip_oracle_one(int(px[0]), int(py[0]), ea_py)
        assert raster[(r["tile_x"], r["tile_y"])] == face_of(best)
    # interior faces present
    assert set(raster.values()) - {0}


def test_vectorize_raster_boundaries(spark):
    # checkerboard raster: every interior tile has 2 boundaries (east+north)
    rows = [(x, y, (x + y) % 2 + 1) for x in range(4) for y in range(4)]
    raster = spark.createDataFrame(rows, "tile_x int, tile_y int, face_id int")
    v = vectorize_raster(raster).collect()
    # every adjacent pair differs (checkerboard) + border-to-exterior edges
    east_north_pairs = 2 * 3 * 4  # interior adjacencies
    border = 16  # 4 edges x 4 tiles missing-neighbor sides (east/north only -> 8)
    assert len(v) >= east_north_pairs
    assert all(r["face_a"] != r["face_b"] for r in v)


def test_pages_text_byte_identical(spark):
    m = 3
    ca, pa = lattice_chains(spark, m)
    scaling = compute_scaling(pa)
    ea = build_edges(ca, pa, scaling)
    pages = synthetic_pages(spark, 300)
    geo = geocode_pages(pages, -0.5, m + 0.5, -0.5, m + 0.5)
    located = locate_pages(geo, ea, scaling, GridSpec(16))
    orig = {r["url"]: (r["text"], bytes(r["html"])) for r in pages.collect()}
    out = located.collect()
    assert len(out) == 300
    for r in out:
        t, h = orig[r["url"]]
        assert r["text"] == t  # byte-identical passthrough
        assert bytes(r["html"]) == h
        assert r["face_id"] is not None
    # some pages land inside polygons, some outside
    faces = {r["face_id"] for r in out}
    assert 0 in faces and (faces - {0})


def test_streaming_sessionize_hosts(spark, tmp_path):
    """applyInPandasWithState sessionization: a visit gap > gap_seconds
    closes a session; within-batch closures are emitted in update mode."""
    import datetime as dt

    from rayjoin_spark.streaming.pages_stream import sessionize_hosts

    base = dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)

    def row(host, sec, text):
        return (f"https://{host}/p", base + dt.timedelta(seconds=sec), text)

    rows = [
        row("a.example", 0, "xxxx"),
        row("a.example", 100, "yy"),
        row("a.example", 3000, "z"),      # gap 2900 > 1800: closes session 1
        row("b.example", 50, "bbbb"),     # single open session: not emitted
    ]
    src = str(tmp_path / "sess_in")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_hosts(stream, gap_seconds=1800)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM sessions_out").collect()
    finally:
        q.stop()
    assert len(got) == 1
    s = got[0]
    assert s["host"] == "a.example"
    assert s["n_pages"] == 2 and s["n_bytes"] == 6
    assert (s["session_end"] - s["session_start"]).total_seconds() == 100


def test_morton_cellcodes(spark):
    """Column-math Morton ids == Arrow pandas-UDF variant; parent ids are
    prefixes (id >> 2k); round-trip de-interleave sanity."""
    from rayjoin_spark.functions.cellcodes import (
        interleave_bits,
        morton_id,
        morton_id_pandas,
        parent_id,
    )
    from rayjoin_spark.plans.scaling import Scaling
    from rayjoin_spark.sources.datagen import uniform_points

    scaling = Scaling.from_bbox(0.0, 100.0, 0.0, 100.0)
    grid = GridSpec(64)
    pts = uniform_points(spark, 300, 0.0, 100.0, 0.0, 100.0)
    a = morton_id(pts, scaling, grid, level=6).select("point_id", "cell_id")
    b = morton_id_pandas(pts, scaling, grid, level=6).select("point_id", "cell_id")
    ra = {r["point_id"]: r["cell_id"] for r in a.collect()}
    rb = {r["point_id"]: r["cell_id"] for r in b.collect()}
    assert ra == rb
    assert all(0 <= v < (1 << 12) for v in ra.values())
    # parent prefix property
    p = (
        morton_id(pts, scaling, grid, level=6)
        .withColumn("par", parent_id(F.col("cell_id"), 2))
        .collect()
    )
    assert all(r["par"] == r["cell_id"] >> 4 for r in p)
    # interleave round-trip on known values
    row = spark.createDataFrame([(5, 3)], "cx int, cy int").select(
        interleave_bits(F.col("cx"), F.col("cy"), 6).alias("m")
    ).collect()[0]
    # cx=101b -> bits 0,4; cy=011b -> bits 1,3  => 1+2+8+16 = 27
    assert row["m"] == 27


def test_streaming_dedup_pages(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedup: duplicate content is dropped
    ACROSS micro-batches (state carries the fingerprint), whitespace
    variants collapse to one row, distinct texts all survive."""
    import datetime as dt

    from rayjoin_spark.streaming.pages_stream import dedup_pages_stream

    base = dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)

    def row(url, sec, text):
        return (url, base + dt.timedelta(seconds=sec), text)

    batch1 = [
        row("https://a/1", 0, "Hello  world"),
        row("https://a/2", 10, "hello world"),   # ws/case variant of /1
        row("https://b/1", 20, "other text"),
    ]
    batch2 = [
        row("https://c/1", 30, "HELLO   world"),  # dup of batch-1 content
        row("https://c/2", 40, "fresh content"),
    ]
    src = str(tmp_path / "dedup_in")
    schema_str = "url string, warc_ts timestamp, text string"
    spark.createDataFrame(batch1, schema_str).coalesce(1).write.parquet(src)
    spark.createDataFrame(batch2, schema_str).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one file per micro-batch
        .parquet(src)
    )
    q = (
        dedup_pages_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dedup_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM dedup_out").collect()
    finally:
        q.stop()
    texts = sorted(r["text"].lower().split()[0] for r in got)
    # exactly one row per distinct normalized content
    assert len(got) == 3, got
    fps = [r["fingerprint"] for r in got]
    assert len(set(fps)) == 3
    assert sorted(t for t in texts) == ["fresh", "hello", "other"]


def test_tile_pyramid_levels_consistent(spark):
    from pyspark.sql import functions as F

    from rayjoin_spark.operators.tiles import tile_pyramid
    from rayjoin_spark.sources.datagen import uniform_points
    from rayjoin_spark.plans.scaling import GridSpec, Scaling

    sc = Scaling.from_bbox(0.0, 64.0, 0.0, 64.0)
    pts = uniform_points(spark, 500, 0.0, 64.0, 0.0, 64.0, seed=7)
    pyr = tile_pyramid(pts, sc, GridSpec(64), max_zoom=6).cache()
    # level 0 = everything in one tile
    z0 = pyr.filter("zoom = 0").collect()
    assert len(z0) == 1 and z0[0].n_points == 500
    # every level's counts sum to the point count
    sums = {r.zoom: r.s for r in pyr.groupBy("zoom").agg(F.sum("n_points").alias("s")).collect()}
    assert sums == {z: 500 for z in range(7)}
    # each level-z tile count equals the sum of its 4 children at z+1
    child = pyr.filter("zoom = 6").select(
        (F.col("tile_x") / 2).cast("int").alias("px"),
        (F.col("tile_y") / 2).cast("int").alias("py"),
        "n_points",
    ).groupBy("px", "py").agg(F.sum("n_points").alias("n"))
    parent = pyr.filter("zoom = 5")
    j = parent.join(
        child,
        (parent.tile_x == child.px) & (parent.tile_y == child.py),
        "full",
    )
    assert j.filter("n_points IS NULL OR n IS NULL OR n_points != n").count() == 0
    pyr.unpersist()


def test_grouped_index_matches_window_and_survives_skew(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from rayjoin_spark.plans.ranking import grouped_index

    # one mega-group (90%) + many tiny groups — the crawl-skew shape
    df = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit("mega")).otherwise(
            F.concat(F.lit("g"), F.pmod("id", 37).cast("string"))
        ).alias("g"),
        F.concat(F.lit("k"), F.format_string("%06d", F.col("id"))).alias("k"),
    )
    got = grouped_index(df, ["g"], ["k"], "slot")
    w = Window.partitionBy("g").orderBy("k")
    want = df.withColumn("slot", F.row_number().over(w) - 1)
    assert got.select("g", "k", "slot").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("g", "k", "slot")).count() == 0


def test_grouped_index_null_group_key(spark):
    from pyspark.sql import functions as F

    from rayjoin_spark.plans.ranking import grouped_index

    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), ("g", "c"), ("g", "d")],
        "g string, k string",
    )
    got = grouped_index(df, ["g"], ["k"], "slot").collect()
    assert len(got) == 4  # NULL-group rows are a real group, not dropped
    slots = {(r.g, r.k): r.slot for r in got}
    assert slots[(None, "a")] == 0 and slots[(None, "b")] == 1
    assert slots[("g", "c")] == 0 and slots[("g", "d")] == 1


def test_hilbert_cellcodes(spark):
    """Column-math Hilbert ids == NumPy pandas-UDF twin == the certified
    pure-python reference; the curve properties (bijection, unit-step
    adjacency, prefix nesting) hold on the full level-4 grid; the plan
    stays pure JVM (no Python eval in the column version)."""
    from rayjoin_spark.functions.cellcodes import (
        hilbert_from_cells,
        hilbert_id,
        hilbert_id_pandas,
        hilbert_xy2d,
        parent_id,
    )
    from rayjoin_spark.plans.scaling import Scaling
    from rayjoin_spark.sources.datagen import uniform_points

    scaling = Scaling.from_bbox(0.0, 100.0, 0.0, 100.0)
    grid = GridSpec(64)
    pts = uniform_points(spark, 300, 0.0, 100.0, 0.0, 100.0)
    a = hilbert_id(pts, scaling, grid, level=6).select("point_id", "cell_id")
    b = hilbert_id_pandas(pts, scaling, grid, level=6).select("point_id", "cell_id")
    ra = {r["point_id"]: r["cell_id"] for r in a.collect()}
    rb = {r["point_id"]: r["cell_id"] for r in b.collect()}
    assert ra == rb
    assert all(0 <= v < (1 << 12) for v in ra.values())
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # column version is codegen-only

    # column version == reference on an exhaustive level-4 grid (16x16),
    # fed as exact integer cell coordinates
    n = 16
    cells = spark.createDataFrame(
        [(x * n + y, x, y) for x in range(n) for y in range(n)],
        "point_id bigint, cx int, cy int",
    )
    got = {
        r["point_id"]: r["cell_id"]
        for r in hilbert_from_cells(
            cells, F.col("cx"), F.col("cy"), level=4
        ).collect()
    }
    want = {x * n + y: hilbert_xy2d(x, y, 4) for x in range(n) for y in range(n)}
    assert got == want
    # bijection + unit-step adjacency on the spark output itself
    pos = {d: divmod(pid, n) for pid, d in got.items()}
    assert sorted(pos) == list(range(n * n))
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = pos[d - 1], pos[d]
        assert abs(x1 - x0) + abs(y1 - y0) == 1
    # prefix nesting via parent_id
    p = (
        hilbert_from_cells(cells, F.col("cx"), F.col("cy"), level=4)
        .withColumn("par", parent_id(F.col("cell_id"), 1))
        .collect()
    )
    for r in p:
        x, y = divmod(r["point_id"], n)
        assert r["par"] == hilbert_xy2d(x >> 1, y >> 1, 3)


def test_adaptive_cells_invariants(spark):
    """Quadtree leaf assignment: exactly one leaf per point, every
    non-forced leaf holds <= cap, leaves partition the input (occupancy
    sums to n), and the result matches a brute-force python quadtree."""
    from rayjoin_spark.functions.cellcodes import adaptive_cells, morton_id
    from rayjoin_spark.plans.scaling import Scaling
    from rayjoin_spark.sources.datagen import uniform_points

    scaling = Scaling.from_bbox(0.0, 100.0, 0.0, 100.0)
    grid = GridSpec(64)
    cap, max_level = 16, 6
    # clustered + uniform mix so splitting actually varies by region
    uni = uniform_points(spark, 400, 0.0, 100.0, 0.0, 100.0)
    clus = uniform_points(spark, 400, 10.0, 12.0, 10.0, 12.0).withColumn(
        "point_id", F.col("point_id") + 10_000
    )
    pts = uni.unionByName(clus)
    got = adaptive_cells(
        pts, scaling, grid, cap=cap, max_level=max_level
    ).collect()
    assert len(got) == 800  # one leaf per point
    # leaf occupancy: non-forced leaves respect the cap
    for r in got:
        if r["level"] < max_level:
            assert r["n_in_cell"] <= cap
    # occupancy sums to the input size over distinct leaves
    leaf_n = {(r["level"], r["cell_id"]): r["n_in_cell"] for r in got}
    assert sum(leaf_n.values()) == 800
    # clustered points sit in deeper leaves than the uniform background
    import statistics

    deep = statistics.mean(r["level"] for r in got if r["point_id"] >= 10_000)
    shallow = statistics.mean(r["level"] for r in got if r["point_id"] < 10_000)
    assert deep > shallow

    # brute-force python quadtree over the same morton ids agrees exactly
    ms = {
        r["point_id"]: r["cell_id"]
        for r in morton_id(pts, scaling, grid, level=max_level, out="m").select(
            "point_id", F.col("m").alias("cell_id")
        ).collect()
    }

    def leaf_of(m):
        for lvl in range(0, max_level + 1):
            pref = m >> ((max_level - lvl) * 2)
            n = sum(1 for v in ms.values() if v >> ((max_level - lvl) * 2) == pref)
            if n <= cap or lvl == max_level:
                return (lvl, pref, n)
        raise AssertionError

    want = {pid: leaf_of(m) for pid, m in ms.items()}
    got_map = {r["point_id"]: (r["level"], r["cell_id"], r["n_in_cell"]) for r in got}
    assert got_map == want


def test_geohash_canonical(spark):
    """geohash_bits/geohash_str reproduce the public geohash: a textbook
    range-bisection encoder (validated against the classic Wikipedia
    example) agrees character-for-character when fed the same cells;
    prefixes are lower-precision hashes; hand-packed bit case pins the
    alphabet and bit order."""
    from rayjoin_spark.functions.cellcodes import (
        GEOHASH32,
        geohash_bits,
        geohash_str,
    )

    def classic(lat, lon, p):
        lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
        bits, even = [], True
        while len(bits) < 5 * p:
            iv = lon_i if even else lat_i
            mid = (iv[0] + iv[1]) / 2
            v = lon if even else lat
            if v > mid:
                bits.append(1)
                iv[0] = mid
            else:
                bits.append(0)
                iv[1] = mid
            even = not even
        return "".join(
            GEOHASH32[int("".join(map(str, bits[i:i + 5])), 2)]
            for i in range(0, 5 * p, 5)
        )

    # the classic example pins the test's own encoder
    assert classic(57.64911, 10.40744, 11) == "u4pruydqqvj"

    level, p = 13, 5
    cases = [
        (57.64911, 10.40744),
        (0.1, 0.1),
        (-33.87, 151.21),
        (40.71, -74.01),
        (-0.02, -0.03),
    ]
    rows = [
        (
            i,
            int((lon + 180.0) / 360.0 * (1 << level)),
            int((lat + 90.0) / 180.0 * (1 << level)),
        )
        for i, (lat, lon) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i int, cx bigint, cy bigint")
    got = {
        r["i"]: r["gh"]
        for r in df.select(
            "i",
            geohash_str(
                geohash_bits(F.col("cx"), F.col("cy"), level, p), p
            ).alias("gh"),
        ).collect()
    }
    for i, (lat, lon) in enumerate(cases):
        assert got[i] == classic(lat, lon, p), (i, got[i], classic(lat, lon, p))

    # prefix property: precision-2 hash is the first 2 chars
    got2 = {
        r["i"]: r["gh"]
        for r in df.select(
            "i",
            geohash_str(
                geohash_bits(F.col("cx"), F.col("cy"), level, 2), 2
            ).alias("gh"),
        ).collect()
    }
    for i in got:
        assert got[i][:2] == got2[i]

    # hand-packed case: cx=0b10101, cy=0b01010 at level 5, p=2 -> "m6"
    one = spark.createDataFrame([(0b10101, 0b01010)], "cx bigint, cy bigint")
    r = one.select(
        geohash_str(geohash_bits(F.col("cx"), F.col("cy"), 5, 2), 2).alias("gh")
    ).collect()[0]
    assert r["gh"] == "m6"


def test_quadkey_canonical(spark):
    """The documented Bing example: tile (x=3, y=5) at level 3 has
    quadkey '213'; prefixes are parent quadkeys."""
    from rayjoin_spark.functions.cellcodes import interleave_bits, quadkey_str

    df = spark.createDataFrame([(3, 5)], "cx int, cy int")
    m = interleave_bits(F.col("cx"), F.col("cy"), 3)
    r = df.select(
        quadkey_str(m, 3).alias("qk"), quadkey_str(m, 3, 2).alias("qk2")
    ).collect()[0]
    assert r["qk"] == "213"
    assert r["qk2"] == "21"  # truncation = parent tile


def test_quadkey_out_len_validation(spark):
    import pytest as _pytest

    from rayjoin_spark.functions.cellcodes import quadkey_str

    with _pytest.raises(ValueError):
        quadkey_str(F.lit(0), level=3, out_len=5)
    with _pytest.raises(ValueError):
        quadkey_str(F.lit(0), level=3, out_len=0)


def test_web_mercator_tiles_known_points(spark):
    # known anchors: (0,0) -> center tile; lon 180 clamps to max tile;
    # lat > mercator band clamps to ty 0 (north edge)
    from rayjoin_spark.functions.cellcodes import web_mercator_tiles

    z = 4  # 16 tiles per axis
    rows = [
        (1, 0, 0),                      # equator/prime meridian -> (8, 8)
        (2, 180_000_000, 0),            # lon 180 -> clamp tx 15
        (3, -180_000_000, 0),           # lon -180 -> tx 0
        (4, 0, 89_000_000),             # above band -> ty 0
        (5, 0, -89_000_000),            # below band -> ty 15
        (6, -1, 0),                     # just west of meridian -> tx 7
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lon_udeg bigint, lat_udeg bigint")
    out = {r["doc_id"]: (r["tx"], r["ty"]) for r in web_mercator_tiles(df, zoom=z).collect()}
    assert out[1] == (8, 8)
    assert out[2][0] == 15 and out[3][0] == 0
    assert out[4][1] == 0 and out[5][1] == 15
    assert out[6][0] == 7
    import pytest as _pytest

    with _pytest.raises(ValueError):
        web_mercator_tiles(df, zoom=23)


def test_tile_bounds_roundtrip_containment(spark):
    # every point's tile bbox must contain the point: lon in [w, e);
    # lat within [south, north] up to the 1 microdegree quantization.
    # zooms 10/11 are the review-found hazard: 2^z stops dividing 360e6
    # past zoom 9, so the east edge must be the CEIL of the rational
    # edge or boundary points land exactly on lon_e
    from rayjoin_spark.functions.cellcodes import tile_bounds, web_mercator_tiles

    rows = [(i, (i * 7919) % 360_000_001 - 180_000_000,
             (i * 104729) % 170_000_001 - 85_000_000) for i in range(200)]
    # adversarial: exact rational-edge boundary points at zoom 10
    rows += [(1000 + k, (k * 360_000_000 * 3) // 1024 - 180_000_000 + dd, 0)
             for k in range(1, 40) for dd in (-1, 0, 1)]
    df = spark.createDataFrame(rows, "doc_id bigint, lon_udeg bigint, lat_udeg bigint")
    for z in (9, 10, 11):
        t = web_mercator_tiles(df, zoom=z)
        b = tile_bounds(t, zoom=z)
        bad = b.filter(
            ~((F.col("lon_udeg") >= F.col("lon_w_udeg"))
              & (F.col("lon_udeg") < F.col("lon_e_udeg")))
        ).count()
        assert bad == 0, f"zoom {z}: {bad} points outside [w, e)"
        badlat = b.filter(
            ~((F.col("lat_udeg") <= F.col("lat_n_udeg") + 1)
              & (F.col("lat_udeg") >= F.col("lat_s_udeg") - 1))
        ).count()
        assert badlat == 0, f"zoom {z}"


def test_streaming_burst_parity(spark, tmp_path):
    """stream_burst_detect finalizes buckets as the watermark passes and
    matches the batch burst_detect verdicts for every closed bucket."""
    import datetime as dt

    from rayjoin_spark.functions.eventops import burst_detect
    from rayjoin_spark.streaming.pages_stream import stream_burst_detect

    base = dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)

    def rows_for(counts, start_hour):
        out = []
        for h, n in enumerate(counts, start=start_hour):
            for i in range(n):
                out.append((base + dt.timedelta(hours=h, seconds=i), "A"))
        return out

    src = tmp_path / "burst_in"
    src.mkdir()
    schema = "ts timestamp, event_type string"
    # file 1: hours 0-3 counts 1,1,1,9; file 2: hours 4-9 advance the
    # watermark (2h) far enough to close hour 3 and beyond
    spark.createDataFrame(rows_for([1, 1, 1, 9], 0), schema).coalesce(1)\
        .write.parquet(str(src / "f1"))
    spark.createDataFrame(rows_for([1, 1, 1, 1, 1, 1], 4), schema).coalesce(1)\
        .write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_burst_detect(stream, window=6, factor=3, min_history=3)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("burst_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["bucket"]: r for r in spark.sql("SELECT * FROM burst_out").collect()}
    finally:
        q.stop()
    assert got, "no buckets finalized"
    # batch twin over the SAME events
    all_rows = rows_for([1, 1, 1, 9], 0) + rows_for([1, 1, 1, 1, 1, 1], 4)
    batch = {
        r["bucket"]: r
        for r in burst_detect(
            spark.createDataFrame(
                [(i, t, e) for i, (t, e) in enumerate(all_rows)],
                "event_id long, ts timestamp, event_type string",
            ),
            window=6, factor=3, min_history=3,
        ).collect()
    }
    for b, r in got.items():
        w = batch[b]
        assert (
            r["n_events"], r["prev_sum"], r["trailing"], r["burst"]
        ) == (w["n_events"], w["prev_sum"], w["trailing"], w["burst"]), b
    # the 9-count hour must have closed and burst
    spike = base + dt.timedelta(hours=3)
    spike_bucket = int(spike.timestamp() * 1_000_000) // 3_600_000_000
    assert got[spike_bucket]["burst"]
