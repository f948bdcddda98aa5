"""Unit tests for triangle_count / link_jaccard (operators/graph.py) and
moran_i (operators/tiles.py) on handcrafted graphs/rasters with known
exact answers — the entry-oracle mirror covers the derived-host-graph
shapes; these pin the edge cases (direction/multiplicity collapse,
self-loops, hub orientation, fanout filter, checkerboard sign)."""




from rayjoin_spark.operators.graph import link_jaccard, triangle_count
from rayjoin_spark.operators.tiles import moran_i


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_triangle_count_basic(spark):
    # K4 minus one edge on {a,b,c,d}: triangles abc and abd share edge ab.
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d")],
    )
    got = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_triangle_count_collapses_direction_multiplicity_loops(spark):
    # Same triangle stated 3x with reversed duplicates + a self-loop:
    # the undirected simple graph is ONE triangle.
    e = _edges(
        spark,
        [
            ("a", "b"), ("b", "a"), ("a", "b"),
            ("b", "c"), ("c", "b"),
            ("c", "a"),
            ("a", "a"),
        ],
    )
    got = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_count_hub_star_has_none(spark):
    # A star has no triangles; hub must still be emitted zero-filled.
    e = _edges(spark, [("hub", f"x{i}") for i in range(10)])
    got = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got["hub"] == 0 and all(v == 0 for v in got.values())
    assert len(got) == 11


def test_link_jaccard_exact_and_threshold(spark):
    # a -> {1,2,3}; b -> {2,3,4}; c -> {9}. J(a,b) = 2/4 >= 1/3; c pairs
    # with nobody (no shared neighbor).
    e = _edges(
        spark,
        [("a", "1"), ("a", "2"), ("a", "3"),
         ("b", "2"), ("b", "3"), ("b", "4"), ("c", "9")],
    )
    rows = link_jaccard(e, sim_num=1, sim_den=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["node_a"], r["node_b"], r["shared"], r["union_cnt"]) == ("a", "b", 2, 4)
    # tighter threshold 2/3 drops the pair
    assert link_jaccard(e, sim_num=2, sim_den=3).count() == 0


def test_link_jaccard_max_fanout_filters_universe(spark):
    # hub neighbor 'h' cited by all three sources; with max_fanout=2 the
    # hub leaves candidates AND degrees (a,b still tie via '2').
    e = _edges(
        spark,
        [("a", "h"), ("b", "h"), ("c", "h"), ("a", "2"), ("b", "2")],
    )
    rows = link_jaccard(e, sim_num=1, sim_den=1, max_fanout=2).collect()
    assert [(r["node_a"], r["node_b"], r["shared"], r["union_cnt"]) for r in rows] == [
        ("a", "b", 1, 1)
    ]
    # without the filter, J(a,b) = 2/2 = 1 but also (a,c) and (b,c) via h
    assert link_jaccard(e, sim_num=1, sim_den=2).count() == 3


def _raster(spark, rows):
    return spark.createDataFrame(rows, "tile_x long, tile_y long, n_points long")


def test_moran_checkerboard_negative(spark):
    # 2x2 checkerboard counts 1/3 alternating: every rook pair is (1,3),
    # s_i in {-4, +4}, each directed pair contributes -16, w_sum = 8.
    t = _raster(
        spark,
        [(0, 0, 1), (1, 0, 3), (0, 1, 3), (1, 1, 1)],
    )
    r = moran_i(t).collect()[0]
    assert r["n_tiles"] == 4 and r["w_sum"] == 8
    assert int(r["moran_num"]) == -128 and int(r["moran_den"]) == 64
    # I = N*num/(W*den) = 4*-128/(8*64) = -1 (perfect dispersion)


def test_moran_uniform_is_zero_num(spark):
    t = _raster(spark, [(x, y, 7) for x in range(3) for y in range(3)])
    r = moran_i(t).collect()[0]
    assert int(r["moran_num"]) == 0 and int(r["moran_den"]) == 0
    assert r["w_sum"] == 24  # 12 undirected rook pairs, directed


def test_moran_isolated_tiles_no_pairs(spark):
    # tiles far apart: w_sum = 0, num null-sum -> emitted as NULL;
    # caller treats no-neighbor rasters as undefined I.
    t = _raster(spark, [(0, 0, 1), (10, 10, 5)])
    r = moran_i(t).collect()[0]
    assert r["w_sum"] == 0 and r["moran_num"] is None
    assert int(r["moran_den"]) == 32  # s = {-4, +4} scaled by N=2


def test_reciprocity_counts(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")],
    )
    r = __import__("rayjoin_spark.operators.graph", fromlist=["x"]).reciprocity(e).collect()[0]
    # distinct non-loop edges: ab, ba, ac -> ab & ba reciprocal
    assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)


def test_assortativity_star_disassortative(spark):
    from rayjoin_spark.operators.graph import degree_assortativity

    e = _edges(spark, [("hub", f"x{i}") for i in range(4)])
    r = degree_assortativity(e).collect()[0]
    # star K1,4: m = 8 directed pairs, degrees hub=4 leaves=1
    # s_j = 4*(4+1) + ... each directed pair contributes j=deg(u):
    # pairs (hub->leaf) x4: j=4; (leaf->hub) x4: j=1 -> s_j = 20
    assert r["m"] == 8 and int(r["s_j"]) == 20
    assert int(r["s_jk"]) == 32  # 8 pairs each j*k = 4
    assert int(r["s_j2"]) == 68  # 4*16 + 4*1
    # r_pearson = (8*32 - 400)/(8*68 - 400) = -144/144 = -1 (perfectly
    # disassortative, as a star must be)


def test_interval_merge_touch_overlap_gap(spark):
    from rayjoin_spark.functions.eventops import interval_merge

    iv = spark.createDataFrame(
        [
            (1, 0, 5), (1, 5, 9),     # touching -> merge (half-open)
            (1, 20, 30), (1, 25, 27),  # contained -> merge
            (1, 40, 41),               # isolated
            (2, 0, 10), (2, 3, 4), (2, 50, 60),
            (3, 7, 7),                 # degenerate -> dropped
        ],
        "user_id long, lo long, hi long",
    )
    got = {(r["user_id"], r["span_id"]): (r["lo"], r["hi"], r["n_merged"])
           for r in interval_merge(iv).collect()}
    assert got == {
        (1, 1): (0, 9, 2),
        (1, 2): (20, 30, 2),
        (1, 3): (40, 41, 1),
        (2, 1): (0, 10, 2),
        (2, 2): (50, 60, 1),
    }


def test_local_moran_quadrants(spark):
    from rayjoin_spark.operators.tiles import local_moran

    # 2x2 checkerboard (see test_moran_checkerboard): every tile's rook
    # neighbors are the opposite value -> all four are spatial outliers
    # (local_num < 0); w_i = 2 at each corner.
    t = _raster(spark, [(0, 0, 1), (1, 0, 3), (0, 1, 3), (1, 1, 1)])
    rows = local_moran(t).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["w_i"] == 2
        assert int(r["local_num"]) == -32  # s * (s_n1 + s_n2) = ±4 * ∓8


def test_local_moran_isolated_tile(spark):
    from rayjoin_spark.operators.tiles import local_moran

    t = _raster(spark, [(0, 0, 1), (10, 10, 5)])
    got = {(r["tile_x"], r["tile_y"]): r for r in local_moran(t).collect()}
    assert all(r["w_i"] == 0 and int(r["local_num"]) == 0 for r in got.values())


def test_burst_detect_flags_spike_only(spark):
    from rayjoin_spark.functions.eventops import burst_detect

    # type A: hourly counts 1,1,1,9 -> last bucket bursts (9*3 >= 3*3);
    # a second type with too little history never fires.
    rows = []
    for h, n in [(0, 1), (1, 1), (2, 1), (3, 9)]:
        rows += [(len(rows) + i, f"2024-01-01 0{h}:00:{i:02d}", "A") for i in range(n)]
    rows += [(900, "2024-01-01 00:00:00", "B"), (901, "2024-01-01 01:00:00", "B")]
    e = spark.createDataFrame(rows, "event_id long, ts string, event_type string")
    got = {(r["event_type"], r["bucket"] - min(
        x["bucket"] for x in burst_detect(e).collect() if x["event_type"] == r["event_type"]
    )): r for r in burst_detect(e).collect()}
    a3 = got[("A", 3)]
    assert a3["n_events"] == 9 and a3["prev_sum"] == 3 and a3["trailing"] == 3
    assert a3["burst"]
    assert not any(r["burst"] for k, r in got.items() if k != ("A", 3))


def _py_kcore(pairs, k):
    """Independent sequential peel for the oracle."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for n in list(alive):
            if len(adj[n] & alive) < k:
                alive.discard(n)
                changed = True
    return {n: (n in alive) for n in adj}


def test_kcore_matches_sequential_peel(spark):
    from rayjoin_spark.operators.graph import kcore

    # K4 + a tail path + a triangle hanging off: 3-core = the K4 only
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"), ("f", "g"),
        ("g", "h"), ("h", "i"), ("i", "g"),
    ]
    e = _edges(spark, pairs)
    for k in (1, 2, 3, 4):
        got = {r["node"]: r["in_core"] for r in kcore(e, k=k).collect()}
        assert got == _py_kcore(pairs, k), k


def test_kcore_cascade_peel(spark):
    from rayjoin_spark.operators.graph import kcore

    # a chain: 2-core empty (peeling cascades from both ends)
    pairs = [(f"n{i}", f"n{i+1}") for i in range(6)]
    got = {r["node"]: r["in_core"] for r in kcore(_edges(spark, pairs), k=2).collect()}
    assert got == _py_kcore(pairs, 2)
    assert not any(got.values())


def test_kcore_self_loop_only_node_reports_false(spark):
    from rayjoin_spark.operators.graph import kcore, scc

    # z's only incident edge is a self-loop: it must appear in the output
    # with in_core=false (raw-edge universe, matching scc), not vanish
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("z", "z")]
    e = _edges(spark, pairs)
    got = {r["node"]: r["in_core"] for r in kcore(e, k=2).collect()}
    assert got == {"a": True, "b": True, "c": True, "z": False}
    # same universe as scc
    assert set(got) == {r["node"] for r in scc(e).collect()}


def test_burst_detect_drops_null_ts(spark):
    from rayjoin_spark.functions.eventops import burst_detect

    rows = [(1, "2024-01-01 00:00:00", "A"), (2, "2024-01-01 01:00:00", "A"),
            (3, None, "A")]
    e = spark.createDataFrame(rows, "event_id long, ts string, event_type string")
    out = burst_detect(e).collect()
    # the null-ts event contributes no bucket row and no count
    assert len(out) == 2 and all(r["n_events"] == 1 for r in out)
    assert all(r["bucket"] is not None for r in out)
