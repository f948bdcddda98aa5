"""convex_hull: two-level distributed hull == single-pass exact hull."""

import random

from rayjoin_spark.operators.hull import _chain, convex_hull


def _run(spark, rows, nparts=7):
    df = spark.createDataFrame(
        rows, "group_id bigint, x bigint, y bigint"
    ).repartition(nparts)  # force stage-1 partial hulls across partitions
    out = convex_hull(df).collect()
    got = {}
    for r in out:
        got.setdefault(r.group_id, set()).add((r.x, r.y))
    return got


def test_hull_matches_single_pass_and_handles_degenerates(spark):
    rnd = random.Random(5)
    rows = []
    want = {}
    groups = {
        0: [(rnd.randrange(-1000, 1000), rnd.randrange(-1000, 1000)) for _ in range(200)],
        # all-collinear group: hull = the two endpoints
        1: [(i * 3, i * 6) for i in range(30)],
        # duplicates + interior points
        2: [(0, 0), (0, 0), (10, 0), (0, 10), (10, 10), (5, 5), (5, 5)],
        # single point and a pair
        3: [(7, 7)],
        4: [(1, 2), (3, 4)],
        # square with collinear mid-edge points (must be dropped)
        5: [(0, 0), (10, 0), (20, 0), (20, 10), (20, 20), (10, 20), (0, 20), (0, 10)],
    }
    for gid, pts in groups.items():
        rows += [(gid, x, y) for x, y in pts]
        want[gid] = set(_chain([p[0] for p in pts], [p[1] for p in pts]))
    got = _run(spark, rows)
    assert got == want
    assert got[1] == {(0, 0), (29 * 3, 29 * 6)}
    assert got[2] == {(0, 0), (10, 0), (0, 10), (10, 10)}
    assert got[5] == {(0, 0), (20, 0), (20, 20), (0, 20)}


def test_hull_extreme_point_semantics(spark):
    # returned set == extreme points: each kept p stays a hull vertex
    # when re-hulled with the rest; each dropped p is NOT a hull vertex
    # of (rest + p), i.e. it lies in the convex hull of the others
    rnd = random.Random(9)
    pts = [(rnd.randrange(-50, 50), rnd.randrange(-50, 50)) for _ in range(60)]
    got = _run(spark, [(0, x, y) for x, y in pts])[0]
    distinct = set(pts)
    full = set(_chain([p[0] for p in pts], [p[1] for p in pts]))
    assert got == full
    for p in distinct:
        rest = [q for q in distinct if q != p] + [p]
        is_vertex = p in set(_chain([q[0] for q in rest], [q[1] for q in rest]))
        assert is_vertex == (p in got)


def test_group_diameter(spark):
    from rayjoin_spark.operators.hull import group_diameter

    rnd = random.Random(3)
    groups = {
        0: [(rnd.randrange(-900, 900), rnd.randrange(-900, 900)) for _ in range(120)],
        1: [(i, 2 * i) for i in range(25)],        # collinear
        2: [(5, -5)],                              # singleton
        3: [(0, 0), (0, 0), (3, 4)],               # duplicates
        4: [(0, 0), (10, 0), (0, 10), (10, 10)],   # square: tie on diagonals
    }
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "group_id bigint, x bigint, y bigint").repartition(5)
    got = {r.group_id: (r.x1, r.y1, r.x2, r.y2, r.dist2)
           for r in group_diameter(df).collect()}
    for gid, pts in groups.items():
        dpts = sorted(set(pts))
        best = None
        for i, p in enumerate(dpts):
            for q in dpts[i:]:
                d2 = (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
                key = (-d2, p, q)
                if best is None or key < best:
                    best = key
        want = (best[1][0], best[1][1], best[2][0], best[2][1], -best[0])
        assert got[gid] == want, (gid, got[gid], want)
    # square: equal diagonals -> lexicographically smallest pair wins
    assert got[4] == (0, 0, 10, 10, 200)


def test_skyline_matches_bruteforce(spark):
    from rayjoin_spark.operators.skyline import skyline

    rnd = random.Random(17)
    pts = [(rnd.randrange(0, 200), rnd.randrange(0, 200)) for _ in range(300)]
    pts += [(5, 5), (5, 5), (0, 199), (199, 0)]  # dupes + axis extremes
    df = spark.createDataFrame(pts, "x bigint, y bigint").repartition(6)
    got = {(r.x, r.y) for r in skyline(df).collect()}
    dpts = set(pts)
    want = {
        p for p in dpts
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in dpts
        )
    }
    assert got == want
