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
