"""face_within geometric sanity: nested / crossing / disjoint squares."""

from pyspark.sql import functions as F

from rayjoin_spark.operators.faces import face_within
from rayjoin_spark.plans.scaling import GridSpec


def _square(eid0, f, x0, y0, s):
    """CCW square with interior face f (interior on the LEFT of each
    directed edge), exterior 0; snapped-int coords; returns edge rows
    (eid, x1, y1, x2, y2, a, b, c, left, right)."""
    cs = [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]
    rows = []
    for i in range(4):
        x1, y1 = cs[i]
        x2, y2 = cs[(i + 1) % 4]
        a0, b0 = y1 - y2, x2 - x1
        if b0 < 0:
            a0, b0 = -a0, -b0
        c = -x1 * a0 - y1 * b0
        rows.append((eid0 + i, x1, y1, x2, y2, a0, b0, c, f, 0))
    return rows


def _edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "eid long, x1 long, y1 long, x2 long, y2 long, a long, b long, "
        "c long, left_polygon_id long, right_polygon_id long",
    )


def test_face_within_nested_crossing_disjoint(spark):
    # layer A: big square face 1 at [0,100]^2; far square face 9
    ea = _edges(spark, _square(0, 1, 0, 0, 100) + _square(10, 9, 5000, 5000, 100))
    # layer B: nested square face 2 inside face 1; crossing square face 3
    # straddling A's right boundary; disjoint square face 4 outside all
    eb = _edges(
        spark,
        _square(100, 2, 20, 20, 30)
        + _square(200, 3, 80, 40, 40)
        + _square(300, 4, 900, 900, 50),
    )
    got = {(r.face_b, r.face_a) for r in face_within(ea, eb, GridSpec(16)).collect()}
    assert got == {(2, 1)}, got


def test_face_within_exterior_face_never_contained(spark):
    # nested-only pair with NO boundary crossings anywhere: B's exterior
    # face 0 must not be reported (regression: its rep vertex — the
    # global lex-min B vertex — always locates inside some A face)
    ea = _edges(spark, _square(0, 1, 0, 0, 100))
    eb = _edges(spark, _square(100, 2, 20, 20, 30))
    got = {(r.face_b, r.face_a) for r in face_within(ea, eb, GridSpec(16)).collect()}
    assert got == {(2, 1)}, got
