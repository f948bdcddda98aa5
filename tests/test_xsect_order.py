"""Adversarial fixture: two intersections on one edge within double
epsilon must still order EXACTLY along the edge.

The round-3 engine ordered xsects along an edge by a double dot product
`t` with (xd, yd, other_eid) tiebreaks; two distinct rational points
closer than double resolution collapsed to the same (t, xd, yd) and fell
through to the other-edge-id tiebreak — which this fixture rigs to be the
WRONG order. The exact limb key (floor(t_num/den * 2^118) as three int64
limbs, operators/overlay.py) must order them correctly regardless.
Reference parity: src/app/map_overlay_grid.h:152-161 compares exact
rational squared distances for the same reason.
"""

from fractions import Fraction

from pyspark.sql import Row

from rayjoin_spark.operators.lsi import lsi_join
from rayjoin_spark.operators.overlay import _xsects_along_edges
from rayjoin_spark.plans.scaling import GridSpec

from tests.oracle import intersect_test_py, xsect_point_py


def _edge(eid, x1, y1, x2, y2, chain_id=0, seq=0):
    """Build one snapped-integer edge row exactly as plans/layers.build_edges
    does (b >= 0 normalization, c = -x1*a - y1*b)."""
    a, b = y1 - y2, x2 - x1
    if b < 0:
        a, b = -a, -b
    c = -x1 * a - y1 * b
    assert not (a == 0 and b == 0)
    return dict(
        eid=eid, chain_id=chain_id, seq=seq, x1=x1, y1=y1, x2=x2, y2=y2,
        a=a, b=b, c=c, left_polygon_id=1, right_polygon_id=2,
    )


def _find_adversarial_pair():
    """Deterministic search: a long base edge e plus two near-vertical
    crossers whose intersection parameters differ by ~2^-28 — below the
    double ulp at the crossing coordinate's magnitude — verified to
    COLLIDE in the old double sort key."""
    L = 1 << 27
    e = _edge(1, 0, 0, L, 1)
    for xbase in range(1 << 26, (1 << 26) + 64):
        h = 1 << 26
        # crossing params ~ xbase + 1/2 and xbase + 1/2 + 2^-28
        o1 = _edge(20, xbase, -h, xbase + 1, h, chain_id=1)
        o2 = _edge(10, xbase, -(h + 1), xbase + 1, h, chain_id=2)
        if not (intersect_test_py(e, o1) and intersect_test_py(e, o2)):
            continue
        p1, p2 = xsect_point_py(e, o1), xsect_point_py(e, o2)
        t1 = (p1[0] - e["x1"]) * (e["x2"] - e["x1"]) + (p1[1] - e["y1"]) * (e["y2"] - e["y1"])
        t2 = (p2[0] - e["x1"]) * (e["x2"] - e["x1"]) + (p2[1] - e["y1"]) * (e["y2"] - e["y1"])
        if t1 == t2:
            continue
        # old key: doubles of (t, xd, yd) — require a full collision so the
        # double path would decide by other_eid (rigged wrong: the exact
        # later point o2 has the SMALLER eid 10)
        def dbl(p, t):
            xd = p[0].numerator / p[0].denominator
            yd = p[1].numerator / p[1].denominator
            td = (xd - e["x1"]) * (e["x2"] - e["x1"]) + (yd - e["y1"]) * (e["y2"] - e["y1"])
            return (td, xd, yd)

        if dbl(p1, t1) == dbl(p2, t2):
            exact_first = 20 if t1 < t2 else 10
            assert exact_first == 20, "fixture intent: o1 (eid 20) crosses first"
            return e, o1, o2
    raise AssertionError("no adversarial pair found in search window")


def test_exact_xsect_order_beats_double_collision(spark):
    e, o1, o2 = _find_adversarial_pair()
    ea = spark.createDataFrame([Row(**e)])
    eb = spark.createDataFrame([Row(**o1), Row(**o2)])
    xs = lsi_join(ea, eb, GridSpec(64), with_points=True)
    ordered = (
        _xsects_along_edges(xs, ea, "a")
        .orderBy("xidx")
        .select("other_eid", "xidx")
        .collect()
    )
    assert [r["other_eid"] for r in ordered] == [20, 10]
    assert [r["xidx"] for r in ordered] == [0, 1]


def test_exact_order_matches_fraction_oracle_generic(spark):
    """Many crossers over one edge: engine xidx == Fraction-sorted order."""
    L = 1 << 27
    e = _edge(1, 0, 0, L, 1)
    crossers, want = [], []
    for k in range(2, 40):
        o = _edge(100 + k, k * (L // 64) + (k * k) % 97, -(1 << 20) - k * 13,
                  k * (L // 64) + (k * k) % 97 + 2, (1 << 20) + k * 7,
                  chain_id=k)
        if intersect_test_py(e, o):
            crossers.append(o)
            p = xsect_point_py(e, o)
            t = (p[0] - e["x1"]) * (e["x2"] - e["x1"]) + (p[1] - e["y1"]) * (e["y2"] - e["y1"])
            want.append((t, o["eid"]))
    assert len(crossers) > 20
    want_order = [eid for _, eid in sorted(want)]
    ea = spark.createDataFrame([Row(**e)])
    eb = spark.createDataFrame([Row(**o) for o in crossers])
    xs = lsi_join(ea, eb, GridSpec(256), with_points=True)
    got = (
        _xsects_along_edges(xs, ea, "a").orderBy("xidx").select("other_eid").collect()
    )
    assert [r["other_eid"] for r in got] == want_order
