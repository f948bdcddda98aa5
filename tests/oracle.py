"""Pure-Python/NumPy exact oracle for LSI and PIP.

Independent re-implementation of the reference's predicates
(reference src/algo/lsi.h:27-103, src/algo/pip.h:12-115) in arbitrary-
precision Python ints / exact Fractions, used as ground truth for the
Spark engine. Brute force O(nA*nB) — test scale only.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np


def scale_points_py(xs, ys, scaling):
    """Snap doubles to the int grid exactly as the engine does (same double
    ops in the same order, truncation toward zero)."""
    xi = (np.asarray(xs, dtype=np.float64) * scaling.rx + scaling.dx).astype(np.int64)
    yi = (np.asarray(ys, dtype=np.float64) * scaling.ry + scaling.dy).astype(np.int64)
    return xi, yi


def build_edges_py(chains, points, scaling, eid_stride=1 << 20):
    """chains: dict chain_id -> (left_pid, right_pid); points: list of
    (chain_id, seq, x, y). Returns list of edge dicts (chain order)."""
    pts = sorted(points, key=lambda r: (r[0], r[1]))
    xi, yi = scale_points_py([p[2] for p in pts], [p[3] for p in pts], scaling)
    edges = []
    for k in range(len(pts) - 1):
        cid, seq = pts[k][0], pts[k][1]
        cid2, seq2 = pts[k + 1][0], pts[k + 1][1]
        if cid != cid2 or seq2 != seq + 1:
            continue
        x1, y1, x2, y2 = int(xi[k]), int(yi[k]), int(xi[k + 1]), int(yi[k + 1])
        a = y1 - y2
        b = x2 - x1
        c = -x1 * a - y1 * b
        if b < 0:
            a, b, c = -a, -b, -c
        if a == 0 and b == 0:
            continue
        left, right = chains[cid]
        edges.append(
            dict(
                eid=cid * eid_stride + seq,
                x1=x1,
                y1=y1,
                x2=x2,
                y2=y2,
                a=a,
                b=b,
                c=c,
                left=left,
                right=right,
            )
        )
    return edges


def _sos_sign(v: int, ea: int, eb: int, flip: bool) -> int:
    if v != 0:
        return v
    v = -ea if flip else ea
    if v != 0:
        return v
    return -eb if flip else eb


def intersect_test_py(e1, e2) -> bool:
    """Exact SoS intersection predicate; e1 from map0, e2 from map1."""
    sub = lambda px, py, e: px * e["a"] + py * e["b"] + e["c"]  # noqa: E731
    s_a1 = _sos_sign(sub(e1["x1"], e1["y1"], e2), e2["a"], e2["b"], flip=True)
    s_a2 = _sos_sign(sub(e1["x2"], e1["y2"], e2), e2["a"], e2["b"], flip=True)
    if s_a1 == 0 or s_a2 == 0:
        return False
    if (s_a1 > 0) == (s_a2 > 0):
        return False
    s_b1 = _sos_sign(sub(e2["x1"], e2["y1"], e1), e1["a"], e1["b"], flip=False)
    s_b2 = _sos_sign(sub(e2["x2"], e2["y2"], e1), e1["a"], e1["b"], flip=False)
    if s_b1 == 0 or s_b2 == 0:
        return False
    if (s_b1 > 0) == (s_b2 > 0):
        return False
    p1a, p2a = (e1["x1"], e1["y1"]), (e1["x2"], e1["y2"])
    p1b, p2b = (e2["x1"], e2["y1"]), (e2["x2"], e2["y2"])
    if (p1a == p1b and p2a == p2b) or (p1a == p2b and p2a == p1b):
        return False
    return True


def lsi_oracle(edges_a, edges_b):
    """All intersecting (eid_a, eid_b) pairs, brute force."""
    out = set()
    for e1 in edges_a:
        for e2 in edges_b:
            if intersect_test_py(e1, e2):
                out.add((e1["eid"], e2["eid"]))
    return out


def xsect_point_py(e1, e2):
    """Exact rational intersection point with bbox clamp
    (reference src/algo/lsi.h:116-141)."""
    den = e1["a"] * e2["b"] - e2["a"] * e1["b"]
    numx = e2["c"] * e1["b"] - e1["c"] * e2["b"]
    numy = e2["a"] * e1["c"] - e1["a"] * e2["c"]
    x = Fraction(numx, den)
    y = Fraction(numy, den)
    lo_x = min(e1["x1"], e1["x2"], e2["x1"], e2["x2"])
    hi_x = max(e1["x1"], e1["x2"], e2["x1"], e2["x2"])
    lo_y = min(e1["y1"], e1["y2"], e2["y1"], e2["y2"])
    hi_y = max(e1["y1"], e1["y2"], e2["y1"], e2["y2"])
    x = min(max(x, Fraction(lo_x)), Fraction(hi_x))
    y = min(max(y, Fraction(lo_y)), Fraction(hi_y))
    return x, y


def pip_oracle_one(px: int, py: int, edges, query_map_id: int = 1):
    """Closest-edge-above for one snapped point: global argmin over all
    candidate edges with the exact comparator (equivalent to the reference's
    upward cell walk — see operators/pip.py docstring)."""
    best = None
    best_y = None
    for e in edges:
        x_min, x_max = min(e["x1"], e["x2"]), max(e["x1"], e["x2"])
        if px < x_min or px > x_max:
            continue
        if px == (x_min if query_map_id == 0 else x_max):
            continue
        s = px * e["a"] + py * e["b"] + e["c"]
        if s == 0:
            s = -e["a"] if query_map_id == 0 else e["a"]
        if s == 0:
            s = -e["b"] if query_map_id == 0 else e["b"]
        if s > 0:  # point above edge
            continue
        y = Fraction(-e["a"] * px - e["c"], e["b"])
        if best is None or y < best_y:
            best, best_y = e, y
        elif y == best_y:
            cur = Fraction(e["a"], e["b"])
            bst = Fraction(best["a"], best["b"])
            flag = cur > bst
            if (query_map_id and flag) or (not query_map_id and not flag):
                best = e
            elif cur == bst and e["eid"] < best["eid"]:
                best = e  # deterministic duplicate-geometry tiebreak (ours)
    return best


def face_of(e, miss_face=0):
    if e is None:
        return miss_face
    return e["right"] if e["x1"] < e["x2"] else e["left"]
