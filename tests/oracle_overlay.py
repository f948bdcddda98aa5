"""Python oracle for the overlay pipeline: a faithful sequential
re-implementation of the reference writer semantics
(reference src/run_overlay.cu:143-228 + src/app/output_chain.h:41-205),
built on the exact primitives in tests/oracle.py.

Midpoint faces are EXACT: the midpoint of each consecutive intersection
pair is carried as a Fraction (arbitrary-precision rational — the oracle
analog of the reference's int128 rational, src/util/rational.h:72-123)
and located with the exact-arithmetic PIP. This is deliberately a
DIFFERENT method than the engine (which derives the entered face
topologically from the crossed edge's left/right ids, operators/
overlay.py) — agreement between the two is the exactness cross-check.
The ordering of intersections along an edge is also EXACT (Fraction
parametric position, ties by other-edge id) — mirroring the engine's
int-limb order key and the reference's exact rational squared-distance
compare (src/app/map_overlay_grid.h:152-161)."""

from __future__ import annotations

from fractions import Fraction  # noqa: F401  (oracle values are Fractions)

from tests.oracle import (
    face_of,
    intersect_test_py,
    pip_oracle_one,
    xsect_point_py,
)


def _xd(fr: Fraction) -> float:
    # mirror Spark: decimal -> double casts of num/den, then IEEE divide
    return float(fr.numerator) / float(fr.denominator)


def overlay_oracle(edges_by_map, chains_by_map, points_by_map, scaling):
    """edges_by_map: [edges0, edges1] from build_edges_py (chain order);
    chains_by_map[im]: dict chain_id -> (left,right);
    points_by_map[im]: sorted list of (chain_id, seq, x, y) raw doubles.

    Returns (chains_rows, points_rows) matching the engine output schema.
    """
    e0, e1 = edges_by_map

    # LSI: xsects per (map, eid)
    xs_by_edge = [{}, {}]  # im -> eid -> list of dict(xd, yd, other_eid, t)
    for ea in e0:
        for eb in e1:
            if intersect_test_py(ea, eb):
                x, y = xsect_point_py(ea, eb)
                xd, yd = _xd(x), _xd(y)
                for im, (e, oe) in enumerate([(ea, eb), (eb, ea)]):
                    # EXACT parametric order along the edge (Fraction dot
                    # product) — mirrors the engine's limb-key ordering and
                    # the reference's exact squared-distance compare
                    # (src/app/map_overlay_grid.h:152-161)
                    t = (x - e["x1"]) * (e["x2"] - e["x1"]) + (y - e["y1"]) * (
                        e["y2"] - e["y1"]
                    )
                    xs_by_edge[im].setdefault(e["eid"], []).append(
                        dict(xd=xd, yd=yd, x=x, y=y, other=oe["eid"], t=t)
                    )
    for im in range(2):
        for lst in xs_by_edge[im].values():
            lst.sort(key=lambda r: (r["t"], r["other"]))

    def snap(x, y):
        return int(x * scaling.rx + scaling.dx), int(y * scaling.ry + scaling.dy)

    def unscale(xi, yi):
        return (xi - scaling.dx) / scaling.rx, (yi - scaling.dy) / scaling.ry

    other_edges = [e1, e0]

    def locate(xraw, yraw, im):
        px, py = snap(xraw, yraw)
        return face_of(pip_oracle_one(px, py, other_edges[im], query_map_id=im))

    # midpoint faces: per (im, eid, j) face of midpoint(xsect j, j+1),
    # computed as an EXACT rational and located with exact-arithmetic PIP
    # (pip_oracle_one is generic over int/Fraction coordinates)
    midface = [{}, {}]
    for im in range(2):
        for eid, lst in xs_by_edge[im].items():
            for j in range(len(lst) - 1):
                mx = (lst[j]["x"] + lst[j + 1]["x"]) / 2
                my = (lst[j]["y"] + lst[j + 1]["y"]) / 2
                midface[im][(eid, j)] = face_of(
                    pip_oracle_one(mx, my, other_edges[im], query_map_id=im)
                )

    # writer walk
    out_chains = []  # (points list, left, right, other)

    def flush(cur):
        pts, left, right, other = cur
        if pts:
            if left * other != 0 or right * other != 0:
                ded = [pts[0]]
                for p in pts[1:]:
                    if p != ded[-1]:
                        ded.append(p)
                out_chains.append((ded, left, right, other))
            cur[0] = []

    eid_stride = 1 << 20
    for im in range(2):
        chains = chains_by_map[im]
        pts_list = points_by_map[im]
        by_chain = {}
        for cid, seq, x, y in pts_list:
            by_chain.setdefault(cid, []).append((seq, x, y))
        for cid in sorted(by_chain):
            left, right = chains[cid]
            rows = sorted(by_chain[cid])
            cur = [[], left, right, 0]
            for k, (seq, x, y) in enumerate(rows):
                cur[3] = locate(x, y, im)  # vertex PIP (overwrite)
                cur[0].append((x, y))
                if k != len(rows) - 1:
                    eid = cid * eid_stride + seq
                    lst = xs_by_edge[im].get(eid, [])
                    if lst:
                        def xpt(j):
                            return unscale(lst[j]["xd"], lst[j]["yd"])

                        cur[0].append(xpt(0))
                        for j in range(len(lst) - 1):
                            flush(cur)
                            cur[3] = midface[im][(eid, j)]
                            cur[0].append(xpt(j))
                            cur[0].append(xpt(j + 1))
                        flush(cur)
                        cur[0].append(xpt(len(lst) - 1))
            flush(cur)

    # face + point dict encode (first-encounter)
    face_ids = {}

    def create_polygon(a, b):
        if a == 0 or b == 0:
            return 0
        k = (min(a, b), max(a, b))
        if k not in face_ids:
            face_ids[k] = len(face_ids) + 1
        return face_ids[k]

    point_ids = {}
    chains_rows, points_rows = [], []
    for i, (pts, left, right, other) in enumerate(out_chains):
        lf = create_polygon(left, other)
        rf = create_polygon(right, other)
        for p in pts:
            if p not in point_ids:
                point_ids[p] = len(point_ids)
        chains_rows.append(
            dict(
                chain_id=i + 1,
                n_points=len(pts),
                first_point_id=point_ids[pts[0]],
                last_point_id=point_ids[pts[-1]],
                left_face=lf,
                right_face=rf,
            )
        )
        for s, (x, y) in enumerate(pts):
            points_rows.append(dict(chain_id=i + 1, seq=s, x=x, y=y))
    return chains_rows, points_rows
