"""DuckDB SQL oracle for the COMPOSITE overlay driver query.

The engine's `overlay_chains` query runs the full pipeline (LSI with
exact points -> vertex PIP -> topological midpoint faces -> event-stream
fragment reconstruction -> dict-encoded writer output) on a fixed m=4
lattice pair. Every phase is SQL-expressible, so this module generates a
single DuckDB query reproducing the result BIT-FOR-BIT:

* the fixture (both lattice layers) is embedded as VALUES literals built
  by the same Python arithmetic datagen uses (same IEEE op order);
* snapping constants come from Scaling.from_bbox over the literal bbox —
  identical to what compute_scaling collects on the Spark side — and are
  embedded with repr() (exact round-trip);
* LSI / PIP run BRUTE FORCE (cross join + window argmin): the grid is a
  physical optimization, not semantics, so the oracle does not need one;
* the PIP argmin uses the same exact bigint limb keys as the engine
  (operators/pip.py) and the same SoS rules per query-map id;
* intersection points are HUGEINT rationals (the oracle analog of the
  engine's decimal(38,0) columns), cast to double through the same ops;
* the event stream, emit filter, consecutive-dup removal and
  first-encounter face/point dictionaries are window functions mirroring
  operators/overlay.py line by line.

Reference parity: src/run_overlay.cu:143-228 + src/app/output_chain.h.
"""

from __future__ import annotations

import math

from rayjoin_spark.plans.scaling import Scaling

EID_STRIDE = 1 << 20


def _lattice_py(m: int):
    """chains [(chain_id, lp, rp)], points [(chain_id, seq, x, y)] —
    mirrors sources/datagen.lattice_chains exactly."""
    nv = (m + 1) * m
    chains, points = [], []
    for k in range(nv):  # verticals
        i, j = k // m, k % m
        lp = 1 + (i - 1) * m + j if i > 0 else 0
        rp = 1 + i * m + j if i < m else 0
        chains.append((k, lp, rp))
        for seq in (0, 1):
            points.append((k, seq, float(i), float(j + seq)))
    for k in range(nv):  # horizontals
        cid = k + nv
        i, j = k % m, k // m
        lp = 1 + i * m + j if j < m else 0
        rp = 1 + i * m + (j - 1) if j > 0 else 0
        chains.append((cid, lp, rp))
        for seq in (0, 1):
            points.append((cid, seq, float(i + seq), float(j)))
    return chains, points


def _transform_py(points, scale=0.7, angle_deg=13.0, dxo=0.23, dyo=0.37):
    """Mirrors sources/datagen.transformed_lattice: same literal constants,
    same ((x*c) - (y*s)) + dx IEEE op order as the Spark expression."""
    c = scale * math.cos(math.radians(angle_deg))
    s = scale * math.sin(math.radians(angle_deg))
    return [
        (cid, seq, (x * c) - (y * s) + dxo, (x * s) + (y * c) + dyo)
        for (cid, seq, x, y) in points
    ]


def _subdivide_py(points, s: int, every: int):
    """Mirrors sources/datagen.subdivide_points applied to every `every`-th
    chain: x + (x2 - x) * t / s with the same IEEE op order as the Spark
    column expression (multiply, then divide). Applied AFTER any transform,
    exactly like the Spark-side test builder."""
    bych: dict = {}
    for (cid, seq, x, y) in points:
        bych.setdefault(cid, []).append((seq, x, y))
    out = []
    for cid, pts in sorted(bych.items()):
        pts.sort()
        if cid % every != 0:
            out += [(cid, seq, x, y) for (seq, x, y) in pts]
            continue
        for k in range(len(pts) - 1):
            (s0, x0, y0), (_, x1, y1) = pts[k], pts[k + 1]
            for t in range(s):
                out.append((cid, s0 * s + t, x0 + (x1 - x0) * t / s, y0 + (y1 - y0) * t / s))
        last = pts[-1]
        out.append((cid, last[0] * s, last[1], last[2]))
    return out


# exact bigint limb keys for the PIP argmin (same algebra as
# operators/pip.py _YK/_SK, with DuckDB's %, which needs the +b fixup)
def _pm(x: str, b: str = "b") -> str:
    return f"((({x}) % {b} + {b}) % {b})"


_YK_HI = f"(n - {_pm('n')}) // b"
_YK_LO = (
    f"(({_pm('n')} * 2147483648 - {_pm(_pm('n') + ' * 2147483648')}) // b) * 2147483648"
    f" + (({_pm(_pm('n') + ' * 2147483648')} * 2147483648"
    f" - {_pm(_pm(_pm('n') + ' * 2147483648') + ' * 2147483648')}) // b)"
)
_SK_HI = f"(a * 2147483648 - {_pm('a * 2147483648')}) // b"
_SK_LO = (
    f"({_pm('a * 2147483648')} * 2147483648"
    f" - {_pm(_pm('a * 2147483648') + ' * 2147483648')}) // b"
)


def overlay_oracle_sql(
    m: int = 4,
    result: str = "chains",
    subdivide: tuple[int, int] | None = None,
) -> str:
    """result='chains' -> the writer's chain table; 'points' -> the walk-
    order point stream (chain_id, seq, x, y) — same pipeline, different
    final SELECT. subdivide=(s, every) turns every `every`-th chain into
    an s-segment polyline (multi-point chains through the whole pipeline,
    mirroring datagen.subdivide_points on the Spark side)."""
    ch_a, pt_a = _lattice_py(m)
    ch_b = ch_a  # same topology, transformed geometry
    pt_b = _transform_py(pt_a)
    if subdivide is not None:
        s, every = subdivide
        pt_a = _subdivide_py(pt_a, s, every)
        pt_b = _subdivide_py(pt_b, s, every)

    xs = [p[2] for p in pt_a] + [p[2] for p in pt_b]
    ys = [p[3] for p in pt_a] + [p[3] for p in pt_b]
    sc: Scaling = Scaling.from_bbox(min(xs), max(xs), min(ys), max(ys))
    rx, ry, dx, dy = sc.rx, sc.ry, sc.dx, sc.dy

    chain_vals = ",\n    ".join(
        f"({mid}, {cid}, {lp}, {rp})"
        for mid, chs in ((0, ch_a), (1, ch_b))
        for (cid, lp, rp) in chs
    )
    # the e0 suffix forces DOUBLE literals: bare decimal literals parse as
    # DECIMAL(p,s) and VALUES unifies scales across rows, silently rounding
    # the 16th digit away (measured: vertex coords off by 1 ulp)
    point_vals = ",\n    ".join(
        f"({mid}, {cid}, {seq}, {x!r}e0, {y!r}e0)"
        for mid, pts in ((0, pt_a), (1, pt_b))
        for (cid, seq, x, y) in pts
    )

    def sos_sign(px, py, a, b, c, qm_is_zero: str):
        """SoS zero replacement: map0 point vs map1 edge -> (-a,-b); map1
        point vs map0 edge -> (+a,+b) (engine operators/pip.py, lsi.py)."""
        s = f"(({px}) * {a} + ({py}) * {b} + {c})"
        return (
            f"CASE WHEN {s} <> 0 THEN {s} "
            f"WHEN {a} <> 0 THEN (CASE WHEN {qm_is_zero} THEN -{a} ELSE {a} END) "
            f"ELSE (CASE WHEN {qm_is_zero} THEN -{b} ELSE {b} END) END"
        )

    return f"""
WITH chains(map_id, chain_id, lp, rp) AS (VALUES
    {chain_vals}
), rawpts(map_id, chain_id, seq, x, y) AS (VALUES
    {point_vals}
), sp AS (
  SELECT map_id, chain_id, seq, x, y,
         CAST(trunc(x * {rx!r} + {dx!r}) AS BIGINT) AS xi,
         CAST(trunc(y * {ry!r} + {dy!r}) AS BIGINT) AS yi
  FROM rawpts
), e0 AS (
  SELECT map_id, chain_id, seq,
         chain_id * {EID_STRIDE} + seq AS eid,
         xi AS x1, yi AS y1,
         lead(xi) OVER (PARTITION BY map_id, chain_id ORDER BY seq) AS x2,
         lead(yi) OVER (PARTITION BY map_id, chain_id ORDER BY seq) AS y2
  FROM sp
), e1 AS (
  SELECT *,
         CASE WHEN (x2 - x1) < 0 THEN -(y1 - y2) ELSE (y1 - y2) END AS a,
         CASE WHEN (x2 - x1) < 0 THEN -(x2 - x1) ELSE (x2 - x1) END AS b
  FROM e0 WHERE x2 IS NOT NULL
), edges AS (
  SELECT e1.*, (-x1 * a - y1 * b) AS c, ch.lp AS left_pid, ch.rp AS right_pid
  FROM e1 JOIN chains ch USING (map_id, chain_id)
  WHERE NOT (a = 0 AND b = 0)
),
-- ============ phase 1: LSI (brute force, exact SoS + rational points)
lsij AS (
  SELECT ea.eid AS eid_a, eb.eid AS eid_b,
         ea.x1 AS ax1, ea.y1 AS ay1, ea.x2 AS ax2, ea.y2 AS ay2,
         eb.x1 AS bx1, eb.y1 AS by1, eb.x2 AS bx2, eb.y2 AS by2,
         ea.a AS aa, ea.b AS ab, ea.c AS ac,
         eb.a AS ba, eb.b AS bb, eb.c AS bc
  FROM edges ea, edges eb WHERE ea.map_id = 0 AND eb.map_id = 1
), lsifilt AS (
  SELECT * FROM (
    SELECT *,
      {sos_sign('ax1', 'ay1', 'ba', 'bb', 'bc', 'TRUE')} AS s_a1,
      {sos_sign('ax2', 'ay2', 'ba', 'bb', 'bc', 'TRUE')} AS s_a2,
      {sos_sign('bx1', 'by1', 'aa', 'ab', 'ac', 'FALSE')} AS s_b1,
      {sos_sign('bx2', 'by2', 'aa', 'ab', 'ac', 'FALSE')} AS s_b2
    FROM lsij
  ) WHERE ((s_a1 > 0) <> (s_a2 > 0)) AND ((s_b1 > 0) <> (s_b2 > 0))
    AND NOT ((ax1 = bx1 AND ay1 = by1 AND ax2 = bx2 AND ay2 = by2)
          OR (ax1 = bx2 AND ay1 = by2 AND ax2 = bx1 AND ay2 = by1))
), xraw AS (
  SELECT eid_a, eid_b,
         CAST(aa AS HUGEINT) * bb - CAST(ba AS HUGEINT) * ab AS den0,
         CAST(bc AS HUGEINT) * ab - CAST(ac AS HUGEINT) * bb AS numx0,
         CAST(ba AS HUGEINT) * ac - CAST(aa AS HUGEINT) * bc AS numy0,
         least(ax1, ax2, bx1, bx2) AS lo_x, greatest(ax1, ax2, bx1, bx2) AS hi_x,
         least(ay1, ay2, by1, by2) AS lo_y, greatest(ay1, ay2, by1, by2) AS hi_y
  FROM lsifilt
), xnorm AS (
  SELECT eid_a, eid_b, lo_x, hi_x, lo_y, hi_y,
         CASE WHEN den0 < 0 THEN -den0 ELSE den0 END AS den,
         CASE WHEN den0 < 0 THEN -numx0 ELSE numx0 END AS num_x,
         CASE WHEN den0 < 0 THEN -numy0 ELSE numy0 END AS num_y
  FROM xraw
), xclamp AS (
  SELECT eid_a, eid_b, den,
         CASE WHEN num_x < lo_x * den THEN lo_x * den
              WHEN num_x > hi_x * den THEN hi_x * den
              ELSE num_x END AS num_x,
         CASE WHEN num_y < lo_y * den THEN lo_y * den
              WHEN num_y > hi_y * den THEN hi_y * den
              ELSE num_y END AS num_y
  FROM xnorm
), xpts AS (
  SELECT eid_a, eid_b, num_x, num_y, den,
         CAST(num_x AS DOUBLE) / CAST(den AS DOUBLE) AS xd,
         CAST(num_y AS DOUBLE) / CAST(den AS DOUBLE) AS yd
  FROM xclamp
),
-- ============ phase 3: order xsects along each side's edges + midfaces
-- (EXACT parametric order: t = t_num/den as 3 integer limbs of
-- floor(t * 2^118), mirroring the engine's _TK_*_SQL limb key — the
-- reference compares exact rational squared distances,
-- src/app/map_overlay_grid.h:152-161)
xboth AS (
  SELECT 0 AS map_id, x.eid_a AS eid, e.chain_id, e.seq, x.eid_b AS other_eid,
         x.xd, x.yd, x.den,
         (x.num_x - e.x1 * x.den) * (e.x2 - e.x1)
         + (x.num_y - e.y1 * x.den) * (e.y2 - e.y1) AS t_num,
         e.x2 - e.x1 AS dxe, e.y2 - e.y1 AS dye
  FROM xpts x JOIN edges e ON e.map_id = 0 AND e.eid = x.eid_a
  UNION ALL
  SELECT 1, x.eid_b, e.chain_id, e.seq, x.eid_a, x.xd, x.yd, x.den,
         (x.num_x - e.x1 * x.den) * (e.x2 - e.x1)
         + (x.num_y - e.y1 * x.den) * (e.y2 - e.y1),
         e.x2 - e.x1, e.y2 - e.y1
  FROM xpts x JOIN edges e ON e.map_id = 1 AND e.eid = x.eid_b
), xlimb AS (
  SELECT *, ((t_num % den) + den) % den AS pm FROM xboth
), xidxd AS (
  SELECT *, row_number() OVER (
      PARTITION BY map_id, eid
      ORDER BY (t_num - pm) // den,
               (pm * 576460752303423488::HUGEINT) // den,
               (((pm * 576460752303423488::HUGEINT) % den)
                 * 576460752303423488::HUGEINT) // den,
               other_eid) - 1 AS xidx
  FROM xlimb
), xsm AS (
  SELECT x.*, CASE WHEN ((o.a * x.dxe + o.b * x.dye) > 0) = (o.x1 <= o.x2)
                   THEN o.left_pid ELSE o.right_pid END AS midface
  FROM xidxd x JOIN edges o ON o.map_id = 1 - x.map_id AND o.eid = x.other_eid
),
-- ============ phase 2: vertex PIP (brute force, exact limb-key argmin)
vcand AS (
  SELECT p.map_id, p.chain_id, p.seq, e.eid, e.x1, e.x2,
         e.left_pid, e.right_pid,
         (-e.a * p.xi - e.c) AS n, e.a AS a, e.b AS b,
         (CASE WHEN p.map_id = 1 THEN -1 ELSE 1 END) AS sflip
  FROM sp p JOIN edges e ON e.map_id = 1 - p.map_id
  WHERE (CASE WHEN p.map_id = 0
              THEN p.xi > least(e.x1, e.x2) AND p.xi <= greatest(e.x1, e.x2)
              ELSE p.xi >= least(e.x1, e.x2) AND p.xi < greatest(e.x1, e.x2) END)
    AND ({sos_sign('p.xi', 'p.yi', 'e.a', 'e.b', 'e.c', 'p.map_id = 0')}) < 0
), vkeyed AS (
  SELECT *,
    {_YK_HI} AS yk_hi, {_YK_LO} AS yk_lo,
    sflip * ({_SK_HI}) AS sk_hi, sflip * ({_SK_LO}) AS sk_lo
  FROM vcand
), vbest AS (
  SELECT map_id, chain_id, seq, x1, x2, left_pid, right_pid,
         row_number() OVER (PARTITION BY map_id, chain_id, seq
                            ORDER BY yk_hi, yk_lo, sk_hi, sk_lo, eid) AS rn
  FROM vkeyed
), vface AS (
  SELECT p.map_id, p.chain_id, p.seq, p.x, p.y,
         COALESCE(CASE WHEN b.x1 < b.x2 THEN b.right_pid ELSE b.left_pid END, 0) AS vf
  FROM sp p LEFT JOIN (SELECT * FROM vbest WHERE rn = 1) b
    USING (map_id, chain_id, seq)
),
-- ============ phase 4: event stream -> fragments
exc AS (
  SELECT *, count(*) OVER (PARTITION BY map_id, chain_id ORDER BY seq, xidx
                           ROWS UNBOUNDED PRECEDING) AS xnum
  FROM xsm
), ev AS (
  -- intersection closes fragment xnum-1 ...
  SELECT map_id, chain_id, seq AS p0, 1 AS p1, xidx AS p2, 0 AS p3,
         xnum - 1 AS frag,
         (xd - {dx!r}) / {rx!r} AS xd_raw, (yd - {dy!r}) / {ry!r} AS yd_raw,
         CAST(NULL AS BIGINT) AS vf, CAST(NULL AS BIGINT) AS midface,
         0 AS is_vertex
  FROM exc
  UNION ALL
  -- ... and opens fragment xnum with the topologically-entered face
  SELECT map_id, chain_id, seq, 1, xidx, 1, xnum,
         (xd - {dx!r}) / {rx!r}, (yd - {dy!r}) / {ry!r},
         NULL, CAST(midface AS BIGINT), 0
  FROM exc
  UNION ALL
  -- vertices: frag = #xsects on strictly earlier edges of the chain
  SELECT v.map_id, v.chain_id, v.seq, 0, 0, 0,
         COALESCE(SUM(nxs.nx) OVER (PARTITION BY v.map_id, v.chain_id
                                    ORDER BY v.seq
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
         v.x, v.y, CAST(v.vf AS BIGINT), NULL, 1
  FROM vface v LEFT JOIN (
    SELECT map_id, chain_id, seq, count(*) AS nx FROM xsm
    GROUP BY map_id, chain_id, seq
  ) nxs USING (map_id, chain_id, seq)
), faced AS (
  SELECT *,
    COALESCE(
      last_value(CASE WHEN is_vertex = 1 THEN vf END IGNORE NULLS)
        OVER (PARTITION BY map_id, chain_id, frag ORDER BY p0, p1, p2, p3
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      first_value(midface IGNORE NULLS)
        OVER (PARTITION BY map_id, chain_id, frag ORDER BY p0, p1, p2, p3
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      0) AS other_face
  FROM ev
), kept AS (
  SELECT f.* , ch.lp AS left_pid, ch.rp AS right_pid
  FROM faced f JOIN chains ch USING (map_id, chain_id)
  WHERE f.other_face <> 0 AND (ch.lp <> 0 OR ch.rp <> 0)
), dedup AS (
  SELECT * FROM (
    SELECT *,
      lag(xd_raw) OVER (PARTITION BY map_id, chain_id, frag
                        ORDER BY p0, p1, p2, p3) AS lx,
      lag(yd_raw) OVER (PARTITION BY map_id, chain_id, frag
                        ORDER BY p0, p1, p2, p3) AS ly
    FROM kept
  ) WHERE lx IS NULL OR xd_raw <> lx OR yd_raw <> ly
), seqd AS (
  SELECT *, row_number() OVER (PARTITION BY map_id, chain_id, frag
                               ORDER BY p0, p1, p2, p3) - 1 AS pseq
  FROM dedup
), frag_ids AS (
  SELECT map_id, chain_id, frag, count(*) AS n_points,
         min(left_pid) AS left_pid, min(right_pid) AS right_pid,
         min(other_face) AS other_face,
         row_number() OVER (ORDER BY map_id, chain_id, frag) AS out_chain_id
  FROM seqd GROUP BY map_id, chain_id, frag
),
-- ============ writer: first-encounter face + point dictionaries
fe AS (
  SELECT out_chain_id,
         least(left_pid, other_face) AS lk, greatest(left_pid, other_face) AS lv,
         least(right_pid, other_face) AS rk, greatest(right_pid, other_face) AS rv
  FROM frag_ids
), fpairs AS (
  SELECT lk AS k1, lv AS k2, out_chain_id * 2 AS pos FROM fe
  UNION ALL
  SELECT rk, rv, out_chain_id * 2 + 1 FROM fe
), face_dict AS (
  SELECT k1, k2, row_number() OVER (ORDER BY min(pos)) AS face_id
  FROM fpairs WHERE k1 <> 0 AND k2 <> 0 GROUP BY k1, k2
), pts_out AS (
  SELECT f.out_chain_id, s.pseq, s.xd_raw AS x, s.yd_raw AS y
  FROM seqd s JOIN frag_ids f USING (map_id, chain_id, frag)
), pt_dict AS (
  SELECT x, y, row_number() OVER (ORDER BY min(out_chain_id * {EID_STRIDE} + pseq)) - 1 AS point_id
  FROM pts_out GROUP BY x, y
), ends AS (
  SELECT p.out_chain_id,
         arg_min(d.point_id, p.pseq) AS first_point_id,
         arg_max(d.point_id, p.pseq) AS last_point_id
  FROM pts_out p JOIN pt_dict d USING (x, y)
  GROUP BY p.out_chain_id
)
""" + (
        """
SELECT CAST(out_chain_id AS BIGINT) AS chain_id,
       CAST(pseq AS BIGINT) AS seq, x, y
FROM pts_out
"""
        if result == "points"
        else """
SELECT CAST(f.out_chain_id AS BIGINT) AS chain_id,
       CAST(f.n_points AS BIGINT) AS n_points,
       CAST(e.first_point_id AS BIGINT) AS first_point_id,
       CAST(e.last_point_id AS BIGINT) AS last_point_id,
       CAST(COALESCE(fd1.face_id, 0) AS BIGINT) AS left_face,
       CAST(COALESCE(fd2.face_id, 0) AS BIGINT) AS right_face
FROM frag_ids f
JOIN fe USING (out_chain_id)
JOIN ends e USING (out_chain_id)
LEFT JOIN face_dict fd1 ON fd1.k1 = fe.lk AND fd1.k2 = fe.lv
LEFT JOIN face_dict fd2 ON fd2.k1 = fe.rk AND fd2.k2 = fe.rv
"""
    )
