"""Per-group convex hull as a two-level distributed reduction.

The reference engine ships map *sampling* (reference
src/map/planar_graph.h:254-399) whose downstream use is exactly this
kind of per-layer geometric summary; the hull itself is the classic
summary Spark can compute without any cross-group shuffle coupling.

Algorithm: Andrew monotone chain with STRICT turns (collinear boundary
points dropped), over exact integer coordinates — every cross product of
snapped-int diffs is <= 2^59 (plans/scaling.py), so plain int64 / NumPy
int64 arithmetic is exact, no epsilon anywhere. A point is emitted iff
it is an extreme point of its group (not in the convex hull of the
others) — the characterization the DuckDB oracle tests independently
via Caratheodory (contained in some nondegenerate triangle, or on some
segment, of its peers).

Scale shape (the part that matters at 100 TB): hull is a *reducible*
summary — hull(S) vertices are a subset of the union of the vertices of
per-partition hulls. Stage 1 runs `mapInPandas` over whatever
partitioning the input already has, computing a LOCAL hull per (group,
partition) slice: output size per partition drops from millions of rows
to O(hull) without any shuffle. Stage 2 shuffles only those survivors
and runs the final per-group chain in `applyInPandas`. A group with a
billion points costs one narrow pass plus a tiny grouped job; no single
task ever holds a full group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = "group_id bigint, x bigint, y bigint"


def _chain(px: list, py: list):
    """Monotone chain on exact python ints; returns hull vertex list
    (strict turns only — collinear mid-edge points dropped)."""
    pts = sorted(set(zip(px, py)))
    if len(pts) <= 2:
        return pts

    def half(seq):
        out = []
        for p in seq:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(reversed(pts))
    return lower[:-1] + upper[:-1]


def _local_hulls(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        if len(b) == 0:
            continue
        parts = []
        for gid, g in b.groupby("group_id"):
            hull = _chain(
                [int(v) for v in g["x"]], [int(v) for v in g["y"]]
            )
            parts.append(
                pd.DataFrame(
                    {
                        "group_id": gid,
                        "x": [p[0] for p in hull],
                        "y": [p[1] for p in hull],
                    }
                )
            )
        yield pd.concat(parts, ignore_index=True)


def _final_hull(g: pd.DataFrame) -> pd.DataFrame:
    hull = _chain([int(v) for v in g["x"]], [int(v) for v in g["y"]])
    return pd.DataFrame(
        {
            "group_id": int(g["group_id"].iloc[0]),
            "x": [p[0] for p in hull],
            "y": [p[1] for p in hull],
        }
    )


def _final_diameter(g: pd.DataFrame) -> pd.DataFrame:
    hull = _chain([int(v) for v in g["x"]], [int(v) for v in g["y"]])
    best = None
    for i, p in enumerate(hull):
        for q in hull[i:]:
            d2 = (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
            a, b = (p, q) if p <= q else (q, p)
            key = (-d2, a, b)
            if best is None or key < best:
                best = key
    d2, a, b = -best[0], best[1], best[2]
    return pd.DataFrame(
        {
            "group_id": [int(g["group_id"].iloc[0])],
            "x1": [a[0]], "y1": [a[1]], "x2": [b[0]], "y2": [b[1]],
            "dist2": [d2],
        }
    )


def group_diameter(points: DataFrame, group_col: str = "group_id") -> DataFrame:
    """Farthest pair (diameter) per group: (group_id, x1, y1, x2, y2,
    dist2), endpoints canonicalized (x1,y1) <= (x2,y2) lex; among
    equal-distance pairs the lexicographically smallest wins.

    The diameter's endpoints are hull vertices, so the same two-level
    hull reduction shrinks each group to O(hull) before the exact
    all-pairs max over hull vertices (h^2 on a tiny frame; the classic
    rotating-calipers step, done exhaustively because h is small after
    reduction). dist2 <= 2*(2^29)^2 = 2^59 — exact int64.
    """
    src = points.selectExpr(
        f"CAST({group_col} AS BIGINT) AS group_id",
        "CAST(x AS BIGINT) AS x",
        "CAST(y AS BIGINT) AS y",
    )
    partial = src.mapInPandas(_local_hulls, _OUT_SCHEMA)
    return partial.groupBy("group_id").applyInPandas(
        lambda g: _final_diameter(g),
        "group_id bigint, x1 bigint, y1 bigint, x2 bigint, y2 bigint, dist2 bigint",
    )


def convex_hull(points: DataFrame, group_col: str = "group_id") -> DataFrame:
    """points(group_col, x:bigint, y:bigint) -> hull vertices
    (group_id, x, y), one row per extreme point (set semantics; the
    driver/oracle compare is order-insensitive).

    Duplicates and interior points are dropped; a group of 1 or 2
    distinct points returns them as-is (its hull IS those points).
    """
    src = points.selectExpr(
        f"CAST({group_col} AS BIGINT) AS group_id",
        "CAST(x AS BIGINT) AS x",
        "CAST(y AS BIGINT) AS y",
    )
    partial = src.mapInPandas(_local_hulls, _OUT_SCHEMA)
    return partial.groupBy("group_id").applyInPandas(
        lambda g: _final_hull(g), _OUT_SCHEMA
    )
