"""Douglas–Peucker polyline simplification — exact integer predicates.

The tiling layer's missing prep stage: before rasterizing or serving
vector tiles at a coarse zoom, chains are simplified to the tolerance of
the target zoom (the standard webmap pipeline step). Douglas–Peucker:
keep a chain's endpoints; recursively keep the interior point farthest
from the current segment while that distance exceeds epsilon.

Exactness: with snapped integer coords (plans/scaling.py) the
perpendicular-distance test needs no floats or square roots —

    dist^2 > eps^2   <=>   cross(p2-p1, p-p1)^2 > eps2 * |p2-p1|^2

with ``eps2 = epsilon^2`` — evaluated in arbitrary-precision Python
ints, so the kept set is bit-reproducible on any engine or partitioning
(ties: the LOWEST seq among equal-max distances splits first).
Degenerate closed segments (p1 == p2) fall back to point distance
``|p - p1|^2 > eps2``.

Scale shape: one ``applyInPandas`` group per (map_id-free) chain —
per-chain parallelism, the same granularity the reference stores chains
at (``/root/reference/src/map/planar_graph.h:24-39``). Chains are
bounded (thousands of points, KBs); a pathological single mega-chain is
a fat task by nature — the algorithm is sequential per chain — and
should be pre-split upstream. The recursion is an explicit stack (no
Python recursion limit); cost is the classic O(n^2) worst case /
O(n log n) typical per chain.

Driver-gate note: DP is inherently iterative/recursive — it is one of
the contract's "genuinely non-SQL-expressible ops", so the `simplify_dp`
entry ships without an `oracle_sql` twin; exactness is instead pinned by
tests/test_simplify.py against an independent arbitrary-precision
recursive implementation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("new_seq", T.IntegerType(), False),
        T.StructField("x", T.LongType(), False),
        T.StructField("y", T.LongType(), False),
    ]
)


def dp_keep_mask(xs: list[int], ys: list[int], eps2: int) -> list[bool]:
    """Exact integer Douglas–Peucker keep-mask for one chain."""
    n = len(xs)
    if n <= 2:
        return [True] * n
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        x1, y1, x2, y2 = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        best_k, best_num = -1, -1
        for k in range(lo + 1, hi):
            px, py = xs[k] - x1, ys[k] - y1
            if len2 == 0:
                num = (px * px + py * py) * 1  # point distance^2 (den 1)
                thresh = eps2
            else:
                c = dx * py - dy * px
                num = c * c  # dist^2 * len2
                thresh = eps2 * len2
            if num > thresh and num > best_num:
                best_num, best_k = num, k
        if best_k >= 0:
            keep[best_k] = True
            stack.append((best_k, hi))
            stack.append((lo, best_k))
    return keep


def simplify_chains(points: DataFrame, eps2: int) -> DataFrame:
    """points(chain_id, seq, x, y) with integer coords -> the kept
    subset, original ``seq`` preserved plus a dense ``new_seq``.

    ``eps2`` is the squared tolerance in snapped-grid units.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        keep = dp_keep_mask(xs, ys, eps2)
        out = pdf[pd.Series(keep, index=pdf.index)].copy()
        out["new_seq"] = range(len(out))
        return out[["chain_id", "seq", "new_seq", "x", "y"]]

    return (
        points.select("chain_id", "seq", "x", "y")
        .groupBy("chain_id")
        .applyInPandas(run, schema=OUT_SCHEMA)
    )
