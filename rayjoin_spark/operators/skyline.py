"""Skyline (Pareto frontier) over 2-D points — minimize both axes.

The classic dominance query: a point survives iff no other point is <=
on both coordinates and strictly < on at least one. Like the convex
hull (operators/hull.py), the skyline is a REDUCIBLE summary:
skyline(S) is a subset of the union of per-partition skylines, so
stage 1 shrinks each partition to its local frontier with no shuffle
(`mapInPandas`, sort + single scan), and stage 2 re-scans only the
survivors. Global skyline size is O(log n) expected for independent
dims (worst case O(n) for anti-correlated data — stage 2's single task
is then frontier-sized, never input-sized).

All comparisons are exact integers; duplicates collapse (a duplicate
does not dominate its twin, but the output is a point SET).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "x bigint, y bigint"


def _local_skyline(pdf: pd.DataFrame) -> pd.DataFrame:
    pts = sorted(set(zip((int(v) for v in pdf["x"]), (int(v) for v in pdf["y"]))))
    keep = []
    best_y = None
    for x, y in pts:  # x asc, y asc: survivor iff y strictly improves
        if best_y is None or y < best_y:
            keep.append((x, y))
            best_y = y
    return pd.DataFrame({"x": [p[0] for p in keep], "y": [p[1] for p in keep]})


def _map_local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        if len(b):
            yield _local_skyline(b)


def skyline(points: DataFrame) -> DataFrame:
    """points(x:bigint, y:bigint) -> the Pareto-minimal point set."""
    src = points.selectExpr("CAST(x AS BIGINT) AS x", "CAST(y AS BIGINT) AS y")
    partial = src.mapInPandas(_map_local, _SCHEMA)
    # stage 2: one grouped pass over the (frontier-sized) survivors
    return (
        partial.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda g: _local_skyline(g), _SCHEMA)
    )
