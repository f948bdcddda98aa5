"""Check mode: cross-implementation result comparison.

Mirrors the reference's `-check` flag, which verifies a backend against
the grid oracle (reference src/run_overlay.cu:33-141):

* LSI: compare (eid_a, eid_b) multisets both ways (exceptAll), dump
  diffs (the reference sorts and diffs to /tmp/xsects_*.txt);
* PIP: compare per-point closest edge BY ENDPOINT COORDINATES, not eid —
  duplicate geometry in real data makes eids ambiguous
  (reference src/run_query.cu:52-73); report an error rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_lsi(result: DataFrame, oracle: DataFrame) -> dict:
    """Multiset compare of (eid_a, eid_b) pair sets; returns counts."""
    missing = oracle.exceptAll(result)
    extra = result.exceptAll(oracle)
    return {
        "result_rows": result.count(),
        "oracle_rows": oracle.count(),
        "missing": missing.count(),
        "extra": extra.count(),
    }


def check_pip(
    result: DataFrame, oracle: DataFrame, base_edges: DataFrame
) -> dict:
    """Per-point closest-eid compare, tolerant to duplicate geometry:
    two eids agree if their edges have identical endpoint coordinates."""
    # canonical ENDPOINT PAIR (lexicographically smaller point first) —
    # componentwise min/max would collapse a diagonal and its anti-diagonal
    # to the same bbox corners and mask genuine mismatches
    p1 = F.struct(F.col("x1").alias("x"), F.col("y1").alias("y"))
    p2 = F.struct(F.col("x2").alias("x"), F.col("y2").alias("y"))
    lo = F.when(p1 < p2, p1).otherwise(p2)
    hi = F.when(p1 < p2, p2).otherwise(p1)
    geom = base_edges.select(
        F.col("eid"),
        lo["x"].alias("gx1"),
        lo["y"].alias("gy1"),
        hi["x"].alias("gx2"),
        hi["y"].alias("gy2"),
    )
    r = result.select("point_id", F.col("closest_eid").alias("eid_r")).join(
        geom.withColumnRenamed("eid", "eid_r"), "eid_r", "left"
    )
    o = oracle.select("point_id", F.col("closest_eid").alias("eid_o")).join(
        geom.withColumnRenamed("eid", "eid_o"), "eid_o", "left"
    )
    j = r.select(
        "point_id", "gx1", "gy1", "gx2", "gy2", F.col("eid_r").isNull().alias("miss_r")
    ).join(
        o.select(
            "point_id",
            F.col("gx1").alias("ox1"),
            F.col("gy1").alias("oy1"),
            F.col("gx2").alias("ox2"),
            F.col("gy2").alias("oy2"),
            F.col("eid_o").isNull().alias("miss_o"),
        ),
        "point_id",
        "full",
    )
    agree = (F.col("miss_r") & F.col("miss_o")) | (
        (F.col("gx1") == F.col("ox1"))
        & (F.col("gy1") == F.col("oy1"))
        & (F.col("gx2") == F.col("ox2"))
        & (F.col("gy2") == F.col("oy2"))
    )
    total = j.count()
    errors = j.filter(~F.coalesce(agree, F.lit(False))).count()
    return {"points": total, "errors": errors, "error_rate": errors / max(total, 1)}
