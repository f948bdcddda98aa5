"""Layer loading: chain tables -> snapped-integer edge tables.

Re-expresses the reference's device map build (reference src/map/map.h:108-233:
scale points, walk each chain's CSR range, emit one edge per consecutive
point pair, precompute the integer line equation, sign-normalize b >= 0)
as pure DataFrame column arithmetic:

* the CSR walk becomes a `lead()` window over (chain_id, seq) — a narrow
  per-chain operation, shuffled once by chain_id;
* the line equation (reference src/map/map.h:26-38) is three int64 columns;
* left/right polygon ids ride along from the chains table via an equi-join
  (broadcast when the chain table is small).

Edge ids are `chain_id * eid_stride + seq` — deterministic and
collision-free without a global row_number (which would serialize on a
single partition at 100 TB scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rayjoin_spark.plans.scaling import Scaling

EID_STRIDE_DEFAULT = 1 << 20


def scale_points(points: DataFrame, scaling: Scaling, x: str = "x", y: str = "y") -> DataFrame:
    """Add snapped-integer coords `xi`, `yi` (reference src/map/scaling.h:79-93)."""
    return points.withColumn("xi", scaling.scale_x(F.col(x))).withColumn(
        "yi", scaling.scale_y(F.col(y))
    )


def build_edges(
    chains: DataFrame,
    points: DataFrame,
    scaling: Scaling,
    eid_stride: int = EID_STRIDE_DEFAULT,
    broadcast_chains: bool = True,
) -> DataFrame:
    """chains(chain_id,left_polygon_id,right_polygon_id) + points(chain_id,seq,x,y)
    -> edges(eid, x1,y1,x2,y2, a,b,c, left_polygon_id, right_polygon_id).

    x1..y2 are snapped ints in *chain order* (p1 = seq k, p2 = seq k+1) —
    the stored point order feeds face resolution (reference
    src/map/map.h:79-87 keys on p1.x < p2.x in chain order). The equation
    (a,b,c) is sign-normalized to b >= 0 independently of point order
    (reference src/map/map.h:26-38).

    Zero-length edges after snapping (a==0 and b==0) are dropped: the
    reference's predicates return false for them anyway
    (src/algo/lsi.h:48-49).
    """
    pts = scale_points(points, scaling)
    w = Window.partitionBy("chain_id").orderBy("seq")
    e = (
        pts.select(
            "chain_id",
            "seq",
            F.col("xi").alias("x1"),
            F.col("yi").alias("y1"),
            F.lead("xi").over(w).alias("x2"),
            F.lead("yi").over(w).alias("y2"),
        )
        .filter(F.col("x2").isNotNull())
        .withColumn("eid", F.col("chain_id") * F.lit(eid_stride) + F.col("seq"))
    )
    # integer line equation ax + by + c = 0, b >= 0
    a0 = F.col("y1") - F.col("y2")
    b0 = F.col("x2") - F.col("x1")
    e = (
        e.withColumn("a0", a0)
        .withColumn("b0", b0)
        .withColumn("flip", F.col("b0") < 0)
        .withColumn("a", F.when(F.col("flip"), -F.col("a0")).otherwise(F.col("a0")))
        .withColumn("b", F.when(F.col("flip"), -F.col("b0")).otherwise(F.col("b0")))
        .withColumn("c", -F.col("x1") * F.col("a") - F.col("y1") * F.col("b"))
        .drop("a0", "b0", "flip")
        .filter((F.col("a") != 0) | (F.col("b") != 0))
    )
    ch = chains.select("chain_id", "left_polygon_id", "right_polygon_id")
    if broadcast_chains:
        ch = F.broadcast(ch)
    return e.join(ch, "chain_id").select(
        "eid",
        "chain_id",
        "seq",
        "x1",
        "y1",
        "x2",
        "y2",
        "a",
        "b",
        "c",
        "left_polygon_id",
        "right_polygon_id",
    )
