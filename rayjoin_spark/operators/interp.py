"""Inverse-distance-weighted (IDW) spatial interpolation over the grid.

The raster-analytic companion to kNN: estimate a value at each query
point from its k nearest corpus samples, weighted by 1/d^2. Candidate
generation is exactly ``knn_points`` (Chebyshev cell-ring expansion,
exact int64 squared distances, deterministic ties) — IDW is one join +
one combinable aggregate on top.

Cross-engine determinism: weights are floor-quantized integers,
``w_i = SCALE DIV d2_i`` and the estimate is

    value_q = (sum_i v_i * w_i) DIV (sum_i w_i)

— all bigint, no float division. A query coinciding with a sample
(d2 = 0) returns that sample's value exactly (ties -> smallest corpus
id, matching knn's rank order). Samples farther than sqrt(SCALE) get
weight 0; if ALL k weights floor to 0 the estimate falls back to the
nearest sample's value (rank 1) — deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.operators.knn import knn_points
from rayjoin_spark.plans.scaling import GridSpec, Scaling

#: quantization scale for the 1/d^2 weights
IDW_SCALE = 10**15


def idw_interpolate(
    queries: DataFrame,
    corpus: DataFrame,
    scaling: Scaling,
    grid: GridSpec | None = None,
    k: int = 5,
    query_id: str = "point_id",
    corpus_id: str = "corpus_id",
    value_col: str = "v",
) -> DataFrame:
    """queries(query_id, x, y); corpus(corpus_id, x, y, value_col:bigint)
    -> (query_id, value_q:bigint, n_neighbors:bigint).

    |value| must stay under ~2^63/(k*IDW_SCALE) (plenty for metric-style
    integer values); the weighted sum rides decimal(38,0) regardless so
    a hot spot cannot silently wrap.
    """
    grid = grid or GridSpec(64)
    nn = knn_points(
        queries, corpus, scaling, grid, k=k,
        query_id=query_id, corpus_id=corpus_id,
    )
    vals = corpus.select(F.col(corpus_id), F.col(value_col).alias("_v"))
    j = nn.join(vals, corpus_id)
    d38 = "decimal(38,0)"
    w = F.expr(f"CAST({IDW_SCALE} AS BIGINT) DIV dist2")
    agg = (
        j.withColumn("w", F.when(F.col("dist2") == 0, F.lit(None)).otherwise(w))
        .groupBy(query_id)
        .agg(
            F.min(F.when(F.col("dist2") == 0, F.struct(corpus_id, "_v"))).alias(
                "exact"
            ),
            F.sum(F.expr(f"CAST(_v AS {d38}) * CAST(w AS {d38})")).alias("num"),
            F.sum(F.expr(f"CAST(w AS {d38})")).alias("den"),
            F.min(F.when(F.col("rank") == 1, F.col("_v"))).alias("nearest_v"),
            F.count("*").alias("n_neighbors"),
        )
    )
    return agg.select(
        query_id,
        F.when(F.col("exact").isNotNull(), F.col("exact._v"))
        .when(
            F.col("den").isNull() | (F.col("den") == 0), F.col("nearest_v")
        )
        .otherwise(F.expr("num DIV den").cast("bigint"))
        .alias("value_q"),
        F.col("n_neighbors").cast("bigint").alias("n_neighbors"),
    )
