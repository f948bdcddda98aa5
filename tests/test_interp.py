"""IDW interpolation edge cases the oracle data may not hit."""

from pyspark.sql import functions as F

from rayjoin_spark.operators.interp import idw_interpolate
from rayjoin_spark.plans.scaling import GridSpec, Scaling


def test_idw_exact_hit_and_far_fallback(spark):
    scaling = Scaling.from_bbox(0.0, 100.0, 0.0, 100.0)
    # corpus: two samples at the same spot as query 0 (tie -> min id),
    # and a lone far sample for query 1 whose weight floors to 0
    corpus = spark.createDataFrame(
        [(7, 10.0, 10.0, 70), (3, 10.0, 10.0, 30), (9, 90.0, 90.0, 111)],
        "corpus_id bigint, x double, y double, v bigint",
    )
    qs = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, 20.0, 20.0)],
        "point_id bigint, x double, y double",
    )
    out = {
        r.point_id: (r.value_q, r.n_neighbors)
        for r in idw_interpolate(qs, corpus, scaling, GridSpec(16), k=3).collect()
    }
    # query 0 coincides with samples 3 and 7 -> exact value of id 3
    assert out[0][0] == 30 and out[0][1] == 3
    # query 1: all dist2 >> IDW_SCALE? no — snapped domain is huge, so
    # weights are nonzero here; just sanity: a weighted blend in range
    assert 30 <= out[1][0] <= 111


def test_idw_weight_floor_zero_falls_back_to_nearest(spark):
    # identity snap over the full internal domain makes dist2 exceed
    # IDW_SCALE: every weight floors to 0 -> nearest sample's value
    ident = Scaling.identity()
    corpus = spark.createDataFrame(
        [(1, 0.0, 0.0, 42), (2, float(1 << 27), 0.0, 99)],
        "corpus_id bigint, x double, y double, v bigint",
    )
    qs = spark.createDataFrame(
        [(0, float(1 << 26), 100.0)], "point_id bigint, x double, y double"
    )
    out = idw_interpolate(qs, corpus, ident, GridSpec(8), k=2).collect()[0]
    # both dist2 ~ 2^52 > 10^15 -> weights 0 -> nearest (id 1 vs 2
    # equidistant in x but query sits 100 above; both dists equal ->
    # rank 1 is the smaller corpus_id) -> 42
    assert out.value_q == 42
