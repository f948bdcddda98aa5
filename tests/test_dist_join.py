"""dist_join semantics: exact within-distance pairs, grid-invariant."""

from pyspark.sql import functions as F

from rayjoin_spark.operators.knn import dist_join
from rayjoin_spark.plans.scaling import GridSpec, Scaling


def _pts(spark, rows, idc):
    return spark.createDataFrame(rows, f"{idc} bigint, x double, y double")


def _brute(spark, qs, cs, scaling, d_int):
    q = qs.select(
        F.col("point_id").alias("qid"),
        scaling.scale_x(F.col("x")).alias("qx"),
        scaling.scale_y(F.col("y")).alias("qy"),
    )
    c = cs.select(
        F.col("corpus_id").alias("cid"),
        scaling.scale_x(F.col("x")).alias("cx"),
        scaling.scale_y(F.col("y")).alias("cy"),
    )
    d2 = (F.col("cx") - F.col("qx")) * (F.col("cx") - F.col("qx")) + (
        F.col("cy") - F.col("qy")
    ) * (F.col("cy") - F.col("qy"))
    return {
        (r["qid"], r["cid"], r["d"])
        for r in q.crossJoin(c)
        .withColumn("d", d2)
        .filter(F.col("d") <= d_int * d_int)
        .collect()
    }


def test_dist_join_matches_bruteforce_and_grid_invariant(spark):
    scaling = Scaling.from_bbox(0.0, 100.0, 0.0, 100.0)
    # deterministic scatter incl. coincident and far points
    qrows = [(i, float((i * 37) % 101), float((i * 53) % 97)) for i in range(40)]
    crows = [(i, float((i * 61) % 103), float((i * 29) % 89)) for i in range(60)]
    qs = _pts(spark, qrows, "point_id")
    cs = _pts(spark, crows, "corpus_id")
    d_int = 1 << 24  # ~3 units in a 100-unit domain
    want = _brute(spark, qs, cs, scaling, d_int)
    for gsize in (1, 16, 64):
        got = {
            (r["point_id"], r["corpus_id"], r["dist2"])
            for r in dist_join(
                qs, cs, scaling, GridSpec(gsize), d_int=d_int
            ).collect()
        }
        assert got == want, f"gsize={gsize}: {len(got)} vs brute {len(want)}"
    assert len(want) > 0  # fixture sanity: the radius actually matches pairs


def test_dist_join_zero_radius_hits_coincident_only(spark):
    scaling = Scaling.from_bbox(0.0, 10.0, 0.0, 10.0)
    qs = _pts(spark, [(1, 2.0, 2.0), (2, 9.0, 9.0)], "point_id")
    cs = _pts(spark, [(10, 2.0, 2.0), (11, 5.0, 5.0)], "corpus_id")
    out = dist_join(qs, cs, scaling, GridSpec(8), d_int=0).collect()
    assert [(r["point_id"], r["corpus_id"], r["dist2"]) for r in out] == [(1, 10, 0)]


def test_dist_join_empty_corpus(spark):
    scaling = Scaling.from_bbox(0.0, 10.0, 0.0, 10.0)
    qs = _pts(spark, [(1, 2.0, 2.0)], "point_id")
    cs = _pts(spark, [], "corpus_id")
    assert dist_join(qs, cs, scaling, GridSpec(8), d_int=1 << 20).count() == 0
