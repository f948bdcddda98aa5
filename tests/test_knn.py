"""knn_points vs a brute-force oracle (exact integer distances), incl.
the annulus-batching edge cases: sparse corpora that survive many empty
windows, ties exactly at the covered radius, and k > |corpus|."""

from pyspark.sql import functions as F

from rayjoin_spark.operators.knn import knn_points
from rayjoin_spark.plans.scaling import GridSpec, Scaling


def _brute(qs, cs, k, sc):
    out = {}
    for qid, qx, qy in qs:
        qxi, qyi = sc.scale_xy(qx, qy)
        cand = []
        for cid, x, y in cs:
            xi, yi = sc.scale_xy(x, y)
            cand.append(((xi - qxi) ** 2 + (yi - qyi) ** 2, cid))
        out[qid] = sorted(cand)[:k]
    return out


def _run(spark, qs, cs, k, gsize):
    qdf = spark.createDataFrame(qs, "point_id long, x double, y double")
    cdf = spark.createDataFrame(cs, "corpus_id long, x double, y double")
    sc = Scaling.identity()
    got = {}
    rows = knn_points(qdf, cdf, sc, GridSpec(gsize), k=k).collect()
    for r in rows:
        got.setdefault(r["point_id"], []).append(
            (r["rank"], r["dist2"], r["corpus_id"])
        )
    return {
        q: [(d, c) for _, d, c in sorted(v)] for q, v in got.items()
    }, sc


def test_knn_matches_bruteforce_dense_and_grid_invariant(spark):
    import random

    rng = random.Random(7)
    cs = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(400)]
    qs = [(i, rng.uniform(-5, 105), rng.uniform(-5, 105)) for i in range(60)]
    sc = Scaling.identity()
    want = _brute(qs, cs, 5, sc)
    for gsize in (1, 16, 64):
        got, _ = _run(spark, qs, cs, 5, gsize)
        assert got == want, gsize


def test_knn_sparse_corpus_and_k_exceeds_corpus(spark):
    # 3 corpus points in a 256-cell grid: queries must expand far and
    # still return ALL points (k=5 > |corpus|=3) in exact order
    cs = [(1, 10.0, 10.0), (2, 90.0, 90.0), (3, 90.0, 10.0)]
    qs = [(0, 0.0, 0.0), (1, 50.0, 50.0), (2, 100.0, 100.0)]
    sc = Scaling.identity()
    want = _brute(qs, cs, 5, sc)
    got, _ = _run(spark, qs, cs, 5, 256)
    assert got == want


def test_knn_tie_at_covered_radius_and_id_tiebreak(spark):
    # two corpus points exactly equidistant: ranks decided by id; a third
    # point farther out must not displace them
    cs = [(7, 0.0, 5.0), (3, 5.0, 0.0), (9, 12.0, 0.0)]
    qs = [(0, 0.0, 0.0)]
    sc = Scaling.identity()
    want = _brute(qs, cs, 2, sc)
    got, _ = _run(spark, qs, cs, 2, 32)
    assert got == want
