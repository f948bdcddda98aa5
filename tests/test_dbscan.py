"""DBSCAN semantics on crafted layouts: core/border/noise, bridge
merging, deterministic MIN-label border assignment."""

from rayjoin_spark.operators.dbscan import dbscan
from rayjoin_spark.plans.scaling import GridSpec, Scaling

IDENT = Scaling.identity()


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    out = dbscan(df, IDENT, GridSpec(16), eps_int=eps, min_pts=min_pts)
    return {r.point_id: (r.cluster_id, r.kind) for r in out.collect()}


def test_dbscan_core_border_noise(spark):
    # cluster A: 4 mutually-close points (all core at min_pts=4);
    # border: within eps of one A-core but itself has only 2 neighbors;
    # noise: far away
    a = [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 0.0, 10.0), (4, 10.0, 10.0)]
    # (25,0) reaches cores 2 (d=15) and 4 (d~18.03) but its own
    # neighborhood is {2, 4, self} = 3 < min_pts -> border, not core
    border = [(5, 25.0, 0.0)]
    noise = [(9, 1000.0, 1000.0)]
    got = _run(spark, a + border + noise, eps=20, min_pts=4)
    assert got[1] == (1, "core") and got[4] == (1, "core")
    assert got[5] == (1, "border")
    assert got[9] == (-1, "noise")


def test_dbscan_bridge_merges_and_min_label(spark):
    # two 4-cliques joined by a chain of core points -> ONE cluster
    # labeled by the global min id
    left = [(10, 0.0, 0.0), (11, 5.0, 0.0), (12, 0.0, 5.0), (13, 5.0, 5.0)]
    right = [(20, 100.0, 0.0), (21, 105.0, 0.0), (22, 100.0, 5.0), (23, 105.0, 5.0)]
    # bridge points each see 2 chain neighbors + nothing else -> they are
    # only core if min_pts small; use min_pts=3 so chain points (self + 2)
    # are core and the components connect
    bridge = [(30 + i, 5.0 + 10.0 * i, 0.0) for i in range(1, 10)]
    got = _run(spark, left + right + bridge, eps=12, min_pts=3)
    labels = {v[0] for v in got.values()}
    assert labels == {10}, got  # everything one cluster, min id 10
    assert all(v[1] == "core" for v in got.values())


def test_dbscan_all_noise_and_empty_clusters(spark):
    pts = [(i, float(i * 1000), 0.0) for i in range(5)]
    got = _run(spark, pts, eps=10, min_pts=2)
    assert all(v == (-1, "noise") for v in got.values())
