"""Unit tests for union_area (operators/sweep.py), dwell_segments
(operators/knn.py) and collocations (functions/textops.py) — the entry
oracle mirrors cover the fixture shapes; these pin the geometry and
segmentation edge cases against brute force."""

import numpy as np



from rayjoin_spark.functions.textops import collocations
from rayjoin_spark.operators.knn import dwell_segments
from rayjoin_spark.operators.sweep import union_area


def _rects(spark, rows):
    return spark.createDataFrame(rows, "x1 long, y1 long, x2 long, y2 long")


def _brute_union(rows):
    """Rasterize half-open boxes on a dense grid — exact for int coords."""
    xs = [r[0] for r in rows] + [r[2] for r in rows]
    ys = [r[1] for r in rows] + [r[3] for r in rows]
    x0, y0 = min(xs), min(ys)
    g = np.zeros((max(xs) - x0, max(ys) - y0), dtype=bool)
    for (x1, y1, x2, y2) in rows:
        if x1 < x2 and y1 < y2:
            g[x1 - x0:x2 - x0, y1 - y0:y2 - y0] = True
    return int(g.sum())


def test_union_area_overlap_nested_disjoint(spark):
    rows = [
        (0, 0, 10, 10),      # base
        (5, 5, 15, 15),      # overlaps base
        (2, 2, 4, 4),        # nested inside base
        (100, 100, 103, 101),  # disjoint sliver
        (7, 7, 7, 20),       # degenerate (zero width) — dropped
    ]
    got = union_area(_rects(spark, rows), tile_shift=3)  # 8-wide tiles
    total = sum(r["area"] for r in got.collect())
    assert total == _brute_union(rows)


def test_union_area_negative_coords_and_tile_edges(spark):
    # boxes straddling 0 and exact tile boundaries (shift 2 -> width 4)
    rows = [(-5, -5, 5, 5), (-8, 0, 0, 4), (4, -4, 8, 8)]
    got = union_area(_rects(spark, rows), tile_shift=2)
    total = sum(r["area"] for r in got.collect())
    assert total == _brute_union(rows)
    # per-tile areas must each fit within one tile's capacity
    assert all(0 < r["area"] <= 16 for r in got.collect())


def test_union_area_tile_invariance(spark):
    rows = [(0, 0, 33, 7), (10, 3, 40, 21), (-3, -3, 12, 40)]
    want = _brute_union(rows)
    for shift in (1, 4, 10):
        got = union_area(_rects(spark, rows), tile_shift=shift)
        assert sum(r["area"] for r in got.collect()) == want, shift


def _route(spark, rows):
    return spark.createDataFrame(
        rows, "route_id long, seq long, lon_udeg long, lat_udeg long"
    )


def test_dwell_segments_splits_on_jump(spark):
    # route 1: three near-identical points (legs ~0), a hemisphere jump,
    # then two more near points -> two segments, first is a dwell.
    rows = [
        (1, 0, 0, 0),
        (1, 1, 1000, 0),       # ~111 m
        (1, 2, 2000, 0),
        (1, 3, 170_000_000, 0),  # jump ~ antipodal-ish
        (1, 4, 170_001_000, 0),
    ]
    got = {r["seg_id"]: r for r in dwell_segments(
        _route(spark, rows), jump_m=1_000_000, min_pts=3
    ).collect()}
    assert len(got) == 2
    assert got[1]["n_points"] == 3 and got[1]["is_dwell"]
    assert got[1]["start_seq"] == 0 and got[1]["end_seq"] == 2
    assert 0 < got[1]["intra_m"] < 1_000_000
    assert got[2]["n_points"] == 2 and not got[2]["is_dwell"]
    # the jump leg belongs to no segment
    assert got[2]["intra_m"] < 1_000_000


def test_dwell_segments_single_point_routes(spark):
    rows = [(7, 0, 0, 0), (8, 0, 50_000_000, 10_000_000)]
    got = dwell_segments(_route(spark, rows), jump_m=10, min_pts=1).collect()
    assert len(got) == 2
    assert all(r["n_points"] == 1 and r["intra_m"] == 0 and r["is_dwell"]
               for r in got)


def test_collocations_counts_and_threshold(spark):
    docs = spark.createDataFrame(
        [("new york city",), ("new york state",), ("old york",)],
        "text string",
    )
    # unigrams: new=2 york=3 city=1 state=1 old=1 -> N=8; bigrams:
    # (new,york)=2 (york,city)=1 (york,state)=1 (old,york)=1 -> M=5
    rows = collocations(docs, min_count=2, ratio_num=1, ratio_den=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["n_ab"], r["n_a"], r["n_b"]) == (
        "new", "york", 2, 2, 3
    )
    # ratio = n_ab*N^2/(M*n_a*n_b) = 2*64/(5*6) = 4.27; threshold 5/1 kills it
    assert collocations(docs, min_count=2, ratio_num=5, ratio_den=1).count() == 0


def test_collocations_min_count(spark):
    docs = spark.createDataFrame([("a b c",), ("b c d",)], "text string")
    got = {(r["w1"], r["w2"]) for r in
           collocations(docs, min_count=2, ratio_num=1, ratio_den=1).collect()}
    assert got == {("b", "c")}


def test_skipgram_pairs_window_and_canonical(spark):
    from rayjoin_spark.functions.textops import skipgram_pairs

    docs = spark.createDataFrame([("a b c a",), ("b a x",)], "text string")
    # window=2 unordered pairs doc1: (a,b)d1 (b,c)d1 (c,a)d1 (a,c)d2 (b,a)d2
    #   -> canonical: ab, bc, ac, ac, ab ; doc2: (a,b) (a,x) via d1, (b,x) d2
    # counts: ab=3 ac=2 bc=1 bx=1 ax=1 ; M=8; N=7 (a=3 b=2 c=1 x=1)
    got = {(r["w1"], r["w2"]): (r["n_ab"], r["n_a"], r["n_b"])
           for r in skipgram_pairs(docs, window=2, min_count=2,
                                   ratio_num=1, ratio_den=1).collect()}
    assert got[("a", "b")] == (3, 3, 2)
    assert got[("a", "c")] == (2, 3, 1)
    assert set(got) == {("a", "b"), ("a", "c")}


def test_skipgram_repeated_token_self_pair(spark):
    from rayjoin_spark.functions.textops import skipgram_pairs

    docs = spark.createDataFrame([("go go go",)], "text string")
    got = {(r["w1"], r["w2"]): r["n_ab"]
           for r in skipgram_pairs(docs, window=2, min_count=2,
                                   ratio_num=1, ratio_den=100).collect()}
    # pairs: d1: (go,go)x2; d2: (go,go)x1 -> self-pair count 3
    assert got == {("go", "go"): 3}
