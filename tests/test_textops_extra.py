"""Semantic tests for the round-4 pipeline additions: tf-idf top-k,
intra-doc repetition, deterministic sharding, sequence packing, and the
exact face-statistics operator. (Oracle parity is covered separately by
test_entry_oracle.py; these pin the *intended* semantics on crafted
fixtures.)"""

import pytest
from pyspark.sql import functions as F

from rayjoin_spark.functions import textops
from rayjoin_spark.operators.faces import face_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tfidf_rare_term_wins(spark):
    # "zebra" appears once in doc 1 only; "common" appears in all docs.
    df = _docs(
        spark,
        [
            (1, "common zebra common"),
            (2, "common common word"),
            (3, "common word word"),
        ],
    )
    out = textops.tfidf_topk(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # doc 1's top term must be the rare 'zebra' despite tf(common)=2:
    # score(zebra) = 1 * (3_000_000 // 1); score(common) = 2 * (3_000_000 // 3)
    assert top[1] == "zebra"
    # ties broken by term ascending, rank is dense from 1
    assert all(r["rank"] == 1 for r in out)


def test_tfidf_tie_breaks_on_term(spark):
    df = _docs(spark, [(1, "bb aa"), (2, "aa bb")])
    out = textops.tfidf_topk(df, k=2).filter(F.col("doc_id") == 1).collect()
    assert [r["term"] for r in sorted(out, key=lambda r: r["rank"])] == ["aa", "bb"]


def test_repetition_ratio_exact_counts(spark):
    # 9 tokens -> 7 3-grams; the cyclic repeat has only 3 distinct grams.
    df = _docs(spark, [(1, "a b c a b c a b c"), (2, "x y"), (3, "p q r s")])
    rows = {r["doc_id"]: r for r in textops.repetition_ratio(df, n=3).collect()}
    assert rows[1]["total_ngrams"] == 7 and rows[1]["distinct_ngrams"] == 3
    assert rows[1]["rep_ratio"] == pytest.approx(4 / 7)
    # shorter than n: zero grams, ratio 0 (not null)
    assert rows[2]["total_ngrams"] == 0 and rows[2]["rep_ratio"] == 0.0
    # all-distinct: ratio 0
    assert rows[3]["total_ngrams"] == 2 and rows[3]["rep_ratio"] == 0.0


def test_shard_assign_stable_and_bounded(spark):
    df = _docs(spark, [(i, "t") for i in range(200)])
    a = {r["doc_id"]: r["shard"] for r in textops.shard_assign(df, 8).collect()}
    # partitioning must not change the assignment
    b = {
        r["doc_id"]: r["shard"]
        for r in textops.shard_assign(df.repartition(7), 8).collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))
    # md5 keys spread: every shard non-empty at n=200
    assert len(set(a.values())) == 8
    # a different salt reshuffles
    c = {r["doc_id"]: r["shard"] for r in textops.shard_assign(df, 8, salt="v2").collect()}
    assert c != a


def test_pack_sequences_layout_invariants(spark):
    df = _docs(spark, [(i, " ".join(["w"] * (3 + i % 11))) for i in range(120)])
    out = textops.pack_sequences(df, budget=16, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            # end-to-end layout in id order: start = running sum
            assert r["start_off"] == off
            assert r["pack_id"] == off // 16
            assert r["pack_off"] == off % 16
            off += r["n_tokens"]


def _square_edges(spark, face_in, face_out, lo=0, hi=10):
    """CCW square boundary with `face_in` on the left (interior)."""
    pts = [(lo, lo), (hi, lo), (hi, hi), (lo, hi), (lo, lo)]
    rows = [
        (i, x1, y1, x2, y2, face_in, face_out)
        for i, ((x1, y1), (x2, y2)) in enumerate(zip(pts, pts[1:]))
    ]
    return spark.createDataFrame(
        rows,
        "eid bigint, x1 bigint, y1 bigint, x2 bigint, y2 bigint,"
        " left_polygon_id bigint, right_polygon_id bigint",
    )


def test_face_stats_square(spark):
    out = {r["face_id"]: r for r in face_stats(_square_edges(spark, 1, 0)).collect()}
    # CCW interior: area2 = 2 * 100; exterior gets the negation
    assert out[1]["area2"] == 200
    assert out[0]["area2"] == -200
    assert out[1]["n_edges"] == 4 and out[0]["n_edges"] == 4
    assert out[1]["perim2_sum"] == 4 * 100


def test_face_stats_closure_sums_to_zero(spark):
    # two disjoint squares + shared exterior: closed map => total area2 == 0
    e1 = _square_edges(spark, 1, 0, 0, 10)
    e2 = _square_edges(spark, 2, 0, 20, 25)
    tot = (
        face_stats(e1.unionAll(e2))
        .agg(F.sum("area2").alias("s"))
        .collect()[0]["s"]
    )
    assert tot == 0


def test_decontaminate_finds_shared_ngrams(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),       # shares 'alpha beta gamma'
            (2, "nothing in common here"),
            (3, "x y alpha beta gamma"),         # shares it too
        ],
    )
    ev = _docs(spark, [(100, "alpha beta gamma epsilon")])
    out = textops.decontaminate(train, ev, n=3).collect()
    got = {(r["doc_id"], r["eval_id"]): r["n_shared_grams"] for r in out}
    assert got == {(1, 100): 1, (3, 100): 1}


def test_decontaminate_counts_distinct_grams_once(spark):
    # repeated gram in the train doc still counts once (distinct grams)
    train = _docs(spark, [(1, "a b c a b c")])
    ev = _docs(spark, [(9, "a b c")])
    out = textops.decontaminate(train, ev, n=3).collect()
    assert len(out) == 1 and out[0]["n_shared_grams"] == 1


def test_redact_pii(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "server at 192.168.0.1 and 10.0.0.2"),
            (3, "clean text"),
            (4, "a@b.co visits 1.2.3.4"),
        ],
    )
    rows = {r["doc_id"]: r for r in textops.redact_pii(df).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["redacted"] == "mail <EMAIL> now"
    assert rows[2]["n_ips"] == 2 and rows[2]["redacted"] == "server at <IP> and <IP>"
    assert rows[3]["n_emails"] == 0 and rows[3]["n_ips"] == 0
    assert rows[4]["redacted"] == "<EMAIL> visits <IP>"


def test_zonal_stats_conserves_totals(spark):
    from rayjoin_spark.operators.faces import zonal_stats
    from rayjoin_spark.plans.layers import build_edges
    from rayjoin_spark.plans.scaling import GridSpec, compute_scaling
    from rayjoin_spark.sources.datagen import lattice_chains, uniform_points

    ca, pa = lattice_chains(spark, 4)
    scaling = compute_scaling(pa, pa)
    edges = build_edges(ca, pa, scaling)
    pts = uniform_points(spark, 80, -0.5, 4.5, -0.5, 4.5).withColumn(
        "value", F.pmod(F.col("point_id"), F.lit(7))
    )
    z = zonal_stats(pts, edges, scaling, GridSpec(16)).collect()
    # conservation: every point lands in exactly one zone (misses -> face 0)
    assert sum(r["n_points"] for r in z) == 80
    want_sum = pts.agg(F.sum("value")).collect()[0][0]
    assert sum(r["sum_val"] for r in z) == want_sum
    # the -0.5 margin guarantees outside points, so face 0 must appear
    assert any(r["face_id"] == 0 for r in z)
    for r in z:
        assert 0 <= r["min_val"] <= r["max_val"] <= 6
