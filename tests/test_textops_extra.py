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


def test_topk_per_group_matches_single_window(spark):
    # 40 rows, 2 groups, deterministic scores with duplicates (ties
    # must break on lowest id); tiny n_buckets exercises the two-phase
    # path where several buckets contribute survivors.
    rows = [(i, f"g{i % 2}", float((i * 7) % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, quality double")
    got = textops.topk_per_group(
        df, "source", "quality", "doc_id", k=3, n_buckets=4
    ).collect()
    # brute-force expected top-3 per group: score desc, id asc
    exp = {}
    for g in ("g0", "g1"):
        mem = sorted(
            [r for r in rows if r[1] == g], key=lambda r: (-r[2], r[0])
        )[:3]
        exp[g] = [(r[0], rank + 1) for rank, r in enumerate(mem)]
    assert sorted((r["source"], r["doc_id"], r["rank"]) for r in got) == sorted(
        (g, i, rk) for g, lst in exp.items() for i, rk in lst
    )


def test_dedup_keep_best_prefers_quality_then_id(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)],
        "doc_id bigint, cluster_id bigint",
    )
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)],
        "doc_id bigint, quality double",
    )
    out = {r["doc_id"]: r for r in textops.dedup_keep_best(scored, clusters).collect()}
    # cluster 1: quality tie 2 vs 3 -> lowest id 2 kept
    assert out[2]["keep"] and out[2]["kept_id"] == 2
    assert not out[1]["keep"] and out[1]["kept_id"] == 2 and not out[3]["keep"]
    # singleton keeps itself
    assert out[4]["keep"] and out[4]["kept_id"] == 4


def test_dup_spans_counts_cross_doc_only(spark):
    shared = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            (1, shared + " tail1 tail2"),          # 10 toks -> 3 windows
            (2, "head " + shared),                 # 9 toks -> 2 windows
            (3, "a b c d e f g h a b c d e f g h"),  # intra-doc repeat only
            (4, "short text"),                     # < w tokens -> 0 windows
        ],
    )
    rows = {r["doc_id"]: r for r in textops.dup_spans(df, w=8).collect()}
    # docs 1 and 2 share exactly the window starting at 'one'
    assert rows[1]["n_windows"] == 3 and rows[1]["n_dup_windows"] == 1
    assert rows[2]["n_windows"] == 2 and rows[2]["n_dup_windows"] == 1
    assert rows[1]["dup_frac"] == pytest.approx(1 / 3)
    # doc 3's repeated window exists in no OTHER doc: count_distinct
    # docs per gram is 1, so nothing is flagged
    assert rows[3]["n_dup_windows"] == 0 and rows[3]["n_windows"] == 9
    # sub-window doc still appears, with zero counts and frac 0.0
    assert rows[4]["n_windows"] == 0 and rows[4]["dup_frac"] == 0.0


def test_mix_sources_deterministic_repeats(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", "t") for i in range(30)],
        "doc_id bigint, source string, text string",
    )
    out = textops.mix_sources(
        df, {"s0": 3.0, "s1": 0.5, "s2": 0.0}, default_weight=1.0
    )
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rep"])
    # integer weight 3.0: exactly 3 copies with rep = 1,2,3
    for i in range(0, 30, 3):
        assert sorted(by_doc[i]) == [1, 2, 3]
    # weight 0.0: never emitted
    assert all(i not in by_doc for i in range(2, 30, 3))
    # weight 0.5: 0 or 1 copies, deterministic re-run identical
    s1_docs = [i for i in range(1, 30, 3) if i in by_doc]
    assert all(by_doc[i] == [1] for i in s1_docs)
    again = {
        r["doc_id"]
        for r in textops.mix_sources(
            df, {"s0": 3.0, "s1": 0.5, "s2": 0.0}, default_weight=1.0
        ).collect()
    }
    assert {r["doc_id"] for r in rows} == again


def test_bpe_token_count_segments(spark):
    df = _docs(spark, [(1, "I'll see 42 cats, don't I?"), (2, ""), (3, "abc")])
    rows = {r["doc_id"]: r["n_bpe_tokens"] for r in textops.bpe_token_count(df).collect()}
    # ['I', \"'ll\", ' see', ' 42', ' cats', ',', ' don', \"'t\", ' I', '?']
    assert rows[1] == 10
    assert rows[2] == 0 and rows[3] == 1


def test_ngram_novelty(spark):
    from rayjoin_spark.functions import textops

    rows = [
        (1, "alpha beta gamma delta"),     # grams: a-b-g, b-g-d
        (2, "alpha beta gamma epsilon"),   # shares a-b-g with doc 1
        (3, "one two"),                    # too short: (0, 0)
        (4, "x x x x x"),                  # repeated gram counts once per doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_novel) for r in textops.ngram_novelty(df).collect()}
    assert got[1] == (2, 1)   # "beta gamma delta" novel, "alpha beta gamma" shared
    assert got[2] == (2, 1)
    assert got[3] == (0, 0)
    assert got[4] == (1, 1)   # "x x x" distinct-per-doc -> one gram, df=1


def test_dedup_against(spark):
    from rayjoin_spark.functions import textops

    ref = spark.createDataFrame(
        [(1, "known content"), (2, "other known")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "known content"), (11, "fresh content"), (12, "fresh content")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in textops.dedup_against(new, ref).collect())
    # corpus dup dropped; in-batch dups both kept (documented contract)
    assert kept == [11, 12]


def test_normalize_text_contract(spark):
    """CRLF->LF, NBSP->space, zero-width/soft-hyphen/control removal,
    blank-run + paragraph collapse, trim, null-safe changed flag."""
    rows = [
        (1, "A\u00a0B\u200b\u00adC\r\nD\te   f\n\n\n\n\nG"),
        (2, "clean line"),
        (3, None),
        (4, " x y "),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.norm_text, r.changed) for r in textops.normalize_text(df).collect()}
    assert got[1] == ("A BC\nD e f\n\nG", True)
    assert got[2] == ("clean line", False)
    assert got[3] == ("", True)  # NULL normalizes to '' and counts as changed
    assert got[4] == ("x y", True)


def test_gopher_rules_branches(spark):
    """Hand-computed fixtures hit each Gopher rule independently."""
    from rayjoin_spark.functions.textops import gopher_rules

    rows = [
        # passes everything (7 words, 21 chars, 2 stopwords)
        (1, "the of aaa bbbb ccc ddd eee"),
        # symbol flood + sub-80% alpha words
        (2, "# # # aaa the of bbb"),
        # 2 of 3 lines bullet-led (one literal bullet char)
        (3, "- b\n• c\nthe of words here now"),
        # 2 of 3 lines ellipsis-ended (one unicode ellipsis)
        (4, "the of one two three...\nmore words…\nplain line"),
        # null text: fails word count, everything else vacuous
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df, min_words=5).collect()}

    assert got[1]["keep"] == 1 and all(
        got[1][k] == 1 for k in got[1] if k.startswith("ok_")
    )
    assert got[1]["n_words"] == 7 and got[1]["n_chars"] == 21
    assert got[1]["n_stopwords"] == 2

    assert got[2]["ok_symbols"] == 0 and got[2]["ok_alpha"] == 0
    assert got[2]["keep"] == 0

    assert got[3]["ok_bullets"] == 0 and got[3]["ok_symbols"] == 1
    assert got[4]["ok_ellipsis"] == 0 and got[4]["ok_bullets"] == 1

    assert got[5]["n_words"] == 0 and got[5]["ok_words"] == 0
    assert got[5]["ok_word_len"] == 1 and got[5]["keep"] == 0


def test_gopher_repetition_hand_computed(spark):
    """Exact counters on hand-computed fixtures: duplicate lines,
    paragraph split, top-n-gram char attribution with lexicographic
    tie-break, and the vacuous-empty contract."""
    from rayjoin_spark.functions.textops import gopher_repetition

    long_clean = " ".join(f"w{i:02d}" for i in range(60))
    rows = [
        (1, "aaa bbb\naaa bbb\nccc ddd"),
        (2, long_clean),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}

    g1 = got[1]
    assert (g1["n_lines"], g1["dup_lines"]) == (3, 1)
    assert (g1["line_chars"], g1["dup_line_chars"]) == (21, 7)
    assert (g1["n_paras"], g1["dup_paras"]) == (1, 0)
    assert g1["word_chars"] == 18
    # top 2-gram: "aaa bbb" x2, 6 non-space chars -> 12
    assert g1["top2_chars"] == 12 and g1["ok_top2"] == 0
    # top 3-gram: all cnt=1, lexicographically smallest "aaa bbb aaa" (9)
    assert g1["top3_chars"] == 9
    assert g1["ok_dup_lines"] == 0 and g1["ok_dup_line_chars"] == 0
    assert g1["keep"] == 0

    g2 = got[2]
    assert g2["dup_lines"] == 0 and g2["dup_paras"] == 0
    assert g2["word_chars"] == 180
    assert g2["top2_chars"] == 6 and g2["top3_chars"] == 9
    assert g2["keep"] == 1 and all(
        g2[k] == 1 for k in g2 if k.startswith("ok_")
    )

    g3 = got[3]
    assert g3["n_lines"] == 0 and g3["word_chars"] == 0
    assert g3["keep"] == 1  # all denominators empty -> vacuous pass


def test_ccnet_buckets_tercile_semantics(spark):
    # 9 docs in one lang: 3 seed docs establish the bigram model; the
    # other 6 repeat the seed phrase with increasing amounts of unseen
    # junk, so lm_score strictly decreases with junk count and the
    # tercile split is predictable: higher score -> head.
    seed = "the cat sat on the mat"
    rows = []
    for i in range(3):
        rows.append((i, seed, "en", "seed"))
    for i, junk in enumerate(["q1", "q1 q2", "q1 q2 q3", "q1 q2 q3 q4",
                              "q1 q2 q3 q4 q5", "q1 q2 q3 q4 q5 q6"]):
        rows.append((10 + i, f"{seed} {junk}", "en", "web"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    out = {
        r["doc_id"]: r
        for r in textops.ccnet_buckets(df, train=F.col("source") == "seed").collect()
    }
    assert len(out) == 9
    # pure-seed docs score highest -> head; most-junk docs -> tail
    assert all(out[i]["bucket"] == "head" for i in range(3))
    assert out[15]["bucket"] == "tail"
    # bucket is monotone non-increasing in junk count
    order = {"head": 2, "middle": 1, "tail": 0}
    buckets = [order[out[10 + i]["bucket"]] for i in range(6)]
    assert buckets == sorted(buckets, reverse=True)
    # every doc gets p33 <= p66 and a non-null score
    assert all(r["p33"] <= r["p66"] and r["lm_score"] is not None for r in out.values())


def test_ccnet_buckets_empty_train_all_tail(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en", "web"), (2, "d e f", "en", "web")],
        "doc_id bigint, text string, lang string, source string",
    )
    out = textops.ccnet_buckets(df, train=F.lit(False)).collect()
    assert len(out) == 2
    assert all(r["bucket"] == "tail" and r["lm_score"] is None for r in out)


def test_simhash_neardup_identical_and_validation(spark):
    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different content about integer arithmetic in spark"),
        ],
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in textops.simhash_neardup(df).collect()}
    assert pairs.get((1, 2)) == 0  # identical docs -> identical simhash
    # pigeonhole precondition enforced
    with pytest.raises(ValueError):
        textops.simhash_neardup(df, max_hamming=2, n_bands=2)
    with pytest.raises(ValueError):
        textops.simhash_neardup(df, n_bits=16, n_bands=3)


def test_face_stats_map_id_grouping(spark):
    # review fix: map_id must actually group — same face_id in two maps
    # stays two rows instead of silently merging
    rows = [
        # map 0: unit square CCW, face 1 left of each edge
        (0, 0, 0, 10, 0, 1, 0), (0, 10, 0, 10, 10, 1, 0),
        (0, 10, 10, 0, 10, 1, 0), (0, 0, 10, 0, 0, 1, 0),
        # map 1: 2x2 square CCW, same face id 1
        (1, 0, 0, 2, 0, 1, 0), (1, 2, 0, 2, 2, 1, 0),
        (1, 2, 2, 0, 2, 1, 0), (1, 0, 2, 0, 0, 1, 0),
    ]
    edges = spark.createDataFrame(
        rows,
        "map_id int, x1 bigint, y1 bigint, x2 bigint, y2 bigint,"
        " left_polygon_id bigint, right_polygon_id bigint",
    )
    out = {(r["map_id"], r["face_id"]): r for r in face_stats(edges, map_id="map_id").collect()}
    assert (0, 1) in out and (1, 1) in out
    assert out[(0, 1)]["area2"] == 200   # 2 * 100
    assert out[(1, 1)]["area2"] == 8     # 2 * 4
    # without map_id the faces merge (documented single-layer behavior)
    merged = {r["face_id"]: r for r in face_stats(edges).collect()}
    assert merged[1]["area2"] == 208
