"""Semantic tests for the winnowing / containment / HITS / exact-quantile
wave (oracle parity is covered by test_entry_oracle.py; these pin the
intended semantics on crafted fixtures and python mirrors)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from rayjoin_spark.functions import textops
from rayjoin_spark.operators import graph


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ------------------------------------------------------------- winnowing


def _py_winnow(text, k=9, w=4):
    """Pure-python mirror of the documented selection: k-gram md5s,
    window min with rightmost tiebreak, distinct (pos, hash)."""
    ng = max(len(text) - k + 1, 1)
    hashes = [
        hashlib.md5(text[p : p + k].encode("utf-8")).hexdigest() for p in range(ng)
    ]
    out = set()
    for start in range(max(ng - w + 1, 1)):
        win = hashes[start : start + w]
        m = min(win)
        # rightmost occurrence
        pos = start + max(i for i, h in enumerate(win) if h == m)
        out.add((pos + 1, m))  # 1-based
    return out


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaaaa",  # all-equal hashes: rightmost tiebreak path
        "short",  # shorter than k
        "",  # empty: one gram of ''
        "abcabcabcabcabcabcabc",  # periodic
    ],
)
def test_winnow_matches_python_mirror(spark, text):
    df = _docs(spark, [(1, text)])
    got = {
        (r["pos"], r["fingerprint"])
        for r in textops.winnow_fingerprints(df, k=9, w=4).collect()
    }
    assert got == _py_winnow(text, 9, 4)


def test_winnow_guarantee_shared_substring(spark):
    # winnowing theorem: a shared substring of length >= k + w - 1
    # (= 12 here) must produce at least one shared fingerprint
    shared = "XYZQWERTYUIOPAS"  # 15 chars > 9 + 4 - 1
    df = _docs(
        spark,
        [(1, "prefix one " + shared + " tail a"),
         (2, "completely different " + shared + " end b")],
    )
    fp = textops.winnow_fingerprints(df, k=9, w=4)
    a = {r["fingerprint"] for r in fp.filter(F.col("doc_id") == 1).collect()}
    b = {r["fingerprint"] for r in fp.filter(F.col("doc_id") == 2).collect()}
    assert a & b, "shared substring >= k+w-1 must share a fingerprint"


def test_winnow_density(spark):
    # expected density ~ 2/(w+1); for a random-ish text the selected
    # count must be well below the gram count and above the floor
    text = "the quick brown fox jumps over the lazy dog repeatedly and often"
    n_grams = len(text) - 8
    n_sel = textops.winnow_fingerprints(_docs(spark, [(1, text)]), k=9, w=4).count()
    assert n_grams / 8 <= n_sel <= n_grams / 2 + 2


# ----------------------------------------------------------- containment


def test_containment_embedded_doc(spark):
    # doc 2 is a strict substring of doc 1 -> every 9-shingle of doc 2
    # appears in doc 1: contain_b == 1.0 while jaccard < 0.5
    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    short = "epsilon zeta eta theta"
    df = _docs(spark, [(1, long), (2, short)])
    pairs = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    r = textops.ngram_containment(df, pairs).collect()[0]
    assert r["contain_b"] == pytest.approx(1.0)
    assert r["n_inter"] == r["n_b"]
    assert r["jaccard"] < 0.5
    assert r["contain_a"] == pytest.approx(r["n_inter"] / r["n_a"])


# ------------------------------------------------------------------ HITS


def _py_hits(edges, iters=3, scale=1_000_000):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(iters):
        raw_a = {n: 0 for n in nodes}
        for s, d in edges:
            raw_a[d] += hub[s]
        mx = max(max(raw_a.values()), 1)
        auth = {n: (raw_a[n] * scale) // mx for n in nodes}
        raw_h = {n: 0 for n in nodes}
        for s, d in edges:
            raw_h[s] += auth[d]
        mx = max(max(raw_h.values()), 1)
        hub = {n: (raw_h[n] * scale) // mx for n in nodes}
    return hub, auth


EDGES = [
    ("hub1", "auth1"), ("hub1", "auth2"), ("hub1", "auth3"),
    ("hub2", "auth1"), ("hub2", "auth2"),
    ("auth1", "auth2"),  # an authority that also links out a little
]


def test_hits_matches_python_mirror(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: (r["hub"], r["auth"]) for r in graph.hits(df, iters=3).collect()}
    hub, auth = _py_hits(EDGES, iters=3)
    assert got == {n: (hub[n], auth[n]) for n in hub}
    # hub1 links to all three authorities: it must be the top hub (scale)
    assert got["hub1"][0] == 1_000_000
    # auth2 is cited by every hub: top authority
    assert got["auth2"][1] == 1_000_000
    # pure hubs have zero authority; pure authorities zero hub
    assert got["hub1"][1] == 0 and got["auth3"][0] == 0


def test_hits_partitioning_invariant(spark):
    df7 = spark.createDataFrame(EDGES, "src string, dst string").repartition(7)
    df1 = spark.createDataFrame(EDGES, "src string, dst string").coalesce(1)
    a = sorted(map(tuple, graph.hits(df7, iters=2).collect()))
    b = sorted(map(tuple, graph.hits(df1, iters=2).collect()))
    assert a == b


# ------------------------------------------------------- exact quantiles


def _py_quantile(vals, q):
    s = sorted(vals)
    return s[((len(s) - 1) * q) // 100]


def test_exact_quantiles_mirror(spark):
    rows = [("en", v) for v in [5, 1, 9, 3, 7, 11, 2]] + [("de", v) for v in [4, 4, 8]]
    df = spark.createDataFrame(rows, "lang string, len bigint")
    got = {r["lang"]: r for r in textops.exact_quantiles(df, "lang", "len").collect()}
    en = [v for l, v in rows if l == "en"]
    de = [v for l, v in rows if l == "de"]
    for lang, vals in (("en", en), ("de", de)):
        assert got[lang]["n_rows"] == len(vals)
        for q in (25, 50, 75):
            assert got[lang][f"p{q}"] == _py_quantile(vals, q), (lang, q)


def test_exact_quantiles_single_value_group(spark):
    df = spark.createDataFrame([("x", 42)], "g string, v bigint")
    r = textops.exact_quantiles(df, "g", "v").collect()[0]
    assert (r["p25"], r["p50"], r["p75"]) == (42, 42, 42) and r["n_rows"] == 1
