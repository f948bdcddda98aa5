"""Integer PageRank / degree stats / inverted index tests."""

from pyspark.sql import functions as F

from rayjoin_spark.operators import graph
from rayjoin_spark.functions import textops


def _py_pagerank(edges, iters, scale=1_000_000, dn=85, dd=100):
    """Pure-python mirror of the documented truncating-integer update."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (scale * (dd - dn)) // dd
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // deg[s]
        rank = {n: base + (dn * inflow[n]) // dd for n in nodes}
    return rank


EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("d", "b"), ("a", "e"),
]


def test_pagerank_matches_python_mirror(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=3).collect()}
    assert got == _py_pagerank(EDGES, iters=3)
    # node e is dangling (no out-edges): still ranked, receives inflow
    assert "e" in got and got["e"] > 0


def test_pagerank_partitioning_invariant(spark):
    df2 = spark.createDataFrame(EDGES, "src string, dst string").repartition(7)
    df1 = spark.createDataFrame(EDGES, "src string, dst string").coalesce(1)
    r2 = {r["node"]: r["rank"] for r in graph.pagerank(df2, iters=4).collect()}
    r1 = {r["node"]: r["rank"] for r in graph.pagerank(df1, iters=4).collect()}
    assert r1 == r2


def test_degree_stats(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in graph.degree_stats(df).collect()}
    assert got == {
        "a": (2, 2), "b": (1, 2), "c": (1, 1), "d": (2, 0), "e": (0, 1),
    }


def test_inverted_index_cap_and_order(spark):
    docs = [(i, "common unique%d" % i) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["term"]: r for r in textops.inverted_index(df, max_postings=5).collect()}
    c = rows["common"]
    # doc_freq counts ALL docs; postings capped at the 5 LOWEST ids ascending
    assert c["doc_freq"] == 30
    assert c["postings"] == "0,1,2,3,4"
    assert rows["unique7"]["doc_freq"] == 1
    assert rows["unique7"]["postings"] == "7"


def test_inverted_index_per_doc_dedup(spark):
    df = spark.createDataFrame([(1, "x x x y"), (2, "y")], "doc_id long, text string")
    rows = {r["term"]: r for r in textops.inverted_index(df).collect()}
    assert rows["x"]["doc_freq"] == 1  # repeated within doc counts once
    assert rows["y"]["doc_freq"] == 2
    assert rows["y"]["postings"] == "1,2"


def test_hits_zero_iters_identity(spark):
    from rayjoin_spark.operators.graph import hits

    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, iters=0).collect()}
    assert set(out) == {"a", "b", "c"}
    assert all(h > 0 and a == 0 for h, a in out.values())
