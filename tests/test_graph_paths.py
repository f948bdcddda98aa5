"""bfs_hops / sssp semantics on crafted graphs (cycles, unreachable
nodes, late-round improvements, seed re-reach)."""

from rayjoin_spark.operators.graph import bfs_hops, sssp


def _edges(spark, rows, with_w=False):
    schema = "src string, dst string" + (", w long" if with_w else "")
    return spark.createDataFrame(rows, schema)


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_bfs_cycle_unreachable_and_seed_min(spark):
    # a -> b -> c -> a cycle, c -> d chain, e isolated (unreachable)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("x", "e")])
    got = {r.node: r.hops for r in bfs_hops(e, _seeds(spark, ["a"]), max_hops=8).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # seed re-reached through the cycle stays 0; two seeds take the min
    got2 = {r.node: r.hops for r in bfs_hops(e, _seeds(spark, ["a", "c"])).collect()}
    assert got2 == {"a": 0, "c": 0, "b": 1, "d": 1}


def test_bfs_max_hops_cap(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    e = _edges(spark, chain)
    got = {r.node: r.hops for r in bfs_hops(e, _seeds(spark, ["n0"]), max_hops=3).collect()}
    assert got == {"n0": 0, "n1": 1, "n2": 2, "n3": 3}


def test_sssp_prefers_cheap_long_path(spark):
    # direct a->d costs 10; a->b->c->d costs 1+1+1=3 (longer but cheaper);
    # early rounds see 10 first, later rounds must improve it
    e = _edges(
        spark,
        [("a", "d", 10), ("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "z", 2)],
        with_w=True,
    )
    got = {r.node: r.cost for r in sssp(e, _seeds(spark, ["a"]), max_rounds=8).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "z": 5}


def test_sssp_round_cap_is_the_contract(spark):
    # with max_rounds=1 only 1-edge paths count: d keeps the direct 10
    e = _edges(
        spark,
        [("a", "d", 10), ("a", "b", 1), ("b", "c", 1), ("c", "d", 1)],
        with_w=True,
    )
    got = {r.node: r.cost for r in sssp(e, _seeds(spark, ["a"]), max_rounds=1).collect()}
    assert got == {"a": 0, "b": 1, "d": 10}
    # zero-weight edges are fine (nonnegative contract)
    e2 = _edges(spark, [("a", "b", 0), ("b", "c", 0)], with_w=True)
    got2 = {r.node: r.cost for r in sssp(e2, _seeds(spark, ["a"])).collect()}
    assert got2 == {"a": 0, "b": 0, "c": 0}
