"""Douglas–Peucker exactness vs an INDEPENDENT recursive
arbitrary-precision implementation, plus the distributed contracts."""

from fractions import Fraction

from pyspark.sql import functions as F

from rayjoin_spark.operators.simplify import dp_keep_mask, simplify_chains


def _dp_recursive(xs, ys, eps2):
    """Independent oracle: textbook recursion, Fraction distances."""
    n = len(xs)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(lo, hi):
        if hi - lo < 2:
            return
        dx, dy = xs[hi] - xs[lo], ys[hi] - ys[lo]
        len2 = dx * dx + dy * dy
        best_k, best_d = -1, Fraction(eps2)
        for k in range(lo + 1, hi):
            px, py = xs[k] - xs[lo], ys[k] - ys[lo]
            if len2 == 0:
                d = Fraction(px * px + py * py)
            else:
                c = dx * py - dy * px
                d = Fraction(c * c, len2)
            if d > best_d:
                best_d, best_k = d, k
        if best_k >= 0:
            keep[best_k] = True
            rec(lo, best_k)
            rec(best_k, hi)

    rec(0, n - 1)
    return keep


def _chain(cid, n=60):
    """Deterministic wiggly integer chain."""
    xs = list(range(n))
    ys = [((cid * 7 + i * i * 31) % 11) - 5 if i % 9 else 0 for i in range(n)]
    return xs, ys


def test_mask_matches_independent_recursion():
    for cid in range(8):
        xs, ys = _chain(cid)
        for eps2 in (0, 1, 4, 25, 10_000):
            assert dp_keep_mask(xs, ys, eps2) == _dp_recursive(xs, ys, eps2), (
                cid,
                eps2,
            )


def test_mask_edge_cases():
    assert dp_keep_mask([0], [0], 4) == [True]
    assert dp_keep_mask([0, 9], [0, 0], 4) == [True, True]
    # exactly-collinear interior points drop at eps2=0
    assert dp_keep_mask([0, 1, 2, 3], [0, 0, 0, 0], 0) == [True, False, False, True]
    # closed loop (p1 == p2): falls back to point distance
    assert dp_keep_mask([0, 5, 0], [0, 0, 0], 16) == [True, True, True]
    assert dp_keep_mask([0, 3, 0], [0, 0, 0], 16) == [True, False, True]


def test_big_zigzag_no_recursion_limit():
    n = 20000
    xs = list(range(n))
    ys = [i % 2 for i in range(n)]
    keep = dp_keep_mask(xs, ys, 0)
    assert all(keep)  # every vertex deviates


def test_simplify_chains_distributed(spark):
    rows = []
    for cid in range(6):
        xs, ys = _chain(cid)
        rows += [(cid, i, xs[i], ys[i]) for i in range(len(xs))]
    df = spark.createDataFrame(rows, "chain_id long, seq int, x long, y long")
    got = simplify_chains(df.repartition(7), eps2=4).collect()
    by_chain = {}
    for r in got:
        by_chain.setdefault(r.chain_id, []).append(r)
    for cid in range(6):
        xs, ys = _chain(cid)
        want = [i for i, k in enumerate(dp_keep_mask(xs, ys, 4)) if k]
        gotc = sorted(by_chain[cid], key=lambda r: r.seq)
        assert [r.seq for r in gotc] == want
        assert [r.new_seq for r in gotc] == list(range(len(want)))
        assert all(r.x == xs[r.seq] and r.y == ys[r.seq] for r in gotc)
