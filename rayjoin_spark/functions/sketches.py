"""Deterministic sketch operators: count-min heavy hitters.

The count-min sketch (Cormode & Muthukrishnan 2005, "An Improved Data
Stream Summary: The Count-Min Sketch and its Applications") is the
canonical sub-linear frequency summary a 100-TB pipeline uses when the
exact per-term count table itself is too hot to materialize or must be
merged across streams/shards: the sketch is a fixed (depth x width)
integer grid, built with ONE map-side-combinable groupBy, mergeable by
cell-wise addition, and every estimate is an upper bound on the true
count (est >= exact, with overestimate probability bounds from the
paper).

Module contract (same as textops): every hash is md5-hex derived —
``bucket_j(term) = int(md5(j || ':' || term)[:12 hex], 16) % width`` —
so an independent SQL engine reproduces the sketch bit-for-bit; no JVM
hash, no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(j, term, width: int):
    h = F.md5(F.encode(F.concat(j.cast("string"), F.lit(":"), term), "UTF-8"))
    return F.pmod(F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint"), F.lit(width))


def cms_build(
    stream: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch from a term stream (one row per occurrence):
    (j, bucket, cnt) with exactly one explode (factor = depth, a small
    constant) and one combinable groupBy. The result is depth*width rows
    — broadcast-sized regardless of corpus size, and two sketches built
    with the same (depth, width) merge by summing cnt per (j, bucket)."""
    jt = stream.select(F.col(term_col).alias("_t")).withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    return (
        jt.select("j", _bucket(F.col("j"), F.col("_t"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each row of `terms`: the estimate is
    the MIN over the depth rows of the addressed cells — always >= the
    true count. An addressed cell with NO sketch row is an implicit zero
    (the sketch only materializes touched cells), so the join is a LEFT
    join with coalesce-to-0: a term absent from the build stream whose
    cells are all untouched estimates 0, and one empty cell zeroes the
    min even when the others collide. The sketch side is depth*width rows
    and is explicitly broadcast; the term side streams (no shuffle of the
    corpus)."""
    jt = terms.select(F.col(term_col).alias(term_col)).withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    addressed = jt.withColumn("bucket", _bucket(F.col("j"), F.col(term_col), width))
    return (
        addressed.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    depth: int = 4,
    width: int = 1024,
    denom: int = 200,
) -> DataFrame:
    """Heavy hitters over the whitespace token stream: terms whose
    count-min estimate is at least total_tokens/denom (the phi-frequent
    set, phi = 1/denom). Emits (term, est, n_exact) — the exact count
    rides along to exhibit the sketch's one-sided error (est >= n_exact
    for every row; at width >> #hot-terms the two coincide).

    Scale shape: token stream -> depth-bounded explode -> ONE combinable
    groupBy builds the broadcast-sized sketch; estimates join the
    distinct-term table against the BROADCAST sketch (corpus never
    reshuffles); the threshold scalar rides a broadcast 1-row cross
    join. At 100 TB the sketch is the only state that crosses machines —
    that is the point of the operator."""
    toks = (
        df.select(F.explode(F.split(F.trim(F.lower(F.col(text))), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
    )
    toks = toks.localCheckpoint(eager=True)  # reused by sketch + exact + total
    sketch = cms_build(toks, "term", depth, width)
    exact = toks.groupBy("term").agg(F.count("*").cast("bigint").alias("n_exact"))
    est = cms_estimate(sketch, exact.select("term"), "term", depth, width)
    tot = toks.agg(F.count("*").cast("bigint").alias("_n"))
    return (
        est.join(exact, "term")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("est") >= F.expr(f"_n DIV {denom}"))
        .select("term", "est", "n_exact")
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Bloom filter of a key set (Bloom 1970): the set-bit table
    ``(j, bit)`` with ``bit_j(key) = md5-bucket`` (module contract above —
    bit-for-bit reproducible in any SQL engine). Built with one
    depth-bounded explode + distinct; at most depth*width rows no matter
    the corpus size, so the filter BROADCASTS. Two filters with the same
    (depth, width) merge by union+distinct — the per-shard / per-day
    incremental-dedup shape: yesterday's corpus filter is tiny state,
    today's batch probes it without ever reshuffling the corpus."""
    jt = keys.select(F.col(key_col).alias("_k")).withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    return (
        jt.select("j", _bucket(F.col("j"), F.col("_k"), width).alias("bit"))
        .distinct()
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Probe the filter: ``(key, maybe_present)`` per distinct batch key,
    maybe_present = 1 iff ALL depth addressed bits are set. One-sided by
    construction — a key that was in the built set always reports 1 (no
    false negatives); a fresh key reports 1 only on a hash collision of
    all depth bits. The bloom side joins BROADCAST; the batch side does
    one combinable groupBy on the key — nothing corpus-sized shuffles."""
    jt = batch.select(F.col(key_col)).distinct().withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    addressed = jt.withColumn("bit", _bucket(F.col("j"), F.col(key_col), width))
    hits = addressed.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), ["j", "bit"], "left"
    )
    return hits.groupBy(key_col).agg(
        (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == depth)
        .cast("int")
        .alias("maybe_present")
    )


#: HLL hash width: 12 md5 hex chars (the module's md5-derivation contract)
_HLL_BITS = 48
#: fixed-point scale exponent for the exact register sum (2^_HLL_K per
#: empty register; every term 2^(_HLL_K - rho) stays a positive int64)
_HLL_K = 50


def hll_sketch(
    df: DataFrame,
    key_col: str = "key",
    group_cols: tuple[str, ...] = (),
    b: int = 10,
) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) per group:
    ``(group..., bucket, max_rho)`` with bucket = top `b` bits of the
    48-bit md5-derived hash and rho = 1 + leading zeros of the remaining
    bits (computed EXACTLY via the binary-string length, no float log).

    The killer property for 100 TB: duplicates collapse inside the ONE
    map-side-combinable groupBy (max absorbs them) — no distinct, no
    second shuffle — and sketches merge by per-bucket max, so per-shard /
    per-day register tables (<= 2^b rows each) compose into global
    cardinalities without ever touching the raw keys again.

    NULL keys denote no element and are dropped (md5(NULL) is NULL and
    would otherwise emit a phantom NULL-bucket register that inflates the
    estimator's used-register count)."""
    df = df.filter(F.col(key_col).isNotNull())
    h = F.conv(
        F.substring(F.md5(F.encode(F.col(key_col).cast("string"), "UTF-8")), 1, 12),
        16,
        10,
    ).cast("bigint")
    wbits = _HLL_BITS - b
    bucket = F.shiftright(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    bitlen = F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.conv(w.cast("string"), 10, 2))
    )
    rho = (F.lit(wbits + 1) - bitlen).cast("int")
    keyed = df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
    return keyed.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("max_rho"))


def hll_estimate(
    sketch: DataFrame,
    group_cols: tuple[str, ...] = (),
    b: int = 10,
) -> DataFrame:
    """Integer-exact raw HLL estimate per group from the register table:

    est_raw = floor( alpha_m * m^2 / sum_j 2^(-M_j) ), with the harmonic
    sum carried as the EXACT integer S = sum 2^(K - M_j) (empty registers
    contribute 2^K) and alpha_m = 0.7213/(1 + 1.079/m) rewritten as the
    exact rational 7213*m / (10000*m + 10790) — so
    est_raw = 7213 * m^3 * 2^K div ((10000*m + 10790) * S), one
    decimal(38,0) integral division, reproducible bit-for-bit in any
    engine. Emits v_empty (zero registers) alongside so consumers can
    apply the paper's small-range linear-counting correction (which
    needs a log and is deliberately left float-free out of the core)."""
    m = 1 << b
    n0 = 7213 * (m ** 3) * (1 << _HLL_K)
    c = 10000 * m + 10790
    # the harmonic sum is carried in DECIMAL(38,0): each term fits int64,
    # but the SUM (and the empty-register term (m-_used)*2^K) reach
    # 2^(b+K), past int64 for b >= 14 — the standard HLL precision
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("_used"),
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {_HLL_K} - max_rho)"
                f" AS DECIMAL(38,0))"
            )
        ).alias("_s_used"),
    )
    return agg.select(
        *group_cols,
        (F.lit(m).cast("bigint") - F.col("_used")).alias("v_empty"),
        F.expr(
            f"CAST('{n0}' AS DECIMAL(38,0)) div "
            f"(CAST({c} AS DECIMAL(38,0)) * "
            f"CAST(_s_used + CAST({m} - _used AS DECIMAL(38,0))"
            f" * CAST({1 << _HLL_K} AS DECIMAL(38,0)) AS DECIMAL(38,0)))"
        ).alias("est_raw"),
    )
