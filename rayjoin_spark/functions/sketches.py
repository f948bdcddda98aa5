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
    true count. The sketch side is depth*width rows and is explicitly
    broadcast; the term side streams (no shuffle of the corpus)."""
    jt = terms.select(F.col(term_col).alias(term_col)).withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    addressed = jt.withColumn("bucket", _bucket(F.col("j"), F.col(term_col), width))
    return (
        addressed.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(term_col)
        .agg(F.min("cnt").alias("est"))
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
