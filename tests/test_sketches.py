"""Count-min sketch semantics: python mirror, one-sided error, merge."""

import hashlib

from pyspark.sql import functions as F

from rayjoin_spark.functions import sketches


def _py_bucket(j, term, width):
    h = hashlib.md5(f"{j}:{term}".encode()).hexdigest()
    return int(h[:12], 16) % width


def _py_cms(terms, depth, width):
    sk = {}
    for t in terms:
        for j in range(depth):
            key = (j, _py_bucket(j, t, width))
            sk[key] = sk.get(key, 0) + 1
    return sk


def test_cms_build_matches_python_mirror(spark):
    terms = ["a", "b", "a", "c", "a", "b"] * 3
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {(r["j"], r["bucket"]): r["cnt"] for r in sketches.cms_build(df, depth=3, width=16).collect()}
    assert got == _py_cms(terms, 3, 16)


def test_cms_estimate_exact_when_no_collisions(spark):
    # width >> vocab: estimates equal exact counts
    terms = ["x"] * 5 + ["y"] * 3 + ["z"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sk = sketches.cms_build(df, depth=4, width=4096)
    q = spark.createDataFrame([("x",), ("y",), ("z",)], "term string")
    got = {r["term"]: r["est"] for r in sketches.cms_estimate(sk, q, depth=4, width=4096).collect()}
    assert got == {"x": 5, "y": 3, "z": 1}


def test_cms_one_sided_error_under_collisions(spark):
    # width 2 forces collisions: every estimate must still be >= exact
    terms = [f"t{i}" for i in range(20)] + ["hot"] * 10
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sk = sketches.cms_build(df, depth=2, width=2)
    q = df.distinct()
    est = {r["term"]: r["est"] for r in sketches.cms_estimate(sk, q, depth=2, width=2).collect()}
    exact = {t: terms.count(t) for t in set(terms)}
    assert all(est[t] >= exact[t] for t in exact)
    assert any(est[t] > exact[t] for t in exact)  # collisions actually occurred


def test_cms_merge_by_cell_addition(spark):
    # sketch(A ∪ B) == cellwise sum of sketch(A) and sketch(B)
    a = spark.createDataFrame([("p",), ("q",), ("p",)], "term string")
    b = spark.createDataFrame([("q",), ("r",)], "term string")
    both = a.unionAll(b)
    sab = sketches.cms_build(both, depth=3, width=8)
    merged = (
        sketches.cms_build(a, depth=3, width=8)
        .unionByName(sketches.cms_build(b, depth=3, width=8))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, sab.collect())) == sorted(map(tuple, merged.collect()))


def test_heavy_hitters_threshold_and_bound(spark):
    docs = [(1, "the the the the the rare"), (2, "the the the word word")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # 11 tokens; denom=3 -> threshold 11 DIV 3 = 3: only 'the' (7) passes
    rows = {r["term"]: r for r in sketches.heavy_hitters(df, denom=3).collect()}
    assert set(rows) == {"the"}
    assert rows["the"]["n_exact"] == 8 and rows["the"]["est"] >= 8


def test_bloom_no_false_negatives_and_merge(spark):
    """Every built key probes present (one-sidedness is structural, not
    probabilistic); filters over disjoint shards merge by union+distinct
    into exactly the filter of the union."""
    from rayjoin_spark.functions.sketches import bloom_build, bloom_probe

    a = spark.createDataFrame([(f"ka{i}",) for i in range(200)], "key string")
    b = spark.createDataFrame([(f"kb{i}",) for i in range(200)], "key string")
    fresh = spark.createDataFrame([(f"new{i}",) for i in range(500)], "key string")

    bloom_a = bloom_build(a, "key").localCheckpoint(eager=True)
    got = {
        r["key"]: r["maybe_present"]
        for r in bloom_probe(a.unionByName(fresh), bloom_a, "key").collect()
    }
    assert all(got[f"ka{i}"] == 1 for i in range(200))  # no false negatives
    # false positives exist in principle but must be rare at m=4096,n=200
    fp = sum(got[f"new{i}"] for i in range(500))
    assert fp <= 25, f"implausible false-positive count {fp}"

    merged = (
        bloom_a.unionByName(bloom_build(b, "key")).distinct().sort("j", "bit")
    )
    direct = bloom_build(a.unionByName(b), "key").sort("j", "bit")
    assert [tuple(r) for r in merged.collect()] == [
        tuple(r) for r in direct.collect()
    ]


def test_hll_accuracy_and_merge(spark):
    """Raw HLL estimate lands within the paper's error envelope at
    n >> 2.5m (m=1024, 1.04/sqrt(m) ~ 3.3%; assert 10%); duplicates do
    not move the registers; per-shard sketches merged by bucket-max
    equal the sketch of the union."""
    from rayjoin_spark.functions.sketches import hll_estimate, hll_sketch

    n = 30_000
    keys = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    sk = hll_sketch(keys, "key")
    est = hll_estimate(sk).collect()[0]
    assert abs(int(est["est_raw"]) - n) / n < 0.10, est["est_raw"]

    # duplicates collapse map-side: tripled input -> identical registers
    tripled = keys.unionByName(keys).unionByName(keys)
    a = sorted(tuple(r) for r in sk.collect())
    b = sorted(tuple(r) for r in hll_sketch(tripled, "key").collect())
    assert a == b

    # shard merge: max per bucket over two halves == sketch of the union
    h1 = keys.filter(F.col("key") < "k2")
    h2 = keys.filter(F.col("key") >= "k2")
    merged = (
        hll_sketch(h1, "key")
        .unionByName(hll_sketch(h2, "key"))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(tuple(r) for r in merged.collect()) == a


def test_hll_streaming_twin(spark, tmp_path):
    """hll_sketch runs UNCHANGED on a stream (stateless column math +
    one streaming max agg): after two micro-batches the complete-mode
    register table equals the batch sketch of the union — the streaming
    distinct-count dashboard comes free."""
    from rayjoin_spark.functions.sketches import hll_sketch

    b1 = [(f"k{i}",) for i in range(300)]
    b2 = [(f"k{i}",) for i in range(150, 450)]  # overlap + fresh keys
    src = str(tmp_path / "hll_in")
    spark.createDataFrame(b1, "key string").coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, "key string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        hll_sketch(stream, "key")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_regs")
        .option("checkpointLocation", str(tmp_path / "hll_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM hll_regs").collect()
        )
    finally:
        q.stop()
    union = spark.createDataFrame(sorted(set(b1 + b2)), "key string")
    want = sorted(tuple(r) for r in hll_sketch(union, "key").collect())
    assert got == want


def test_cms_estimate_missing_terms_and_implicit_zero_cells(spark):
    # review fix: a term absent from the build stream must still get a
    # row; any untouched addressed cell is an implicit zero that zeroes
    # the min even when other cells collide
    from rayjoin_spark.functions.sketches import cms_build, cms_estimate

    stream = spark.createDataFrame([("apple",)] * 7, "term string")
    sk = cms_build(stream)
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(
            sk, spark.createDataFrame([("apple",), ("zzz-not-built",)], "term string")
        ).collect()
    }
    assert est["apple"] == 7
    assert est["zzz-not-built"] == 0  # was: row silently dropped


def test_hll_high_precision_b14_no_overflow(spark):
    # review fix: at b=14 (m=16384) the harmonic sum exceeds int64; the
    # decimal carry must keep est_raw positive and within HLL error
    from rayjoin_spark.functions.sketches import hll_estimate, hll_sketch

    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("key"))
    est = hll_estimate(hll_sketch(df, b=14), b=14).collect()[0]
    raw = int(est["est_raw"])
    assert raw > 0, "negative/garbage estimate -> int64 wrap regression"
    # v_empty large here -> raw underestimates without the linear-counting
    # correction; apply it like a consumer would (m*ln(m/v_empty))
    import math

    m = 1 << 14
    v = int(est["v_empty"])
    corrected = m * math.log(m / v) if v > 0 else raw
    assert abs(corrected - n) / n < 0.1


def test_hll_null_keys_ignored(spark):
    from rayjoin_spark.functions.sketches import hll_estimate, hll_sketch

    a = spark.createDataFrame([("k1",), ("k2",), ("k3",)], "key string")
    b = spark.createDataFrame(
        [("k1",), ("k2",), ("k3",), (None,), (None,)], "key string"
    )
    ra = hll_estimate(hll_sketch(a)).collect()[0]
    rb = hll_estimate(hll_sketch(b)).collect()[0]
    assert ra["est_raw"] == rb["est_raw"] and ra["v_empty"] == rb["v_empty"]
