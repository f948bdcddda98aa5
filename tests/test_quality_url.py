"""quality_classifier + canonicalize_url unit contracts (the driver-gate
oracle covers value-exactness; these pin the semantic properties)."""

from pyspark.sql import functions as F

from rayjoin_spark.functions import htmlops, textops


def test_quality_classifier_separates_seed(spark):
    rows = [(i, "good curated prose tokens", "pos") for i in range(20)] + [
        (100 + i, "spam junk listicle tokens", "neg") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = textops.quality_classifier(df, F.col("source") == "pos")
    by_src = {
        r.doc_id: r.quality_model_score for r in got.collect()
    }
    pos = [by_src[i] for i in range(20)]
    neg = [by_src[100 + i] for i in range(20)]
    # shared token 'tokens' pulls both toward the middle; disjoint tokens
    # dominate, so every pos doc outscores every neg doc
    assert min(pos) > max(neg)
    assert got.filter(F.col("n_tokens") != 4).count() == 0


def test_quality_classifier_partitioning_invariant(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.pmod("id", 7).cast("string"), F.lit(" common")).alias("text"),
        F.pmod("id", 3).alias("m"),
    )
    a = textops.quality_classifier(df.repartition(1), F.col("m") == 0).collect()
    b = textops.quality_classifier(df.repartition(13), F.col("m") == 0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


CASES = [
    ("HTTP://WWW.Site.Example:80/A/b?Q=x#frag", "http://site.example/A/b?Q=x"),
    ("https://Host.Example:443", "https://host.example/"),
    ("https://host.example:8443/x", "https://host.example:8443/x"),
    ("http://host.example?", "http://host.example/"),
    ("http://www.host.example/www.keep", "http://host.example/www.keep"),
    ("https://host.example/#only-frag", "https://host.example/"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {r.url: r.url_canonical for r in htmlops.canonicalize_url(df).collect()}
    for u, want in CASES:
        assert got[u] == want, (u, got[u], want)


def test_canonicalize_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = htmlops.canonicalize_url(df).select(
        F.col("url_canonical").alias("url")
    )
    twice = htmlops.canonicalize_url(once)
    assert twice.filter(F.col("url") != F.col("url_canonical")).count() == 0


def test_canonicalize_url_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("http://a.b/c",)], "url string")
    plan = htmlops.canonicalize_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
