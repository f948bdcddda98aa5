"""Similarity search over embedding columns (array<float>).

Two paths:
* brute-force top-k — exact baseline: broadcast the query set, fold the
  dot product with built-in higher-order functions (JVM, no UDF), window
  top-k per query;
* LSH-bucketed ANN — scale path: random-hyperplane signatures bucket the
  corpus; candidates come from an equi-join on bucket, then exact re-rank.
  At 100 TB the bucket join replaces the quadratic crossJoin: corpus is
  hashed once (linear), queries probe their own bucket (+ multi-probe).

Scoring is integer-scaled (round(x*SCALE) as bigint) so results are
exactly reproducible across engines (no float-summation-order ambiguity)
— same trick the spatial side uses for its snap-to-grid contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1000  # int scaling for portable exact dot products


def _int_vec(col):
    # cast float->double BEFORE the multiply: a float32 product rounds
    # differently than a float64 one, and the oracle computes in double
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(float(SCALE))).cast("bigint")
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def topk_dot(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k by (integer-scaled) inner product; ties break by corpus id.

    Queries are broadcast (the query set is small by construction); corpus
    scan stays partition-parallel, top-k is a per-query window.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _int_vec(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), _int_vec(F.col(vec_col)).alias("qv")
    )
    j = c.crossJoin(F.broadcast(q)).select(
        "query_id", "corpus_id", _dot(F.col("cv"), F.col("qv")).alias("dot")
    )
    j = j.filter(F.col("corpus_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("corpus_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "dot", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine; float path (engine API, not oracle-checked)."""
    dot = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    j = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            (dot / (F.col("cn") * F.col("qn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _rh_signature(vec, n_planes: int, dim: int, seed: int = 41):
    """Random-hyperplane sign bits from a deterministic pseudo-plane:
    plane p component i = ((p*dim + i)*2654435761 % 2^32) / 2^32 - 0.5.
    Pure arithmetic — identical on any engine, no stored model."""
    bits = []
    for p in range(n_planes):
        comp = F.expr(
            f"aggregate(zip_with({vec}, sequence(0, {dim - 1}), (x, i) -> "
            f"x * ((({p} * {dim} + i) * 2654435761 % 4294967296) / 4294967296.0 - 0.5)), "
            "cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bits.append(F.when(comp > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def neardup_cosine(
    corpus: DataFrame,
    min_cosine: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exhaustive: bool = True,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs by cosine threshold.

    Exact comparison in scaled integers: cos(a,b) >= t  <=>
    dot >= 0 and dot^2 * S >= t^2*S * |a|^2 |b|^2 (S=10^4) — no float
    comparisons, reproducible anywhere. exhaustive=True does the full
    self-join (oracle-checkable); False prefilters through LSH buckets
    (the 100 TB path: candidates only from matching sign-buckets).
    """
    c = corpus.select(F.col(id_col).alias("_id"), _int_vec(F.col(vec_col)).alias("v"))
    if not exhaustive:
        cd = corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("vd")
        ).withColumn("bucket", _rh_signature("vd", n_planes, dim))
        c = c.join(cd.select("_id", "bucket"), "_id")
        a = c.select(F.col("_id").alias("id_a"), F.col("v").alias("va"), "bucket")
        b = c.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"), "bucket")
        j = a.join(b, "bucket").drop("bucket")
    else:
        a = c.select(F.col("_id").alias("id_a"), F.col("v").alias("va"))
        b = c.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"))
        j = a.crossJoin(b)
    j = j.filter(F.col("id_a") < F.col("id_b"))
    dot = _dot(F.col("va"), F.col("vb"))
    na = _dot(F.col("va"), F.col("va"))
    nb = _dot(F.col("vb"), F.col("vb"))
    j = j.select("id_a", "id_b", dot.alias("dot"), na.alias("n_a"), nb.alias("n_b"))
    t2 = int(round(min_cosine * min_cosine * 10_000))
    dec = "decimal(38,0)"
    keep = (F.col("dot") >= 0) & (
        F.col("dot").cast(dec) * F.col("dot").cast(dec) * F.lit(10_000).cast(dec)
        >= F.lit(t2).cast(dec) * F.col("n_a").cast(dec) * F.col("n_b").cast(dec)
    )
    return j.filter(keep).select("id_a", "id_b", "dot", "n_a", "n_b")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k: bucket by random-hyperplane signature, exact
    integer re-rank within the bucket. Recall < 1 by construction; the
    scale path for corpora where crossJoin is impossible."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _int_vec(F.col(vec_col)).alias("cv"),
        F.col(vec_col).cast("array<double>").alias("cvd"),
    ).withColumn("bucket", _rh_signature("cvd", n_planes, dim))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        _int_vec(F.col(vec_col)).alias("qv"),
        F.col(vec_col).cast("array<double>").alias("qvd"),
    ).withColumn("bucket", _rh_signature("qvd", n_planes, dim))
    j = (
        c.join(q, "bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", _dot(F.col("cv"), F.col("qv")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("corpus_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "dot", "rank")
    )
