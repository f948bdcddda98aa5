"""Plan regression guard: the physical plans the engine promises.

If a future change drops a filter pushdown or sneaks a Python eval node
into a hot path, this fails before any benchmark notices.
"""

from pyspark.sql import functions as F

from rayjoin_spark.operators.lsi import lsi_join
from rayjoin_spark.operators.pip import prepare_query_points
from rayjoin_spark.plans.layers import build_edges
from rayjoin_spark.plans.scaling import GridSpec, compute_scaling
from rayjoin_spark.sources import derived
from rayjoin_spark.sources.datagen import lattice_chains, transformed_lattice

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsi_derived_plan(spark):
    j = lsi_join(
        derived.edges_a(spark, SF_DIR), derived.edges_b(spark, SF_DIR), derived.DERIVED_GRID
    )
    plan = _plan(j)
    # predicates reach the parquet scan; no Python on the hot path
    assert "PushedFilters: [IsNotNull" in plan or "DataFilters: [isnotnull" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the scan reads only the needed columns (column pruning)
    assert "l_comment" not in plan and "l_extendedprice" not in plan
    # some hash join on the cell key (broadcast at this size); AQE active
    assert "HashJoin" in plan
    assert "AdaptiveSparkPlan" in plan
    # confirm the hot path compiles into WholeStageCodegen subtrees
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    codegen = j._jdf.queryExecution().explainString(mode)
    assert "WholeStageCodegen" in codegen


def test_lsi_lattice_plan_no_python(spark):
    ca, pa = lattice_chains(spark, 4)
    cb, pb = transformed_lattice(spark, 4)
    scaling = compute_scaling(pa, pb)
    j = lsi_join(build_edges(ca, pa, scaling), build_edges(cb, pb, scaling), GridSpec(16))
    plan = _plan(j)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ordered_index_matches_global_window(spark):
    """The distributed two-level rank must be byte-identical to the global
    row_number it replaces, across many partitions and range boundaries."""
    from pyspark.sql import Window

    from rayjoin_spark.plans.ranking import ordered_index

    df = spark.range(10_000).select(
        (F.col("id") * 2654435761 % 1000003).alias("k"), F.col("id").alias("v")
    )
    # unique key: (k, v)
    got = ordered_index(df, ["k", "v"], "idx", start=7, num_partitions=16)
    want = df.withColumn(
        "idx", F.row_number().over(Window.orderBy("k", "v")) + 6
    )
    assert got.count() == 10_000
    g = {(r["k"], r["v"]): r["idx"] for r in got.collect()}
    w = {(r["k"], r["v"]): r["idx"] for r in want.collect()}
    assert g == w
    # and the plan has no single-partition exchange
    assert "SinglePartition" not in got._jdf.queryExecution().executedPlan().toString()


def test_overlay_writer_no_single_partition(spark):
    """The overlay writer's dict-encodes must be distributed: no Exchange
    SinglePartition anywhere in the executed chains/points plans
    (round-2 verdict: the global point row_number was a 100x scale-killer)."""
    from rayjoin_spark.operators.overlay import overlay
    from rayjoin_spark.sources.datagen import lattice_chains, transformed_lattice

    ca, pa = lattice_chains(spark, 3)
    cb, pb = transformed_lattice(spark, 3)
    scaling = compute_scaling(pa, pb)
    oc, op = overlay(ca, pa, cb, pb, scaling, GridSpec(16))
    for df in (oc, op):
        df.count()  # finalize AQE so the executed plan is real
        lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            # runtime bloom-filter injection aggregates its (tiny) filter
            # on one partition by design — the data path never does
            ctx = "\n".join(lines[i: i + 4])
            assert "bloom_filter_agg" in ctx, "\n".join(lines[i - 3: i + 6])


def test_point_prep_plan_no_shuffle(spark):
    """Scaling + cell assignment of query points is a narrow map — any
    Exchange here would shuffle the full point table for nothing."""
    ca, pa = lattice_chains(spark, 4)
    scaling = compute_scaling(pa)
    pts = prepare_query_points(
        spark.range(100).selectExpr("id as point_id", "cast(id as double) x", "cast(id as double) y"),
        scaling,
        GridSpec(16),
    )
    assert "Exchange" not in _plan(pts)
