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
