"""Explicit skew handling: hot-cell detection + salted cell join.

The reference diagnoses skew with per-cell workload histograms
(src/grid/uniform_grid.h:444-494) and lives with it (a GPU block chews a
fat cell). At 1000-executor scale a hot cell becomes a straggler task,
so the cell join must split hot keys explicitly (AQE skew-join also
fires, but BASELINE mandates explicit salting driven by the metrics
table).

Salting scheme for an inner equi-join A ⋈ B on (cx, cy):
  * hot cells (workload above `threshold`) get `n_salts` buckets;
  * A-side rows in a hot cell are scattered: salt = pmod(hash(eid), n);
  * B-side rows in a hot cell are replicated to every salt bucket;
  * join key becomes (cx, cy, salt). Row multiset of the join output is
    unchanged — every (a, b) pair still meets in exactly one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.plans.cells import cell_workload


def hot_cells(
    edge_cells_a: DataFrame, edge_cells_b: DataFrame, threshold: int = 1_000_000
) -> DataFrame:
    """Cells whose candidate-pair workload ne_a*ne_b exceeds threshold —
    the metrics table that drives salting (and lands in the lineage/
    metrics output for observability)."""
    return cell_workload(edge_cells_a, edge_cells_b).filter(
        F.col("workload") > threshold
    )


def salted_cell_join(
    cells_a: DataFrame,
    cells_b: DataFrame,
    hot: DataFrame,
    n_salts: int = 8,
    scatter_key: str = "eid_a",
    target_pairs: int | None = None,
) -> DataFrame:
    """Inner join on (cx, cy) with hot cells split over salt buckets.

    cells_a/cells_b must already carry side-suffixed columns (as produced
    by operators.lsi._side). Returns the joined DataFrame, same row
    multiset as a plain join.

    Salt sizing: a flat ``n_salts`` buckets per hot cell replicates the
    B side n_salts-fold in EVERY hot cell — stable but wasteful (round-3
    measured 1.6x wall-time overhead at n_salts=16). With ``target_pairs``
    set, each hot cell gets workload-proportional buckets instead:
    ceil(workload / target_pairs), capped at n_salts — a cell just over
    the hot threshold splits 2-3 ways while a monster cell still splits
    n_salts ways, so total B-side replication is proportional to the
    actual imbalance, not to the hot-cell count.
    """
    if target_pairs:
        ns_col = (
            F.least(
                F.lit(n_salts),
                F.ceil(F.col("workload") / F.lit(float(target_pairs))),
            )
            .cast("int")
            .alias("_ns")
        )
        h = F.broadcast(hot.select("cx", "cy", ns_col))
    else:
        h = F.broadcast(
            hot.select("cx", "cy").withColumn("_ns", F.lit(n_salts))
        )
    a = cells_a.join(h, ["cx", "cy"], "left").withColumn(
        "salt",
        F.when(
            F.col("_ns").isNotNull(),
            F.pmod(F.xxhash64(scatter_key), F.col("_ns").cast("bigint")),
        ).otherwise(F.lit(0)),
    ).drop("_ns")
    b = (
        cells_b.join(h, ["cx", "cy"], "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_ns").isNotNull(), F.sequence(F.lit(0), F.col("_ns") - 1)
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("salt", F.explode("_salts"))
        .drop("_ns", "_salts")
    )
    return a.join(b, ["cx", "cy", "salt"], "inner").drop("salt")


def lsi_join_salted(
    edges_a,
    edges_b,
    grid,
    hot_threshold: int = 1_000_000,
    n_salts: int = 8,
    target_pairs: int | None = None,
    split_long_edges: int | None = None,
):
    """LSI join with explicit hot-cell salting (same output as lsi_join).

    ``target_pairs`` switches to workload-proportional salt counts (see
    salted_cell_join); ``split_long_edges`` applies the fine-grid fragment
    explode (plans/cells.py) with the same (eid_a, eid_b) output dedup as
    lsi_join's auto path.
    """
    from rayjoin_spark.operators.lsi import _side, lsi_intersect_filter
    from rayjoin_spark.plans.cells import explode_edges_to_cells

    eca = explode_edges_to_cells(edges_a, grid, split_long_edges)
    ecb = explode_edges_to_cells(edges_b, grid, split_long_edges)
    hot = hot_cells(eca, ecb, hot_threshold)
    j = salted_cell_join(
        _side(eca, "a"), _side(ecb, "b"), hot,
        n_salts=n_salts, target_pairs=target_pairs,
    )
    j = j.filter(
        (F.col("cx") == F.greatest("ix1_a", "ix1_b"))
        & (F.col("cy") == F.greatest("iy1_a", "iy1_b"))
    )
    out = lsi_intersect_filter(j).select("eid_a", "eid_b")
    if split_long_edges:
        out = out.dropDuplicates(["eid_a", "eid_b"])
    return out
