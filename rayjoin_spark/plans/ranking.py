"""Distributed dense ranking — global first-encounter ids WITHOUT a
single-partition window.

The overlay writer dict-encodes faces and points "in first-encounter
order" (reference src/app/output_chain.h:141-183). The obvious Spark
expression — ``row_number() OVER (ORDER BY key)`` with no partitionBy —
funnels the WHOLE frame through one task: at 100 TB that is the entire
overlay output serialized through a single partition, the canonical
scale-killer.

``ordered_index`` assigns the identical ids with a two-level rank
(zipWithIndex re-expressed on DataFrames):

1. range-repartition by the order key (each partition holds a contiguous
   key range, partitions are globally ordered);
2. sort within partitions and stamp ``monotonically_increasing_id()`` —
   Spark defines it as ``partition_id * 2^33 + local_row_number``, so it
   encodes (partition, local rank) with NO extra shuffle;
3. collect one tiny row per partition (count + id base) — O(#partitions),
   driver-safe at any data size;
4. broadcast-join the cumulative offsets back and add the local rank.

Total cost: ONE range shuffle + an O(partitions) collect, vs the global
window's full-data single-task sort. The result is byte-identical: a
dense 0-based index in exact ``order_cols`` order.

The order key must be UNIQUE (ties spanning a range boundary would make
the index order-ambiguous); every call site ranks a key that is unique by
construction and asserts nothing weaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MID_BITS = 33  # monotonically_increasing_id: pid << 33 | local row number


def ordered_index(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = dense global index (start, start+1, ...) of rows
    ordered by ``order_cols`` (which must be a unique key). No
    single-partition stage; see module docstring for the plan shape."""
    spark = df.sparkSession
    cols = [F.col(c) for c in order_cols]
    part = df
    if num_partitions:
        part = part.repartitionByRange(num_partitions, *cols)
    else:
        part = part.repartitionByRange(*cols)
    # localCheckpoint(eager) — NOT persist(): the sampled range boundaries
    # and the stamped ids are both plan-nondeterministic under
    # recomputation, and a best-effort cache that loses blocks (executor
    # failure, MEMORY_AND_DISK eviction) would silently recompute them
    # with DIFFERENT values, desyncing the driver-collected offset table
    # from the joined _mid stamps. Checkpointing pins the stamped rows;
    # losing them now FAILS the job instead of corrupting ids.
    part = (
        part.sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    per_part = (
        part.groupBy(F.shiftright(F.col("_mid"), _MID_BITS).alias("_pid"))
        .agg(F.count("*").alias("_n"), F.min("_mid").alias("_base"))
        .collect()
    )
    offsets, acc = [], start
    for r in sorted(per_part, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], r["_base"], acc))
        acc += r["_n"]
    off_df = spark.createDataFrame(
        offsets, "_pid long, _base long, _off long"
    )
    return (
        part.withColumn("_pid", F.shiftright(F.col("_mid"), _MID_BITS))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_off") + (F.col("_mid") - F.col("_base")))
        .drop("_pid", "_mid", "_base", "_off")
    )


def grouped_index(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-GROUP dense rank (0-based within each group, ordered by
    ``order_cols``) without the classic skew trap: a plain
    ``row_number() OVER (PARTITION BY group ORDER BY ...)`` ships a
    mega-group's every row through ONE task — for web corpora that is
    the crawl-skew straggler (one giant host) all over again.

    Plan: one `ordered_index` over the composite (group, order) key —
    a mega-group spans MANY contiguous range partitions — then subtract
    each group's min global index (combinable agg + equi-join; the hot
    probe side meets a 1-row build side per group, the skew shape
    AQE/broadcast handles natively). (group_cols + order_cols) must be a
    unique key, same contract as `ordered_index`.
    """
    g = ordered_index(df, group_cols + order_cols, "_gidx", num_partitions=num_partitions)
    base = g.groupBy(*group_cols).agg(F.min("_gidx").alias("_gbase"))
    # null-safe equality: a NULL group key is a real group (matching the
    # window semantics this replaces) — a plain equi-join would silently
    # DROP those rows
    cond = None
    for c in group_cols:
        term = g[c].eqNullSafe(base[c])
        cond = term if cond is None else (cond & term)
    joined = g.join(base, cond)
    for c in group_cols:
        joined = joined.drop(base[c])
    return joined.withColumn(out_col, F.col("_gidx") - F.col("_gbase")).drop(
        "_gidx", "_gbase"
    )
