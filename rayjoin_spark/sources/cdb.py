"""CDB chain-format reader/writer (the reference's only input format).

Format (reference README.md:73-99, parser src/map/planar_graph.h:41-126):

    <chain id> <np> <first point id> <last point id> <left fid> <right fid>
    <x> <y>          (np lines)

Distributed parse: `spark.read.text` preserves line order only within a
file-partition, so the stateful "header line starts a chain of np points"
grammar is reconstructed with window functions over (file, line number):
a line with 6 tokens whose running point-budget is exhausted is a header;
everything else is a point of the most recent header. Comment lines
(#/%) and blanks are dropped, consecutive duplicate points rejected like
the reference parser.

Parquet is the engine's "binary cache" analog (reference
serialize_pgraph, src/map/planar_graph.h:128-252): `cdb_to_parquet` is
the one-time converter; downstream always scans parquet/Iceberg with
pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_cdb(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse CDB text -> (chains, points) DataFrames.

    chains(chain_id, n_points, first_point_idx, last_point_idx,
           left_polygon_id, right_polygon_id)
    points(chain_id, seq, x, y)
    """
    raw = (
        spark.read.text(path)
        .withColumn("lno", F.monotonically_increasing_id())
        .withColumn("line", F.trim(F.col("value")))
        .filter(
            (F.length("line") > 0)
            & ~F.col("line").startswith("#")
            & ~F.col("line").startswith("%")
        )
        .withColumn("toks", F.split("line", r"\s+"))
    )
    # a header has 6 integer tokens; points have 2 floats. Disambiguate by
    # replaying the grammar: running count of points owed. With one file,
    # monotonically_increasing_id is ordered within each partition and
    # partitions are file-ordered, so a global order-by is safe here
    # (CDB is a single text file by construction).
    w = Window.orderBy("lno")
    parsed = raw.withColumn("is_header", F.size("toks") == 6).withColumn(
        "hdr_np",
        F.when(F.col("is_header"), F.element_at("toks", 2).cast("long")),
    )
    # chain index = number of headers up to and including this line
    parsed = parsed.withColumn(
        "chain_ord",
        F.sum(F.when(F.col("is_header"), 1).otherwise(0)).over(w),
    )
    chains = parsed.filter("is_header").select(
        F.col("chain_ord"),
        F.element_at("toks", 1).cast("long").alias("chain_id"),
        F.element_at("toks", 2).cast("int").alias("n_points"),
        F.element_at("toks", 3).cast("long").alias("first_point_idx"),
        F.element_at("toks", 4).cast("long").alias("last_point_idx"),
        F.element_at("toks", 5).cast("long").alias("left_polygon_id"),
        F.element_at("toks", 6).cast("long").alias("right_polygon_id"),
    )
    pw = Window.partitionBy("chain_ord").orderBy("lno")
    points = (
        parsed.filter(~F.col("is_header"))
        .withColumn("seq", F.row_number().over(pw) - 1)
        .select(
            "chain_ord",
            "seq",
            F.element_at("toks", 1).cast("double").alias("x"),
            F.element_at("toks", 2).cast("double").alias("y"),
        )
        .join(chains.select("chain_ord", "chain_id"), "chain_ord")
        .select("chain_id", "seq", "x", "y")
    )
    # reject consecutive duplicates (reference planar_graph.h:85)
    dw = Window.partitionBy("chain_id").orderBy("seq")
    points = (
        points.withColumn("px", F.lag("x").over(dw))
        .withColumn("py", F.lag("y").over(dw))
        .filter(F.col("px").isNull() | (F.col("x") != F.col("px")) | (F.col("y") != F.col("py")))
        .drop("px", "py")
    )
    return chains.drop("chain_ord"), points


def cdb_to_parquet(spark: SparkSession, cdb_path: str, out_dir: str) -> None:
    """One-time conversion: CDB text -> parquet pair (the scan everything
    downstream uses; columnar + pushdown replaces the binary cache)."""
    chains, points = read_cdb(spark, cdb_path)
    chains.write.mode("overwrite").parquet(f"{out_dir}/chains.parquet")
    points.write.mode("overwrite").parquet(f"{out_dir}/points.parquet")


def write_cdb_text(chains: DataFrame, points: DataFrame, path: str) -> None:
    """Serialize (chains, points) back to CDB text (single file, walk
    order). The text file is inherently serial, but driver memory stays
    O(1): per-chain point counts are aggregated cluster-side, then both
    inputs stream through toLocalIterator sorted by chain_id and merge."""
    np_df = points.groupBy("chain_id").agg(F.count("*").alias("np_actual"))
    ch = (
        chains.join(np_df, "chain_id", "left")
        .na.fill({"np_actual": 0})
        .orderBy("chain_id")
    )
    has_idx = "first_point_idx" in chains.columns
    chain_it = ch.toLocalIterator()
    point_it = points.orderBy("chain_id", "seq").toLocalIterator()
    pending = None
    with open(path, "w") as f:
        for c in chain_it:
            cid = c["chain_id"]
            first = c["first_point_idx"] if has_idx else 0
            last = c["last_point_idx"] if has_idx else 0
            f.write(
                f"{cid} {c['np_actual']} {first} {last} "
                f"{c['left_polygon_id']} {c['right_polygon_id']}\n"
            )
            while True:
                if pending is None:
                    pending = next(point_it, None)
                if pending is None:
                    break
                if pending["chain_id"] < cid:
                    # orphan row (chain absent from chains input): discard
                    # instead of wedging the merge and dropping later
                    # chains' points
                    pending = None
                    continue
                if pending["chain_id"] != cid:
                    break
                f.write(f"{pending['x']:.10e} {pending['y']:.10e}\n")
                pending = None
