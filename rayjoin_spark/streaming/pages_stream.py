"""Structured Streaming ingestion of the pages table.

The reference is batch-only; the graft's "checkpoint-resumable" demand is
batch-restart (plans/checkpoint.py). This module adds the natural
streaming front-end anyway: pages arrive as micro-batches, get geocoded
(stateless column math — streams fine), and are either

* aggregated into per-tile windowed counts (`streaming_tile_counts`) with
  a watermark for late WARC timestamps, or
* located in a *static* polygon layer per micro-batch via
  `foreachBatch` (`stream_locate_pages`) — PIP's iterative walk is a
  batch algorithm, so it runs inside the epoch against the static layer
  (stream-static pattern; exactly-once by epoch id + idempotent sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayjoin_spark.plans.scaling import GridSpec, Scaling
from rayjoin_spark.sources.pages import geocode_pages


def streaming_tile_counts(
    pages_stream: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    bbox: tuple[float, float, float, float],
    shift: int = 3,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """readStream(pages) -> geocode -> watermarked windowed tile counts."""
    g = geocode_pages(pages_stream, *bbox)
    g = g.withColumn(
        "tile_x", F.shiftright(grid.cell_of(scaling.scale_x(F.col("x"))), shift)
    ).withColumn(
        "tile_y", F.shiftright(grid.cell_of(scaling.scale_y(F.col("y"))), shift)
    )
    return (
        g.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "tile_x", "tile_y")
        .agg(F.count("*").alias("n_pages"), F.approx_count_distinct("lang").alias("n_langs"))
    )


def stream_locate_pages(
    pages_stream: DataFrame,
    base_edges: DataFrame,
    scaling: Scaling,
    grid: GridSpec,
    bbox: tuple[float, float, float, float],
    sink,
):
    """foreachBatch: per epoch, geocode + PIP-locate the micro-batch in the
    static layer, call sink(df, epoch_id). Returns the DataStreamWriter
    (caller .start()s it with its own checkpointLocation)."""
    from rayjoin_spark.sources.pages import locate_pages

    def handle(batch_df: DataFrame, epoch_id: int):
        located = locate_pages(
            geocode_pages(batch_df, *bbox), base_edges, scaling, grid
        )
        sink(located, epoch_id)

    return pages_stream.writeStream.foreachBatch(handle)
