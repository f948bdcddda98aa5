"""Map / edge sampling (reference src/map/planar_graph.h:254-399).

* `sample_map` — topology-preserving: every chain keeps its endpoints,
  interior points survive with probability `rate` (reference
  sample_map_from :254-312). Seeded hash of (chain_id, seq) instead of a
  stateful RNG so the sample is reproducible and shuffle-free.
* `sample_edges` — plain row sampling of the edge table, regrouped into
  2-point chains (reference sample_edges_from :314-399).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_H = 1 << 32


def _keep(rate: float, *cols) -> F.Column:
    return F.pmod(F.xxhash64(*cols), F.lit(_H)) < int(rate * _H)


def sample_map(
    chains: DataFrame, points: DataFrame, rate: float, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Keep every chain; sample interior points at `rate`, always keeping
    first/last (endpoints carry the planar-graph topology)."""
    w = Window.partitionBy("chain_id")
    p = points.withColumn("max_seq", F.max("seq").over(w))
    keep = (
        (F.col("seq") == 0)
        | (F.col("seq") == F.col("max_seq"))
        | _keep(rate, F.lit(seed), "chain_id", "seq")
    )
    sampled = p.filter(keep).drop("max_seq")
    # re-number seq densely so edges re-derive cleanly
    sw = Window.partitionBy("chain_id").orderBy("seq")
    sampled = sampled.withColumn("seq", F.row_number().over(sw) - 1)
    return chains, sampled


def sample_edges(
    edges: DataFrame, rate: float, seed: int = 42
) -> DataFrame:
    """Sample individual edges (each becomes an independent 2-point
    chain in the reference; here the edge table row simply survives)."""
    return edges.filter(_keep(rate, F.lit(seed), "eid"))
