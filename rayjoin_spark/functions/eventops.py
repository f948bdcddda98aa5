"""Event-stream table operators: time-bucketed rollups + sessionization.

The driver's `events` table (event_id, ts, user_id, event_type, value,
props-json) is the batch shape of the streaming ingest; these are the
operators a hypertable-style pipeline runs over it:

* `event_rollup` — tumbling time-bucket x event-type aggregation (the
  continuous-aggregate / rollup analog). All comparison-checked columns
  are order-independent (counts, distincts, min/max, integer sums) so the
  result is bit-stable under any partitioning — double SUMs are refused
  by design (shuffle order would change the IEEE sum).
* `sessionize_events` — gap-based sessions per user as pure window math
  (the batch twin of streaming/pages_stream.sessionize_hosts; same gap
  rule, exact epoch-microsecond integer arithmetic).

Timestamps are compared as epoch MICROSECONDS (bigint): exact integer
math on both engines, no timezone or sub-second truncation hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def event_rollup(events: DataFrame, bucket_us: int = US_PER_HOUR) -> DataFrame:
    """(bucket, event_type) -> n_events, n_users, min/max value, sum of the
    integer json prop k (exercises the JSON scalar path exactly)."""
    # ts is TIMESTAMP_NTZ in the parquet; cast via the UTC session TZ
    e = events.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        # FLOOR division in exact integer math: `us DIV b` truncates
        # toward zero (so does DuckDB's bigint //), which puts pre-1970
        # (negative-epoch) events in the WRONG bucket; subtracting pmod
        # first makes the dividend an exact multiple, so DIV is exact
        # floor — the oracle SQL uses the same subtract-pmod-first form
        e.withColumn("bucket", F.expr(f"(us - pmod(us, {bucket_us})) DIV {bucket_us}"))
        .groupBy("bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(k).alias("sum_k"),
        )
    )


def sessionize_events(events: DataFrame, gap_us: int = 1800 * 1_000_000) -> DataFrame:
    """Gap-based sessions: a gap > gap_us since the user's previous event
    opens a new session. Returns one row per session:
    (user_id, session_start_us, session_end_us, n_events)."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    e = e.withColumn("prev", F.lag("us").over(w)).withColumn(
        "new_sess",
        F.when(F.col("prev").isNull() | (F.col("us") - F.col("prev") > gap_us), 1)
        .otherwise(0),
    )
    e = e.withColumn(
        "sid",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return e.groupBy("user_id", "sid").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
    ).drop("sid")
