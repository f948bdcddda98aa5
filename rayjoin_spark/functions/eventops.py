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


def _floor_bucket(us_col: str, bucket_us: int):
    """Exact integer FLOOR bucketing of a microsecond epoch column:
    `us DIV b` truncates toward zero (so does DuckDB's bigint //),
    which puts pre-1970 (negative-epoch) events in the WRONG bucket;
    subtracting pmod first makes the dividend an exact multiple, so DIV
    is exact floor. The ONE copy of this reasoning — event_rollup,
    interval chunking and burst_detect all bucket through here; oracle
    SQL states the same subtract-pmod-first form."""
    return F.expr(f"({us_col} - pmod({us_col}, {bucket_us})) DIV {bucket_us}")


def event_rollup(events: DataFrame, bucket_us: int = US_PER_HOUR) -> DataFrame:
    """(bucket, event_type) -> n_events, n_users, min/max value, sum of the
    integer json prop k (exercises the JSON scalar path exactly)."""
    # ts is TIMESTAMP_NTZ in the parquet; cast via the UTC session TZ
    e = events.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("bucket", _floor_bucket("us", bucket_us))
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

def asof_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "view",
    gap_cap_us: int | None = None,
) -> DataFrame:
    """AS-OF join within the events stream: for every LEFT event (e.g. a
    click), attach the most recent RIGHT event (e.g. the view it came
    from) of the same user at-or-before the left event's timestamp —
    the canonical time-series enrichment join (a "previous state at time
    t" lookup), which Spark has no built-in operator for.

    Implemented as a MERGE, not a join: both sides union into one
    stream, one shuffle on user_id, and a running `last(..., ignorenulls)`
    window carries the latest right-side row forward. This is the shape
    that scales: no range-join explosion, no per-row probe — each user's
    timeline is a single sorted pass, and the state carried is one row.
    (The equivalent ASOF JOIN in DuckDB/Pandas materializes the same
    semantics; at 100 TB the union-merge is one shuffle of each side.)

    Tie rule (deterministic): ordering is (us, side, event_id) with the
    right side sorting FIRST at equal timestamps, so a left event sees a
    right event with the identical timestamp (inclusive as-of); among
    right events sharing a timestamp the highest event_id wins.

    ``gap_cap_us`` optionally voids matches older than the cap (emitted
    as nulls), the usual "attribution window" rule.
    """
    e = events.filter(F.col("event_type").isin([left_type, right_type])).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
        "value",
    )
    e = e.withColumn(
        "side", F.when(F.col("event_type") == right_type, F.lit(0)).otherwise(F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right = F.col("side") == 0
    e = (
        e.withColumn("r_event_id", F.last(F.when(right, F.col("event_id")), True).over(w))
        .withColumn("r_us", F.last(F.when(right, F.col("us")), True).over(w))
        .withColumn("r_value", F.last(F.when(right, F.col("value")), True).over(w))
    )
    out = e.filter(~right)
    if gap_cap_us is not None:
        stale = F.col("r_us").isNotNull() & (F.col("us") - F.col("r_us") > gap_cap_us)
        out = (
            out.withColumn("r_event_id", F.when(stale, F.lit(None)).otherwise(F.col("r_event_id")))
            .withColumn("r_value", F.when(stale, F.lit(None)).otherwise(F.col("r_value")))
            .withColumn("r_us", F.when(stale, F.lit(None)).otherwise(F.col("r_us")))
        )
    return out.select(
        "event_id",
        "user_id",
        "us",
        F.col("r_event_id").cast("bigint").alias("asof_event_id"),
        F.col("r_us").cast("bigint").alias("asof_us"),
        F.col("r_value").alias("asof_value"),
        (F.col("us") - F.col("r_us")).cast("bigint").alias("asof_lag_us"),
    )


def interval_join(
    events: DataFrame,
    anchor_type: str = "purchase",
    half_width_us: int = 1800 * 1_000_000,
) -> DataFrame:
    """Interval (range) join: count the activity inside a +-half_width
    window around every ANCHOR event, across ALL users — "what happened
    around each purchase". A naive engine runs this as an inequality
    theta-join (quadratic scans); Spark's own join operators can only
    express it as a broadcast-nested-loop.

    This is the 1-D analog of the engine's grid spatial join
    (operators/lsi.py): time is bucketed into fixed chunks of width
    2*half_width, the interval side explodes into the <=2 chunks it can
    overlap (bounded fan-out, like edges-to-cells), the event side maps
    to exactly ONE chunk — so the equi-join on chunk id replicates only
    the small side and every (interval, event) match is produced exactly
    once (no dedup pass needed). One shuffle per side; chunk keys are
    time-uniform, and the engine's salting layer (plans/skew.py) applies
    unchanged if a flash-crowd chunk goes hot.

    Floor semantics use the subtract-pmod form (exact for negative
    epochs, mirrored verbatim in the oracle SQL, cf. event_rollup).
    """
    chunk_us = 2 * half_width_us
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )

    def _chunk(col):
        return _floor_bucket(col, chunk_us)

    anchors = (
        e.filter(F.col("event_type") == anchor_type)
        .select(
            F.col("event_id").alias("interval_id"),
            (F.col("us") - half_width_us).alias("lo"),
            (F.col("us") + half_width_us).alias("hi"),
        )
        .withColumn("chunk", F.explode(F.sequence(_chunk("lo"), _chunk("hi"))))
    )
    probes = e.select("event_id", "user_id", "us").withColumn("chunk", _chunk("us"))
    m = anchors.join(probes, "chunk").filter(
        (F.col("us") >= F.col("lo")) & (F.col("us") <= F.col("hi"))
    )
    return m.groupBy("interval_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )


def interval_merge(
    intervals: DataFrame,
    key: str = "user_id",
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Coalesce overlapping/touching half-open intervals [lo, hi) per
    key into maximal disjoint spans — the 1-D measure-union sibling of
    operators/sweep.union_area (same running-max-reach idea, but here
    the per-key interval list fits a window, so it stays pure codegen:
    no pandas, no explode). Crawl-side use: merge per-host activity
    windows ([fetch_ts, fetch_ts + crawl_delay)) into contiguous busy
    spans; event-side: visit spans from raw event instants.

    Semantics: intervals with lo >= hi are dropped; a new span starts
    exactly when this lo is STRICTLY greater than the running max of
    all previous his (ties touch: [0,5) + [5,9) merge — half-open
    adjacency is contiguity). Output (key, span_id, lo, hi, n_merged)
    with span_id dense per key from 1 by ascending lo, all bigint —
    integer compares only, bit-stable on both engines.

    Scale shape: ONE window sort per key + one combinable groupBy — the
    same two-shuffle shape as dwell_segments; a mega-key is one window
    partition (pre-split by coarse lo range and re-merge seam spans if
    a single key ever holds billions of intervals).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("_k").orderBy("_lo", "_hi")
    p = (
        intervals.select(
            F.col(key).alias("_k"),
            F.col(lo).cast("bigint").alias("_lo"),
            F.col(hi).cast("bigint").alias("_hi"),
        )
        .filter(F.col("_lo") < F.col("_hi"))
    )
    p = p.withColumn(
        "_reach",
        F.max("_hi").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "_new",
        F.when(
            F.col("_reach").isNull() | (F.col("_lo") > F.col("_reach")), 1
        ).otherwise(0),
    )
    p = p.withColumn(
        "span_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return p.groupBy(F.col("_k").alias(key), "span_id").agg(
        F.min("_lo").alias("lo"),
        F.max("_hi").alias("hi"),
        F.count("*").cast("bigint").alias("n_merged"),
    )


def burst_detect(
    events: DataFrame,
    bucket_us: int = US_PER_HOUR,
    window: int = 6,
    factor: int = 3,
    min_history: int = 3,
) -> DataFrame:
    """Temporal burst detection per event type (a Kleinberg-flavored
    two-state test kept integer-exact): bucket events to fixed windows
    (the subtract-pmod floor of event_rollup), then flag a bucket whose
    count exceeds ``factor`` times the trailing mean over the previous
    ``window`` OBSERVED buckets —

        burst  <=>  n * trailing >= factor * prev_sum   (cross-multiplied)

    with ``trailing`` the number of observed trailing buckets (ROWS, not
    RANGE: silent hours produce no bucket rows and are deliberately NOT
    zero-filled — the baseline is "recent activity when active", which
    is the flash-crowd question; buckets with trailing < min_history are
    never flagged, so cold starts don't fire). The crawl-ops use: detect
    flash crowds / hot topics per event type to trigger recrawl.

    Output (event_type, bucket, n_events, prev_sum, trailing, burst),
    all bigint + boolean — integer compares only.

    Scale shape: one combinable count groupBy + one window per type
    ordered by bucket (a type is one window partition; types are few —
    for per-HOST bursts at web scale, partition the window by (host)
    which is naturally parallel). No self-join, no collect.
    """
    from pyspark.sql import Window

    cnt = (
        events.select(
            F.col("event_type"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
        )
        # single documented null policy, shared with the streaming twin
        # (streaming/pages_stream.py drops NaT rows) and the DuckDB
        # oracle: null timestamps carry no bucket and are excluded
        .filter(F.col("_us").isNotNull())
        .select(F.col("event_type"), _floor_bucket("_us", bucket_us).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-window, -1)
    return cnt.select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_events",
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("bigint").alias("prev_sum"),
        F.count("n_events").over(w).cast("bigint").alias("trailing"),
    ).withColumn(
        "burst",
        (F.col("trailing") >= min_history)
        & (
            F.col("n_events") * F.col("trailing")
            >= F.lit(int(factor)) * F.col("prev_sum")
        ),
    )
