"""Canonical fixed schemas (no runtime inference — the reference's
schemas are compile-time types, src/config.h:11-16)."""

from __future__ import annotations

from pyspark.sql import types as T

CHAINS = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("left_polygon_id", T.LongType(), False),
        T.StructField("right_polygon_id", T.LongType(), False),
    ]
)

CHAIN_POINTS = T.StructType(
    [
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("eid", T.LongType(), False),
        T.StructField("chain_id", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("x1", T.LongType(), False),
        T.StructField("y1", T.LongType(), False),
        T.StructField("x2", T.LongType(), False),
        T.StructField("y2", T.LongType(), False),
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.LongType(), False),
        T.StructField("c", T.LongType(), False),
        T.StructField("left_polygon_id", T.LongType(), False),
        T.StructField("right_polygon_id", T.LongType(), False),
    ]
)

QUERY_POINTS = T.StructType(
    [
        T.StructField("point_id", T.LongType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
)

#: BASELINE.json input_hint shape
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

XSECTS = T.StructType(
    [
        T.StructField("eid_a", T.LongType(), False),
        T.StructField("eid_b", T.LongType(), False),
        T.StructField("num_x", T.DecimalType(38, 0), True),
        T.StructField("num_y", T.DecimalType(38, 0), True),
        T.StructField("den", T.DecimalType(38, 0), True),
        T.StructField("xsect_xd", T.DoubleType(), True),
        T.StructField("xsect_yd", T.DoubleType(), True),
    ]
)
