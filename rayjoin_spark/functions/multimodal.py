"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas iterators.

The decode kernels themselves are STUBS (the image/audio libraries are
not in this environment — see `_decode_image_stub`): the Spark-side
contract — schema, batch shape, partition sizing, UDF signature — is real
and tested. Swapping a stub for PIL/ffmpeg keeps every plan unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row schema: payload stays opaque; metadata is typed
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, decode_ok boolean, error string"
)


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB decode: deterministic fake feature from the payload digest.

    Real implementation: PIL.Image.open(BytesIO(payload)) -> resize ->
    channel means. Raises NotImplementedError only if strict mode is
    wanted; here it degrades to the digest feature so pipelines are
    testable end-to-end without the libs.
    """
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow streams batches of rows into Python; each batch is processed
    vectorized (hashes + stub decode). Partition sizing guidance: binary
    payloads make rows heavy — repartition so a partition holds O(100 MB)
    of payloads, not O(row count).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats, oks, errs, hashes, sizes = [], [], [], [], []
            for p in payloads:
                b = bytes(p) if p is not None else b""
                sizes.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                try:
                    feats.append(_decode_image_stub(b))
                    oks.append(True)
                    errs.append(None)
                except NotImplementedError as e:  # pragma: no cover
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": hashes,
                    "feature": feats,
                    "decode_ok": oks,
                    "error": errs,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table (payload = repeated id bytes)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.col("id"), 3) + 1).cast("int"),
            ).alias("kind"),
            F.encode(
                F.concat(F.lit("payload:"), F.col("id").cast("string")), "UTF-8"
            ).alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
    )
