"""WARC (ISO 28500 Web ARChive) source connector — the on-disk format
Common-Crawl-style corpora actually arrive in.

The graft's input table (url, warc_ts, html, text, lang) is what a
pipeline HAS after ingest; this module is the ingest: WARC blobs in,
pages out. Web-archive WARCs are a concatenation of records

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Date: 2026-08-18T00:00:00Z\\r\\n
    WARC-Target-URI: https://...\\r\\n
    Content-Length: N\\r\\n
    \\r\\n
    <N payload bytes>\\r\\n\\r\\n

where a ``response`` record's payload is a raw HTTP/1.1 message (status
line + headers + body) and, per the Common Crawl convention, each record
may be its own gzip member so a reader can decompress one record without
touching the rest of the file.

Scale shape: parallelism is per *blob* — one Arrow batch row per WARC
file (``spark.read.format("binaryFile")``) or per pre-split chunk. The
record-per-gzip-member convention is exactly what makes pre-splitting
possible at 100 TB: a splitter can cut a .warc.gz at any member boundary
(scan for the 0x1f 0x8b magic at member starts) without decompressing,
so blob size — and therefore task granularity — is an ingest-time knob,
not a property of the archive. Python touches each byte once per blob
(linear scan, stdlib ``zlib``), batched through ``mapInPandas`` —
the same sanctioned slow-path plumbing as the PNG decoder in
functions/multimodal.py; everything downstream of the parse is columnar.

Reference analog: the CDB loader (``/root/reference/src/map/planar_graph.h:41-126``)
is the reference's "external archival format -> engine tables" seam; this
is the webtext graft's equivalent seam with the same contract (parse is
deterministic, malformed tails degrade, never crash the job).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GZIP_MAGIC = b"\x1f\x8b"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

#: one row per WARC record; ts_epoch (bigint UTC seconds) instead of a
#: timestamp column keeps the contract timezone-free and hash-stable
#: across engines.
WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("ts_epoch", T.LongType(), True),
        T.StructField("warc_type", T.StringType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("n_payload_bytes", T.LongType(), False),
    ]
)


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the CC record-per-
    member layout). Trailing garbage / a truncated final member yields
    the bytes decoded so far — degrade, don't crash."""
    out, pos = [], 0
    while pos < len(blob) and blob[pos : pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(blob[pos:]))
        except zlib.error:
            break
        if not d.eof:  # truncated member
            break
        pos = len(blob) - len(d.unused_data)
    return b"".join(out)


def _split_http_body(payload: bytes) -> bytes:
    """Body of a raw HTTP/1.1 message: everything after the first blank
    line. A payload with no header separator is returned whole (robust
    to resource-style payloads mislabeled as http)."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def _parse_one_blob(blob: bytes, keep_types: frozenset[str]) -> Iterator[dict]:
    """Linear scan over one (possibly .gz) WARC blob. Contract: records
    after a malformed header block are unreachable (framing is lost), so
    the scan stops there; everything parsed up to that point is kept."""
    if blob[:2] == _GZIP_MAGIC:
        blob = _gunzip_members(blob)
    pos = 0
    while True:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return  # framing lost — cannot find the next record safely
        payload = blob[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        wtype = headers.get("warc-type", "")
        if wtype in keep_types:
            ts = None
            # WARC 1.0 dates are whole seconds; WARC 1.1 allows any
            # fractional precision (up to nanoseconds). ts_epoch is
            # whole seconds, so drop the fraction before parsing —
            # handles 1-9+ digit fractions uniformly.
            ds = headers.get("warc-date", "")
            if "." in ds and ds.endswith("Z"):
                ds = ds[: ds.index(".")] + "Z"
            try:
                ts = int(
                    datetime.strptime(ds, _DATE_FMT)
                    .replace(tzinfo=timezone.utc)
                    .timestamp()
                )
            except ValueError:
                pass
            ctype = headers.get("content-type")
            body = payload
            if ctype is not None and ctype.startswith("application/http"):
                body = _split_http_body(payload)
            yield {
                "url": headers.get("warc-target-uri"),
                "ts_epoch": ts,
                "warc_type": wtype,
                "content_type": ctype,
                "html": body,
                "n_payload_bytes": len(payload),
            }


def parse_warc_blobs(
    df: DataFrame,
    blob_col: str = "content",
    keep_types: tuple[str, ...] = ("response", "resource"),
) -> DataFrame:
    """Binary WARC blobs -> one row per kept record (WARC_SCHEMA).

    ``warcinfo``/``request``/``metadata`` records are dropped by default
    (they are archive bookkeeping, not corpus content). Response-record
    HTTP envelopes are stripped so ``html`` is the document bytes.
    """
    kt = frozenset(keep_types)
    cols = [f.name for f in WARC_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                r
                for blob in b[blob_col]
                if blob is not None
                for r in _parse_one_blob(bytes(blob), kt)
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(blob_col).mapInPandas(run, schema=WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """``binaryFile`` scan -> parse. One task per file; pre-split large
    .warc.gz archives at gzip-member boundaries upstream for finer
    granularity (see module docstring)."""
    return parse_warc_blobs(
        spark.read.format("binaryFile").load(path), "content", **kwargs
    )


def warc_record_bytes(url: str, ts_epoch: int, body: bytes) -> bytes:
    """One deterministic WARC response record (record id = md5 of url,
    so re-writing the same page yields identical bytes)."""
    rid = hashlib.md5(url.encode()).hexdigest()
    date = datetime.fromtimestamp(ts_epoch, tz=timezone.utc).strftime(_DATE_FMT)
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(body)
        + body
    )
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\nWARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def pages_to_warc_blobs(
    pages: DataFrame,
    group_col: str = "warc_group",
    url: str = "url",
    ts_epoch: str = "ts_epoch",
    body: str = "html",
    gzip_members: bool = False,
) -> DataFrame:
    """Inverse seam (the archive *writer*): pack pages into one WARC blob
    per group — (group, content binary). Records are ordered by url
    within a blob so output bytes are partitioning-independent. With
    ``gzip_members`` each record is its own gzip member (mtime pinned to
    0, OS byte fixed — deterministic), the CC splittable layout.
    """
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        recs = []
        pdf = pdf.sort_values(url)
        for u, t, b in zip(pdf[url], pdf[ts_epoch], pdf[body]):
            rec = warc_record_bytes(u, int(t), bytes(b))
            if gzip_members:
                co = zlib.compressobj(6, zlib.DEFLATED, 31)
                # stdlib emits a 10-byte header (no fname); mtime/OS are
                # inside it — rebuild those two fields as constants
                raw = co.compress(rec) + co.flush()
                rec = raw[:4] + b"\x00\x00\x00\x00\x02\xff" + raw[10:]
            recs.append(rec)
        return pd.DataFrame({group_col: [key[0]], "content": [b"".join(recs)]})

    return (
        pages.select(group_col, url, ts_epoch, body)
        .groupBy(group_col)
        .applyInPandas(pack, schema=out_schema)
    )
