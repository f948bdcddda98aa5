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


_GZ_CHUNK = 1 << 20  # feed the decompressor 1 MiB at a time (see below)


def _iter_member_spans(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Walk a concatenation of gzip members, yielding (offset,
    compressed_length, decompressed_bytes) per member. Input is fed in
    bounded chunks off a memoryview: handing the decompressor the whole
    remaining tail would copy O(members x blob) bytes through
    ``unused_data`` — quadratic on the CC record-per-member layout this
    exists for. Trailing garbage / a truncated final member ends the
    walk at the last complete member — degrade, don't crash."""
    mv = memoryview(blob)
    n = len(blob)
    pos = 0
    while pos < n and blob[pos : pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out = []
        p = pos
        try:
            while not d.eof and p < n:
                chunk = mv[p : p + _GZ_CHUNK]
                out.append(d.decompress(chunk))
                p += len(chunk) - len(d.unused_data)
        except zlib.error:
            return
        if not d.eof:  # truncated member
            return
        yield pos, p - pos, b"".join(out)
        pos = p


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the CC record-per-
    member layout). Trailing garbage / a truncated final member yields
    the bytes decoded so far — degrade, don't crash."""
    return b"".join(data for _, _, data in _iter_member_spans(blob))


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
    for _s, _e, rec in _scan_records(blob, keep_types):
        yield rec


def _scan_records(
    blob: bytes, keep_types: frozenset[str]
) -> Iterator[tuple[int, int, dict]]:
    """Record scan over an UNCOMPRESSED buffer, yielding
    ``(start, end, record)`` — end is the record's THEORETICAL end
    (trailing CRLFCRLF included), which may exceed len(blob) for a
    truncated tail record; callers clamp or skip as their contract
    requires (ingest keeps the partial payload, the CDX index must
    not digest partial bytes)."""
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
            yield (
                start,
                head_end + 4 + clen + 4,
                {
                    "url": headers.get("warc-target-uri"),
                    "ts_epoch": ts,
                    "warc_type": wtype,
                    "content_type": ctype,
                    "html": body,
                    "n_payload_bytes": len(payload),
                },
            )


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


#: CDX index row (the web-archive lookup index, one row per record):
#: surt sort key + where the record lives (offset/rec_length: gzip-member
#: span in the compressed blob for .gz archives — the Common-Crawl CDX
#: contract — or the record's byte span for plain blobs) + payload digest.
CDX_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("ts_epoch", T.LongType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("offset", T.LongType(), False),
        T.StructField("rec_length", T.LongType(), False),
        T.StructField("html", T.BinaryType(), True),
    ]
)


def _scan_with_offsets(
    blob: bytes, keep_types: frozenset[str]
) -> Iterator[dict]:
    """Like `_parse_one_blob` but each record carries (offset,
    rec_length): for a gzip-member blob that is the COMPRESSED member
    span (a reader can fetch exactly those bytes and gunzip one record
    — what CDX offsets are for); for a plain blob, the record's own
    span. Records sharing one gzip member (non-CC layout) share its
    span — documented degradation, never wrong bytes. A record whose
    payload CONTINUES PAST its member (a compressor that cut members
    mid-record) is SKIPPED here — its member span cannot serve the
    whole record, and an index row digesting partial bytes would be
    silently wrong; `_parse_one_blob` (ingest), which concatenates
    members first, still parses it fully."""
    if blob[:2] == _GZIP_MAGIC:
        for pos, mlen, data in _iter_member_spans(blob):
            for _s, end, rec in _scan_records(data, keep_types):
                if end - 4 > len(data):  # payload spans past this member
                    continue
                yield {**rec, "offset": pos, "rec_length": mlen}
    else:
        for s, end, rec in _scan_records(blob, keep_types):
            if end - 4 > len(blob):  # truncated tail — same skip rule
                continue
            yield {**rec, "offset": s, "rec_length": min(end, len(blob)) - s}


def cdx_index(
    df: DataFrame,
    blob_col: str = "content",
    keep_types: tuple[str, ...] = ("response", "resource"),
) -> DataFrame:
    """WARC blobs -> CDX index rows: ``(surt, ts_epoch, url,
    content_type, offset, rec_length, digest_sha256)`` — the archive's
    random-access lookup table (Common Crawl's cc-index equivalent).
    Sorting/bucketing the OUTPUT by surt is the reader's choice; the
    build itself is scan-shaped.

    Scale shape: the same per-blob Python pass as ingest (offsets must
    come from the byte scan), then everything derived — SURT key, SHA-256
    payload digest — is JVM codegen on the parsed columns. Writing the
    index for a 100-TB archive is one linear read of the archive."""
    from rayjoin_spark.functions.htmlops import surt_keys

    kt = frozenset(keep_types)
    cols = [f.name for f in CDX_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                {k: r[k] for k in cols}
                for blob in b[blob_col]
                if blob is not None
                for r in _scan_with_offsets(bytes(blob), kt)
            ]
            yield pd.DataFrame(rows, columns=cols)

    parsed = df.select(blob_col).mapInPandas(run, schema=CDX_SCHEMA)
    return surt_keys(parsed, url="url").select(
        "surt",
        "ts_epoch",
        "url",
        "content_type",
        "offset",
        "rec_length",
        F.sha2("html", 256).alias("digest_sha256"),
    )


def read_warc(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """``binaryFile`` scan -> parse. One task per file; pre-split large
    .warc.gz archives at gzip-member boundaries upstream for finer
    granularity (see module docstring)."""
    return parse_warc_blobs(
        spark.read.format("binaryFile").load(path), "content", **kwargs
    )


def warc_record_bytes(
    url: str, ts_epoch: int, body: bytes, warc_type: str = "response"
) -> bytes:
    """One deterministic WARC record (record id = md5 of url, so
    re-writing the same page yields identical bytes). ``response``
    records wrap the body in an HTTP/1.1 envelope (archive convention);
    any other type — e.g. ``conversion``, the WET extracted-text record
    — carries the body raw as text/plain."""
    rid = hashlib.md5(url.encode()).hexdigest()
    date = datetime.fromtimestamp(ts_epoch, tz=timezone.utc).strftime(_DATE_FMT)
    if warc_type == "response":
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(body)
            + body
        )
        ctype = "application/http; msgtype=response"
    else:
        payload = body
        ctype = "text/plain; charset=utf-8"
    head = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\nWARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def pages_to_warc_blobs(
    pages: DataFrame,
    group_col: str = "warc_group",
    url: str = "url",
    ts_epoch: str = "ts_epoch",
    body: str = "html",
    gzip_members: bool = False,
    warc_type: str = "response",
) -> DataFrame:
    """Inverse seam (the archive *writer*): pack pages into one WARC blob
    per group — (group, content binary). Records are ordered by url
    within a blob so output bytes are partitioning-independent. With
    ``gzip_members`` each record is its own gzip member (mtime pinned to
    0, OS byte fixed — deterministic), the CC splittable layout.
    ``warc_type`` passes through to `warc_record_bytes` (``conversion``
    -> WET-style raw text records).
    """
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        recs = []
        # degrade, don't crash: a NULL url/ts/body row (e.g. extraction
        # returned NULL upstream) is unarchivable — skip it
        pdf = pdf.dropna(subset=[url, ts_epoch, body]).sort_values(url)
        for u, t, b in zip(pdf[url], pdf[ts_epoch], pdf[body]):
            rec = warc_record_bytes(u, int(t), bytes(b), warc_type)
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


def pages_to_wet_blobs(
    pages: DataFrame,
    group_col: str = "warc_group",
    url: str = "url",
    ts_epoch: str = "ts_epoch",
    text: str = "text",
    gzip_members: bool = False,
) -> DataFrame:
    """WET writer (the Common-Crawl *.warc.wet convention): pack pages'
    EXTRACTED TEXT into WARC ``conversion`` records — the derived-text
    sibling of the response archive, what text-first pipelines actually
    read. Compose after `functions/htmlops.extract_main_text` for the
    full WARC -> WET conversion. Same determinism/splittability contract
    as `pages_to_warc_blobs`; `parse_warc_blobs(...,
    keep_types=("conversion",))` reads it back."""
    enc = pages.select(
        group_col,
        url,
        ts_epoch,
        F.encode(F.col(text), "UTF-8").alias("_wet_body"),
    )
    return pages_to_warc_blobs(
        enc,
        group_col,
        url,
        ts_epoch,
        "_wet_body",
        gzip_members,
        warc_type="conversion",
    )
