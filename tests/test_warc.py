"""WARC connector: framing, gzip members, HTTP envelope strip, degrade
contracts, and the distributed write->read round trip."""

import zlib

import pytest
from pyspark.sql import functions as F

from rayjoin_spark.sources import warc

EPOCH = 1766016000  # 2025-12-18T00:00:00Z


def _blob(n=3, gz=False):
    recs = []
    for i in range(n):
        rec = warc.warc_record_bytes(
            f"https://site{i}.example/d/{i}", EPOCH + i, f"<p>doc {i}</p>".encode()
        )
        if gz:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            raw = co.compress(rec) + co.flush()
            rec = raw[:4] + b"\x00\x00\x00\x00\x02\xff" + raw[10:]
        recs.append(rec)
    return b"".join(recs)


def _parse(blob, **kw):
    return list(warc._parse_one_blob(blob, frozenset(("response", "resource")), **kw))


def test_parse_plain_and_gzip_identical():
    plain, gz = _parse(_blob()), _parse(_blob(gz=True))
    assert plain == gz
    assert [r["url"] for r in plain] == [
        f"https://site{i}.example/d/{i}" for i in range(3)
    ]
    assert plain[0]["ts_epoch"] == EPOCH
    assert plain[1]["html"] == b"<p>doc 1</p>"  # HTTP envelope stripped
    assert plain[1]["n_payload_bytes"] > len(plain[1]["html"])


def test_non_response_records_dropped_and_tail_garbage_ignored():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    got = _parse(info + _blob(2) + b"\x00trailing junk without a header")
    assert [r["warc_type"] for r in got] == ["response", "response"]


def test_malformed_content_length_stops_scan_keeps_prefix():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nope\r\n\r\nxx"
    got = _parse(_blob(2) + bad + _blob(1))
    assert len(got) == 2  # framing lost at the bad record


def test_resource_record_and_missing_date():
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: s3://x\r\nContent-Type: text/plain\r\n"
        b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    (r,) = _parse(rec)
    assert r["html"] == b"hello" and r["ts_epoch"] is None


def test_truncated_gzip_member_degrades():
    blob = _blob(2, gz=True)
    got = _parse(blob[: len(blob) - 7])
    assert len(got) >= 1  # first member intact, truncated tail dropped


@pytest.mark.parametrize("gz", [False, True])
def test_distributed_roundtrip(spark, gz):
    pages = spark.range(20).select(
        F.pmod("id", 4).alias("warc_group"),
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
        (F.lit(EPOCH) + F.col("id")).alias("ts_epoch"),
        F.encode(F.concat(F.lit("body "), F.col("id")), "UTF-8").alias("html"),
    )
    blobs = warc.pages_to_warc_blobs(pages, gzip_members=gz)
    assert blobs.count() == 4
    back = warc.parse_warc_blobs(blobs).select(
        "url", "ts_epoch", F.decode("html", "UTF-8").alias("text")
    )
    got = {r.url: (r.ts_epoch, r.text) for r in back.collect()}
    assert got == {f"https://h/{i}": (EPOCH + i, f"body {i}") for i in range(20)}


def test_writer_determinism_partition_independent(spark):
    pages = spark.range(12).select(
        F.lit(0).cast("long").alias("warc_group"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(EPOCH).alias("ts_epoch"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("html"),
    )
    a = warc.pages_to_warc_blobs(pages.repartition(1)).collect()[0].content
    b = warc.pages_to_warc_blobs(pages.repartition(7)).collect()[0].content
    assert bytes(a) == bytes(b)


def test_read_warc_binary_file(spark, tmp_path):
    p = tmp_path / "a.warc.gz"
    p.write_bytes(_blob(3, gz=True))
    got = warc.read_warc(spark, str(p)).orderBy("url").collect()
    assert [r.url for r in got] == [f"https://site{i}.example/d/{i}" for i in range(3)]


def test_stream_warc_ingest(spark, tmp_path):
    from rayjoin_spark.streaming.pages_stream import stream_warc_ingest

    src = tmp_path / "warcs"
    src.mkdir()
    (src / "a.warc").write_bytes(_blob(3))
    (src / "b.warc.gz").write_bytes(_blob(2, gz=True))
    q = (
        stream_warc_ingest(spark, str(src))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("warc_stream_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT url, ts_epoch, warc_ts FROM warc_stream_out"
        ).collect()
    finally:
        q.stop()
    assert len(got) == 5
    assert {r.url for r in got} == {
        f"https://site{i}.example/d/{i}" for i in range(3)
    }
    assert all(int(r.warc_ts.timestamp()) == r.ts_epoch for r in got)


def test_cli_ingest_warc(spark, tmp_path, capsys):
    from rayjoin_spark import cli

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(_blob(4, gz=True))
    out = str(tmp_path / "pages")
    assert cli.main(["ingest-warc", "--warc", str(src), "--out", out]) == 0
    import json as _json

    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 4
    got = spark.read.parquet(out)
    assert got.count() == 4 and "url" in got.columns and "html" in got.columns


def test_fuzz_roundtrip_hostile_bodies():
    """Property: framing survives bodies that LOOK like WARC/HTTP records
    (Content-Length framing must win over any content sniffing)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    body = st.binary(min_size=0, max_size=512)
    hostile = st.sampled_from(
        [
            b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\n",
            b"\r\n\r\nHTTP/1.1 200 OK\r\n\r\n",
            b"Content-Length: 0\r\n",
            b"\x1f\x8b\x08\x00",
        ]
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(body, hostile, body), min_size=1, max_size=6))
    def prop(parts):
        pages = [
            (f"https://h.example/{i}", EPOCH + i, pre + mid + post)
            for i, (pre, mid, post) in enumerate(parts)
        ]
        blob = b"".join(warc.warc_record_bytes(u, t, b) for u, t, b in pages)
        got = list(warc._parse_one_blob(blob, frozenset(("response",))))
        assert [(r["url"], r["ts_epoch"], r["html"]) for r in got] == pages

    prop()


def test_fuzz_canonicalize_idempotent(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rayjoin_spark.functions import htmlops

    label = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
        min_size=1,
        max_size=8,
    )
    path_char = st.text(
        alphabet="abcdefXYZ0123456789/._~%-", min_size=0, max_size=16
    )

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
                st.booleans(),  # www.
                st.lists(label, min_size=1, max_size=3),
                st.sampled_from(["", ":80", ":443", ":8080"]),
                path_char,
                st.sampled_from(["", "?q=1", "?", "#f", "?a=b#c"]),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def prop(specs):
        urls = [
            f"{sch}://{'www.' if www else ''}{'.'.join(hl)}{port}"
            + (f"/{path}" if path else "")
            + tail
            for sch, www, hl, port, path, tail in specs
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        once = htmlops.canonicalize_url(df).select(
            F.col("url_canonical").alias("url")
        )
        twice = htmlops.canonicalize_url(once)
        bad = twice.filter(F.col("url") != F.col("url_canonical")).collect()
        assert not bad, bad

    prop()


def test_warc11_fractional_date():
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Date: 2025-12-18T00:00:01.250Z\r\n"
        b"WARC-Target-URI: https://f/1\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    (r,) = _parse(rec)
    assert r["ts_epoch"] == EPOCH + 1  # truncated to whole seconds


def test_warc11_nanosecond_date():
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Date: 2025-12-18T00:00:01.123456789Z\r\n"
        b"WARC-Target-URI: https://f/2\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    (r,) = _parse(rec)
    assert r["ts_epoch"] == EPOCH + 1


def test_cdx_offsets_plain_slice_exact():
    """Plain-blob CDX spans are writer-exact: blob[offset:offset+len]
    is one full record (starts 'WARC/', ends CRLFCRLF) that re-parses
    to the same url."""
    blob = _blob(3)
    rows = list(warc._scan_with_offsets(blob, frozenset(("response",))))
    assert [r["offset"] for r in rows] == sorted(r["offset"] for r in rows)
    assert sum(r["rec_length"] for r in rows) == len(blob)
    for r in rows:
        span = blob[r["offset"] : r["offset"] + r["rec_length"]]
        assert span.startswith(b"WARC/") and span.endswith(b"\r\n\r\n")
        (re,) = _parse(span)
        assert re["url"] == r["url"]


def test_cdx_offsets_gzip_member_span():
    """Gz-blob CDX spans are COMPRESSED member spans: the slice starts
    at gzip magic, gunzips standalone, and re-parses to the same url —
    the random-access contract CDX offsets exist for."""
    blob = _blob(3, gz=True)
    rows = list(warc._scan_with_offsets(blob, frozenset(("response",))))
    assert sum(r["rec_length"] for r in rows) == len(blob)
    for r in rows:
        span = blob[r["offset"] : r["offset"] + r["rec_length"]]
        assert span[:2] == b"\x1f\x8b"
        (re,) = _parse(zlib.decompress(span, 31))
        assert re["url"] == r["url"]


def test_wet_conversion_record_roundtrip():
    rec = warc.warc_record_bytes("https://h/x", EPOCH, "Té xt.".encode(), "conversion")
    (got,) = list(warc._parse_one_blob(rec, frozenset(("conversion",))))
    assert got["content_type"] == "text/plain; charset=utf-8"
    assert bytes(got["html"]).decode() == "Té xt."
    # conversion records are invisible to the default corpus parse
    assert _parse(rec) == []


def test_cdx_skips_member_spanning_record_ingest_keeps_it():
    """A record whose payload continues past its gzip member gets NO
    index row (a member-span slice can't serve it; a partial digest
    would be wrong) — but ingest, which concatenates members, parses it
    fully."""
    rec = warc.warc_record_bytes("https://h/long", EPOCH, b"x" * 100)
    cut = len(rec) - 60  # split mid-payload
    members = []
    for part in (rec[:cut], rec[cut:]):
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        members.append(co.compress(part) + co.flush())
    blob = b"".join(members)
    idx = list(warc._scan_with_offsets(blob, frozenset(("response",))))
    assert idx == []
    (got,) = _parse(blob)
    assert got["url"] == "https://h/long" and len(got["html"]) == 100


def test_pack_skips_null_rows(spark):
    """NULL url/ts/body rows are unarchivable — skipped, not a task
    crash."""
    pages = spark.createDataFrame(
        [
            (0, "https://h/a", EPOCH, b"ok"),
            (0, None, EPOCH, b"x"),
            (0, "https://h/b", EPOCH, None),
        ],
        "warc_group long, url string, ts_epoch long, html binary",
    )
    blobs = warc.pages_to_warc_blobs(pages).collect()
    recs = list(warc._parse_one_blob(bytes(blobs[0].content), frozenset(("response",))))
    assert [r["url"] for r in recs] == ["https://h/a"]
