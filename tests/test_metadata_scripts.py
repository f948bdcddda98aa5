"""Edge-case tests for WAT-style metadata extraction and the unicode
script profile (oracle parity in test_entry_oracle.py; these pin the
parser contract on hostile fixtures)."""

from pyspark.sql import functions as F

from rayjoin_spark.functions import textops
from rayjoin_spark.functions.htmlops import extract_html_metadata, extract_metadata


def _m(html: str):
    return extract_html_metadata(html.encode("utf-8"))


def test_metadata_basic_fields():
    t, d, r, c, lang = _m(
        '<html lang="en"><head><title>A &amp; B</title>'
        '<meta name="description" content="desc here">'
        '<meta name="robots" content="noindex">'
        '<link rel="canonical" href="https://x.example/p">'
        "</head><body>hi</body></html>"
    )
    assert (t, d, r, c, lang) == (
        "A & B", "desc here", "noindex", "https://x.example/p", "en"
    )


def test_metadata_first_occurrence_wins():
    t, d, _, c, _ = _m(
        "<title>first</title><title>second</title>"
        '<meta name="description" content="one">'
        '<meta name="description" content="two">'
        '<link rel="canonical" href="a"><link rel="canonical" href="b">'
    )
    assert (t, d, c) == ("first", "one", "a")


def test_metadata_unclosed_title_and_missing_fields():
    t, d, r, c, lang = _m("<html><head><title>never closed")
    assert t is None and d is None and r is None and c is None and lang is None


def test_metadata_name_case_and_rel_list():
    # meta name matches case-insensitively; rel is a space-separated list
    t, d, _, c, _ = _m(
        '<meta NAME="Description" content="x">'
        '<link rel="alternate canonical" href="h">'
        "<title>  spaced   out  </title>"
    )
    assert d == "x" and c == "h" and t == "spaced out"


def test_extract_metadata_dataframe(spark):
    df = spark.createDataFrame(
        [(1, '<html lang="de"><title>T1</title></html>'.encode()),
         (2, None)],
        "doc_id long, html binary",
    )
    rows = {r["doc_id"]: r for r in extract_metadata(df).collect()}
    assert rows[1]["title"] == "T1" and rows[1]["page_lang"] == "de"
    assert rows[2]["title"] is None  # null payload -> all-null metadata


def test_script_profile_mixed(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир"),
            (3, "日本語テキスト"),
            (4, "مرحبا"),
            (5, "12345 !!!"),
            (6, "hellos привет"),  # tie of counts -> SCRIPT_RANGES order
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.script_profile(df).collect()}
    assert rows[1]["dominant_script"] == "latin" and rows[1]["n_latin"] == 10
    assert rows[2]["dominant_script"] == "cyrillic" and rows[2]["n_cyrillic"] == 9
    assert rows[3]["dominant_script"] == "cjk" and rows[3]["n_cjk"] == 7
    assert rows[4]["dominant_script"] == "arabic" and rows[4]["n_arabic"] == 5
    assert rows[5]["dominant_script"] == "other" and rows[5]["n_chars"] == 9
    # equal latin/cyrillic counts: the earlier SCRIPT_RANGES entry wins
    assert rows[6]["n_latin"] == rows[6]["n_cyrillic"] == 6
    assert rows[6]["dominant_script"] == "latin"


def test_script_profile_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = textops.script_profile(df).collect()[0]
    assert r["n_chars"] == 0 and r["dominant_script"] == "other"


def test_stream_warc_to_metadata(spark, tmp_path):
    """Composition: streaming WARC ingest -> WAT metadata extraction in
    the same micro-batch plan (mapInPandas runs inside Structured
    Streaming; pages key by url, not doc_id)."""
    from rayjoin_spark.sources import warc
    from rayjoin_spark.streaming.pages_stream import stream_warc_ingest

    src = tmp_path / "warcs"
    src.mkdir()
    recs = b"".join(
        warc.warc_record_bytes(
            f"https://s{i}.example/", 1700000000 + i,
            f'<html lang="en"><head><title>Page {i}</title></head>'
            f"<body>b</body></html>".encode(),
        )
        for i in range(3)
    )
    (src / "a.warc").write_bytes(recs)
    pages = stream_warc_ingest(spark, str(src))
    meta = extract_metadata(pages, id_col="url")
    q = (
        meta.writeStream.outputMode("append")
        .format("memory")
        .queryName("meta_stream_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["url"]: r for r in spark.sql("SELECT * FROM meta_stream_out").collect()}
    finally:
        q.stop()
    assert len(got) == 3
    assert got["https://s1.example/"]["title"] == "Page 1"
    assert all(r["page_lang"] == "en" for r in got.values())
