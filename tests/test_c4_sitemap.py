"""C4 line/document filter and sitemap-parse contracts."""

from pyspark.sql import functions as F

from rayjoin_spark.functions import crawlops, textops

C4_PAGE = "\n".join(
    [
        "Home | About | Contact",          # no terminal punctuation -> drop
        "A real sentence with content.",   # kept
        "ok!",                             # < 3 words -> drop
        "Please enable javascript now.",   # javascript -> drop
        'He said "stop right there."',     # kept (ends in .)
        "Is this a question?",             # kept (ends in ?)
        '   padded but still a line."  ',  # kept after trim (ends in ")
    ]
)


def test_c4_line_rules(spark):
    df = spark.createDataFrame([(1, C4_PAGE)], "doc_id bigint, text string")
    row = textops.c4_filter(df).collect()[0]
    assert row.n_lines == 7
    assert row.n_kept == 4
    assert row.keep is True
    assert row.kept_text.split("\n") == [
        "A real sentence with content.",
        'He said "stop right there."',
        "Is this a question?",
        '   padded but still a line."  ',  # original line, not the trim
    ]


def test_c4_document_rules(spark):
    rows = [
        (1, "Good line one here.\nGood line two here."),       # keep
        (2, "Good line one here.\nonly one kept"),             # < min_kept
        (3, "Good line one here.\nLorem Ipsum filler text."),  # lorem -> drop
        (4, "Good line one here.\ncode { brace } here."),      # { -> drop
        (5, None),                                             # null text
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.keep, r.n_lines, r.n_kept) for r in textops.c4_filter(df).collect()}
    assert got[1] == (True, 2, 2)
    assert got[2] == (False, 2, 1)
    assert got[3] == (False, 2, 2)
    assert got[4] == (False, 2, 2)
    assert got[5] == (False, 1, 0)


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://h.example/a?x=1&amp;y=&lt;2&gt; </loc>
    <lastmod>2024-05-01</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h.example/b</loc></url>
  <url><lastmod>2024-05-02</lastmod></url>
  <url><loc>https://h.example/c</loc><priority>0.25</priority></url>
</urlset>
"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>https://h.example/sitemap1.xml</loc></sitemap>
  <sitemap><loc>https://h.example/sitemap2.xml</loc><lastmod>2024-01-02</lastmod></sitemap>
</sitemapindex>
"""


def test_sitemap_entries(spark):
    df = spark.createDataFrame(
        [("h.example", SITEMAP)], "host string, sitemap_xml string"
    )
    rows = crawlops.parse_sitemap(df).orderBy("seq").collect()
    # the loc-less third <url> is dropped (loc is required by the spec)
    assert [r.seq for r in rows] == [0, 1, 3]
    assert rows[0].loc == "https://h.example/a?x=1&y=<2>"
    assert rows[0].lastmod == "2024-05-01"
    assert rows[0].priority == 0.8
    assert rows[1].loc == "https://h.example/b"
    assert rows[1].lastmod is None and rows[1].priority is None
    assert rows[2].priority == 0.25
    assert all(r.host == "h.example" for r in rows)


def test_sitemap_index_blocks(spark):
    df = spark.createDataFrame(
        [("h.example", SITEMAP_INDEX)], "host string, sitemap_xml string"
    )
    rows = crawlops.parse_sitemap(df, block_tag="sitemap").orderBy("seq").collect()
    assert [r.loc for r in rows] == [
        "https://h.example/sitemap1.xml",
        "https://h.example/sitemap2.xml",
    ]
    assert rows[1].lastmod == "2024-01-02"


def test_sitemap_empty_and_null(spark):
    df = spark.createDataFrame(
        [("a", "<urlset></urlset>"), ("b", None)],
        "host string, sitemap_xml string",
    )
    assert crawlops.parse_sitemap(df).count() == 0


def test_c4_crlf_and_tab_lines(spark):
    """CRLF pages clean like LF pages; tab padding neither defeats the
    terminal-punctuation test nor inflates the word count."""
    crlf = "Line one has enough words.\r\nLine two also has words.\r\nLine three is here too."
    tabbed = "\tok go now.\nreal words in this line."
    df = spark.createDataFrame(
        [(1, crlf), (2, tabbed)], "doc_id bigint, text string"
    )
    got = {r.doc_id: (r.n_lines, r.n_kept, r.keep) for r in textops.c4_filter(df).collect()}
    assert got[1] == (3, 3, True)
    # "\tok go now." trims to 3 words (a leading-empty token would make 4
    # of a 2-word line elsewhere; here it pins the trim semantics)
    assert got[2] == (2, 2, True)


def test_sitemap_malformed_priority_and_numref(spark):
    """A garbage <priority> degrades to NULL (no ANSI cast crash); ASCII
    numeric character references decode; &amp;#47; stays literal &#47;
    (single-pass semantics); out-of-range refs stay literal."""
    xml = (
        "<urlset>"
        "<url><loc>https://h/a?q=1&#47;2&#x26;b</loc><priority>high</priority></url>"
        "<url><loc>https://h/amp&amp;#47;lit</loc></url>"
        "<url><loc>https://h/big&#9731;ref</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
    rows = crawlops.parse_sitemap(df).orderBy("seq").collect()
    assert rows[0].loc == "https://h/a?q=1/2&b"
    assert rows[0].priority is None
    assert rows[1].loc == "https://h/amp&#47;lit"
    assert rows[2].loc == "https://h/big&#9731;ref"


def test_sitemap_hostile_numrefs(spark):
    """Adversarial numeric refs: a 17-hex-digit ref must not ANSI-
    overflow conv() (stays literal), and '&#38;amp;' must decode to the
    literal '&amp;' (the numeric pass's '&' must not pair with the
    following 'amp;' and get re-decoded)."""
    xml = (
        "<urlset>"
        "<url><loc>https://h/w&#xFFFFFFFFFFFFFFFFF;end</loc></url>"
        "<url><loc>https://h/a?q=1&#38;amp;x</loc></url>"
        "<url><loc>https://h/b?q=1&#x26;amp;y</loc></url>"
        "<url><loc>https://h/c&#999999999999999999999;d</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
    rows = crawlops.parse_sitemap(df).orderBy("seq").collect()
    assert rows[0].loc == "https://h/w&#xFFFFFFFFFFFFFFFFF;end"
    assert rows[1].loc == "https://h/a?q=1&amp;x"
    assert rows[2].loc == "https://h/b?q=1&amp;y"
    assert rows[3].loc == "https://h/c&#999999999999999999999;d"


def test_sitemap_two_level_index_chain(spark):
    """The docstring's own recipe: index parse -> (pretend-fetch) ->
    child parse. The child parse replaces the parent's loc column, so
    the chain composes without ambiguity."""
    idx = spark.createDataFrame(
        [("h.example", SITEMAP_INDEX)], "host string, sitemap_xml string"
    )
    level1 = crawlops.parse_sitemap(idx, block_tag="sitemap")
    fetched = level1.select(
        "host", "loc", F.lit(SITEMAP).alias("sitemap_xml")
    )
    level2 = crawlops.parse_sitemap(fetched)
    # 2 child sitemaps x 3 loc-bearing entries each
    assert level2.count() == 6
    assert level2.columns == ["host", "seq", "loc", "lastmod", "priority"]


def test_c4_filter_plan_is_scan_shaped(spark):
    """Zero exchanges, no Python eval: the filter is pure codegen."""
    df = spark.createDataFrame([(1, C4_PAGE)], "doc_id bigint, text string")
    plan = textops.c4_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
