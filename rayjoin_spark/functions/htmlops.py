"""HTML -> text extraction and URL/line-level webtext operators.

The graft input table carries Common-Crawl-shaped pages
(url string, warc_ts timestamp, html binary, text string, lang string)
with the per-row invariant that `text` is the extraction of `html`
byte-for-byte. Until now the pipeline treated `html` as opaque; this
module implements the extraction side so text can be RE-DERIVED from the
raw html and the invariant *verified* rather than trusted — the webtext
analog of the reference's --check mode (`/root/reference/src/run_query.cu:33-141`
re-computes a query with an independent backend and compares row-exact).

Extraction contract (deterministic, dependency-free, stdlib html.parser
inside an Arrow-batched `mapInPandas` — Python loops only over rows of an
Arrow batch, identical plumbing to the PNG decoder in multimodal.py):

* `<script> <style> <head> <template> <noscript>` subtrees are dropped;
* comments / doctype / processing instructions are dropped;
* block-level tags (p, div, br, h1-h6, li, tr, table, section, ...) emit
  a line break at both open and close; inline tags emit nothing (so
  ``<b>a</b>b`` -> ``ab``, per HTML text semantics);
* character and entity references are decoded (``&amp;`` ``&#169;`` ...);
* within each line, whitespace runs collapse to a single space; lines are
  stripped; empty lines drop; the result is ``"\n".join(lines)``.

Also here, because they operate on the same pages shape:

* `url_parts` / `host_stats` — URL decomposition with JVM-side regex
  (codegen; no Python) and per-host corpus statistics;
* `dedup_lines` — corpus-level duplicated-line removal (the C4/CCNet
  "discard lines repeated across the corpus" rule): one count shuffle on
  a 64-bit line hash + one left join + one per-doc reassembly groupBy.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: subtrees whose text content never reaches the extraction
_SKIP_TAGS = frozenset({"script", "style", "head", "template", "noscript"})

#: tags that terminate a line of extracted text (HTML block-level set)
_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "br", "caption", "dd",
        "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
        "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
        "hr", "html", "body", "li", "main", "nav", "ol", "option", "p",
        "pre", "section", "summary", "table", "tbody", "td", "tfoot",
        "th", "thead", "tr", "ul",
    }
)

_WS_RUN = re.compile(r"\s+")


def _decode_payload(raw) -> str | None:
    """Shared payload-decode prologue of every extractor in this module:
    None passes through; bytes-likes decode utf-8 with replacement; other
    values coerce to str. One definition so the extractors can never
    desynchronize on payload semantics."""
    if raw is None:
        return None
    if isinstance(raw, (bytes, bytearray, memoryview)):
        return bytes(raw).decode("utf-8", "replace")
    return str(raw)


class _TextExtractor(HTMLParser):
    """Streaming extractor: accumulates text parts + line-break markers."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS and tag not in _SKIP_TAGS:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self.parts.append(data)


def extract_html_text(raw) -> str:
    """Extract visible text from one html payload (bytes or str).

    Pure function of the input — the same bytes always yield the same
    string, so extraction is safely re-runnable under task retries
    (idempotence is what makes the byte-identity invariant checkable).
    """
    s = _decode_payload(raw)
    if s is None:
        return ""
    p = _TextExtractor()
    try:
        p.feed(s)
        p.close()
    except Exception:
        # html.parser is tolerant by design; anything that still raises
        # (pathological nesting) keeps whatever text was already seen
        pass
    joined = "".join(p.parts)
    lines = (_WS_RUN.sub(" ", ln).strip() for ln in joined.split("\n"))
    return "\n".join(ln for ln in lines if ln)


def extract_text(
    df: DataFrame, html_col: str = "html", out: str = "extracted_text"
) -> DataFrame:
    """Append `out` = extracted text of `html_col` (binary or string).

    Arrow-batched `mapInPandas`: the Python cost is one parser pass per
    document inside a columnar batch — no per-row serialization, no
    shuffle, embarrassingly parallel over input partitions (scan-shaped;
    at 100 TB this is bounded by read bandwidth, like the reference's
    payload passthrough in run_query.cu).
    """
    schema = T.StructType(df.schema.fields + [T.StructField(out, T.StringType(), True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [extract_html_text(v) for v in pdf[html_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def verify_extraction(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    flag: str = "text_match",
) -> DataFrame:
    """Re-extract text from html and flag rows where it differs from the
    carried `text` column — the per-row byte-identity invariant check."""
    out = extract_text(df, html_col=html_col, out="_reextracted")
    return out.withColumn(flag, F.col("_reextracted").eqNullSafe(F.col(text_col))).drop(
        "_reextracted"
    )


# ---------------------------------------------------------------------------
# URL decomposition + host statistics (JVM-side regex, whole-stage codegen)
# ---------------------------------------------------------------------------

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_parts(df: DataFrame, url: str = "url") -> DataFrame:
    """Add host / registered-ish domain / path / path_depth columns.

    Pure `regexp_extract` column expressions (codegen, no UDF, no
    shuffle). `domain` is the last two host labels — a deterministic
    approximation that an external SQL engine reproduces exactly
    (public-suffix lists are a lookup-table refinement, not a plan
    change).
    """
    host = F.lower(F.regexp_extract(F.col(url), _HOST_RE, 1))
    path = F.regexp_extract(F.col(url), _PATH_RE, 1)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    domain = F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)
    path_depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return (
        df.withColumn("host", host)
        .withColumn("domain", domain)
        .withColumn("path", path)
        .withColumn("path_depth", path_depth)
    )


def surt_keys(df: DataFrame, url: str = "url", out: str = "surt") -> DataFrame:
    """Add the SURT (Sort-friendly URI Reordering Transform) key — the
    canonical sort/lookup key of web-archive CDX indexes: host labels
    reversed and comma-joined, then ``)`` and the path+query, e.g.
    ``https://www.example.org:8080/a?q=1#f -> org,example:8080)/a?q=1``.
    Scheme, fragment and userinfo drop, host lowercases, a leading
    ``www.`` strips, scheme-DEFAULT ports (http:80 / https:443) drop
    (all standard CDX canonicalization — an index built from one form
    must serve lookups in the other), non-default ports keep, an empty
    path becomes ``/``. Sorting by surt clusters one registered
    domain's captures contiguously — the access pattern CDX exists for.

    Pure regexp/array codegen (no UDF, no shuffle); an external SQL
    engine reproduces it exactly."""
    scheme = F.lower(F.regexp_extract(F.col(url), r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    auth = F.regexp_replace(
        F.lower(F.regexp_extract(F.col(url), _HOST_RE, 1)), r"^[^@]*@", ""
    )
    hostp = F.regexp_replace(
        F.regexp_extract(auth, r"^([^:]*)", 1), r"^www\.", ""
    )
    raw_port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    is_default = ((scheme == "http") & (raw_port == "80")) | (
        (scheme == "https") & (raw_port == "443")
    )
    port = F.when(is_default, F.lit("")).otherwise(raw_port)
    rev = F.array_join(F.reverse(F.split(hostp, r"\.")), ",")
    pq = F.regexp_replace(
        F.regexp_replace(
            F.col(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""
        ),
        r"#.*$",
        "",
    )
    pq = F.when(pq == "", F.lit("/")).otherwise(pq)
    surt = F.concat(
        rev,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        pq,
    )
    return df.withColumn(out, surt)


def host_stats(df: DataFrame, url: str = "url", text: str = "text") -> DataFrame:
    """Per-host corpus statistics: page count, distinct languages, total
    text bytes, mean path depth. One groupBy (map-side partial agg);
    host keys are the natural skew axis of a web crawl, and every agg
    here is algebraic so hot hosts cost one combiner, not one task."""
    parts = url_parts(df, url)
    return parts.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.length(F.col(text))).alias("text_chars"),
        F.avg("path_depth").alias("avg_path_depth"),
    )


# ---------------------------------------------------------------------------
# Corpus-level line dedup (C4 / CCNet rule)
# ---------------------------------------------------------------------------


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_count: int = 2,
    split_pattern: str = "\n",
    joiner: str = "\n",
) -> DataFrame:
    """Remove every line whose corpus-wide frequency >= min_count.

    The C4 pipeline discards lines repeated across the corpus (Raffel et
    al. 2020 §2.2, "three-sentence span" variant simplified to lines, as
    in CCNet). Returns one row per input document:
    (id, clean_text, lines_kept, lines_dropped).

    ``split_pattern``/``joiner`` generalize the unit: the defaults give
    C4/CCNet line dedup; `dedup_paragraphs` passes the blank-line split
    for Dolma-style paragraph dedup (Soldaini et al. 2024 §4: duplicate
    paragraphs are removed corpus-wide before mixing). NOTE the split is
    a REGEX (java.util.regex in Spark, mirrored by the oracle's RE2).

    Scale shape: lines explode once (linear); the frequency count
    shuffles on a 64-bit `xxhash64(line)` — compact uniform keys, map-side
    partial agg so a line repeated 10^9 times costs one combiner per
    partition, not a hot reducer; the duplicate set joins back by hash
    (dup lines are a tiny fraction of a real corpus — AQE may broadcast
    it, large dup sets degrade to a hash join, both correct); reassembly
    is one groupBy per doc with an array_sort on (line_no) — bounded by
    document size, not corpus size.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text), split_pattern)).alias("line_no", "line"),
    ).withColumn("lh", F.xxhash64("line"))
    dup = (
        lines.groupBy("lh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("lh", F.lit(1).alias("_dup"))
    )
    flagged = lines.join(dup, "lh", "left")
    # collect_list skips nulls: only kept lines enter the ordered array
    cleaned = flagged.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_dup").isNull(), F.struct("line_no", "line")
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.col("_dup")).alias("lines_dropped"),
        (F.count("*") - F.count(F.col("_dup"))).alias("lines_kept"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(cleaned, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("lines_kept", F.lit(0)).cast("bigint").alias("lines_kept"),
            F.coalesce("lines_dropped", F.lit(0)).cast("bigint").alias("lines_dropped"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Dolma-style corpus-wide paragraph dedup (Soldaini et al. 2024):
    `dedup_lines` over blank-line-separated paragraphs — a paragraph
    whose corpus frequency >= min_count is removed from every document;
    survivors are rejoined with a canonical blank line. Same scale shape
    as line dedup (one explode, xxhash64-keyed combinable count, hash
    join back, per-doc bounded reassembly)."""
    return dedup_lines(
        df,
        id_col=id_col,
        text=text,
        min_count=min_count,
        split_pattern="(\r?\n){2,}",
        joiner="\n\n",
    )


def canonicalize_url(df: DataFrame, url: str = "url", out: str = "url_canonical") -> DataFrame:
    """URL canonicalization — the dedup key a crawler uses so
    ``HTTP://WWW.Site.Example:80/a#frag`` and ``http://site.example/a``
    collapse to one frontier entry. Deterministic, pure codegen
    (`regexp_replace` chain, no UDF, no shuffle):

    * scheme and host lowercased (path/query case preserved);
    * ``www.`` host prefix dropped;
    * default ports stripped (``:80`` for http, ``:443`` for https);
    * fragment dropped; a bare trailing ``?`` dropped;
    * empty path before a query/end becomes ``/``.
    """
    u = F.col(url)
    # lowercase scheme://host[:port] prefix only; rest built from Column
    # expressions (no SQL-string interpolation of the column name)
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = u.substr(F.length(head) + F.lit(1), F.length(u))
    c = F.concat(F.lower(head), rest)
    c = F.regexp_replace(c, r"^(https?://)www\.", r"$1")
    c = F.regexp_replace(c, r"^(http://[^/?#]*):80(?=[/?#]|$)", r"$1")
    c = F.regexp_replace(c, r"^(https://[^/?#]*):443(?=[/?#]|$)", r"$1")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"\?$", "")
    c = F.regexp_replace(c, r"^(https?://[^/?#]+)(?=\?|$)", r"$1/")
    return df.withColumn(out, c)


class _LinkExtractor(HTMLParser):
    """Collects (href, anchor_text) for every ``<a href=...>`` — skipped
    subtrees (script/style/head/...) contribute no links, matching the
    text-extraction contract."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._skip_depth = 0
        self._open: list[tuple[str, list[str]]] = []  # (href, text parts)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a" and not self._skip_depth:
            href = next((v for k, v in attrs if k == "href" and v), None)
            if href is not None:
                self._open.append((href, []))

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "a" and self._open and not self._skip_depth:
            # the skip-depth gate keeps a stray </a> inside head/script/
            # noscript from terminating a live anchor (skipped subtrees
            # must contribute NOTHING, not even close tags)
            href, parts = self._open.pop()
            self.links.append((href, _WS_RUN.sub(" ", "".join(parts)).strip()))

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            for _, parts in self._open:
                parts.append(data)


def extract_html_links(raw, base_url: str | None = None) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs from one html payload; with `base_url`,
    relative hrefs are resolved (stdlib urljoin). Pure + idempotent,
    same contract as extract_html_text. Unclosed ``<a>`` tags at EOF are
    dropped (no balanced close = no link, the conservative read)."""
    from urllib.parse import urljoin

    s = _decode_payload(raw)
    if s is None:
        return []
    p = _LinkExtractor()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    if base_url is None:
        return p.links
    return [(urljoin(base_url, h), t) for h, t in p.links]


def extract_links(
    df: DataFrame, html_col: str = "html", url_col: str | None = "url"
) -> DataFrame:
    """One row per ``<a href>``: (url, href, anchor) — the REAL link
    graph, extracted from page bytes (feed `href`/`url` through
    `url_parts` + `operators/graph.pagerank` for host-level crawl
    prioritization over actual links instead of a synthesized graph).

    Arrow-batched `mapInPandas`, scan-shaped like extract_text; output
    fan-out is the per-page link count (bounded in practice; a link farm
    fans one input row into its own partition's rows only — no shuffle).
    With `url_col` set, relative hrefs resolve against the page url.
    """
    out_fields = []
    if url_col is not None:
        out_fields.append(T.StructField("url", T.StringType(), True))
    out_fields += [
        T.StructField("href", T.StringType(), False),
        T.StructField("anchor", T.StringType(), False),
    ]
    schema = T.StructType(out_fields)
    cols = [c for c in (url_col, html_col) if c is not None]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            if url_col is not None:
                for base, payload in zip(pdf[url_col], pdf[html_col]):
                    for h, t in extract_html_links(payload, base):
                        rows.append((base, h, t))
            else:
                for payload in pdf[html_col]:
                    rows.extend(extract_html_links(payload))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(*cols).mapInPandas(run, schema=schema)


class _BlockCollector(HTMLParser):
    """Segments a page into block-level text runs, tracking per block the
    raw text length and the raw length of text inside anchors — the
    inputs of the link-density boilerplate heuristic."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[list[str], int, int]] = []  # parts, link, total
        self._parts: list[str] = []
        self._link = 0  # chars inside BALANCED anchors
        self._total = 0  # all chars
        self._pending = 0  # chars inside a still-open anchor
        self._skip_depth = 0
        self._a_depth = 0

    def _close_anchor(self) -> None:
        # pending chars become link chars only when the anchor CLOSES;
        # an anchor left open (malformed markup, close tag swallowed by
        # a skipped subtree, block boundary) degrades to plain text —
        # conservative-KEEP, so one broken <a> can never mark the rest
        # of the page link-dense and silently delete the article
        self._link += self._pending
        self._pending = 0
        self._a_depth = 0

    def _flush(self) -> None:
        if self._total:
            self.blocks.append((self._parts, self._link, self._total))
        self._parts, self._link, self._total, self._pending = [], 0, 0, 0
        self._a_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif self._skip_depth:
            return  # skipped subtrees contribute nothing — not even
            # block boundaries or anchor state
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            if self._a_depth:  # HTML implied close: <a> ends previous <a>
                self._close_anchor()
            self._a_depth = 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif self._skip_depth:
            return
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a" and self._a_depth:
            self._close_anchor()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS and not self._skip_depth:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._parts.append(data)
        n = len(data.strip())
        self._total += n
        if self._a_depth:
            self._pending += n

    def close(self):  # noqa: D102 — flush the trailing block
        super().close()
        self._flush()


def extract_main_html_text(
    raw, max_link_density_pct: int = 50, min_chars: int = 15
) -> tuple[str, int, int]:
    """Main-content extraction for one page (the readability/Boilerpipe
    stage): drop navigation/footer boilerplate blocks, keep content.

    A block survives iff its normalized text has >= `min_chars` chars
    AND its link density (raw in-anchor chars * 100 <= raw chars *
    max_link_density_pct — integer compare, no float) is at most the
    threshold. Returns (main_text, n_blocks, n_kept). Pure + idempotent
    like extract_html_text; same skip-subtree contract.
    """
    s = _decode_payload(raw)
    if s is None:
        return "", 0, 0
    p = _BlockCollector()
    try:
        p.feed(s)
        p.close()
    except Exception:
        p._flush()
    kept = []
    for parts, link, total in p.blocks:
        norm = _WS_RUN.sub(" ", "".join(parts)).strip()
        if len(norm) >= min_chars and link * 100 <= total * max_link_density_pct:
            kept.append(norm)
    return "\n".join(kept), len(p.blocks), len(kept)


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    out: str = "main_text",
    max_link_density_pct: int = 50,
    min_chars: int = 15,
) -> DataFrame:
    """Append (out, n_blocks, n_kept) — boilerplate-removed main content
    per page. Arrow-batched `mapInPandas`, scan-shaped like
    extract_text; the heuristic is integer-only, so results are
    bit-stable across engines and partitionings."""
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(out, T.StringType(), True),
            T.StructField("n_blocks", T.IntegerType(), False),
            T.StructField("n_kept", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            res = [
                extract_main_html_text(v, max_link_density_pct, min_chars)
                for v in pdf[html_col]
            ]
            pdf[out] = [r[0] for r in res]
            pdf["n_blocks"] = [r[1] for r in res]
            pdf["n_kept"] = [r[2] for r in res]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def anchor_text_agg(
    links: DataFrame,
    href: str = "href",
    anchor: str = "anchor",
    top_k: int = 5,
) -> DataFrame:
    """Per-target anchor-text profile — how the rest of the web
    DESCRIBES each URL: inbound-link count, distinct anchor-text count,
    and the top_k most frequent anchor texts ('|'-joined, count desc /
    text asc). The classic anchor-text corpus for retrieval training
    data and link-spam features; feed `extract_links` output in.

    Scale shape: one combinable (href, anchor) count groupBy collapses
    the raw link volume first (a mega-target's billion inbound rows
    become one row per distinct anchor text), then the per-target top-k
    rank runs through `grouped_index` — the skew-safe distributed rank,
    no PARTITION BY href window, so the web's most-linked page cannot
    pin a task. The final collect_list is bounded at top_k rows/group.
    """
    from rayjoin_spark.plans.ranking import grouped_index

    cnt = (
        links.groupBy(F.col(href).alias("_href"), F.col(anchor).alias("_anchor"))
        .agg(F.count("*").alias("_n"))
        .withColumn("_negn", -F.col("_n"))
    )
    rk = grouped_index(cnt, ["_href"], ["_negn", "_anchor"], "_rk")
    # one aggregation computes totals AND the top-k list: collect_list
    # skips the NULLs the when() leaves for rank >= top_k, so the list
    # stays bounded at top_k entries per group — no second groupBy, no
    # rejoin
    return (
        rk.groupBy("_href")
        .agg(
            F.sum("_n").alias("n_links"),
            F.count("*").alias("n_distinct_anchors"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rk") < top_k,
                                F.struct(F.col("_rk"), F.col("_anchor")),
                            )
                        )
                    ),
                    lambda s: s["_anchor"],
                ),
                "|",
            ).alias("top_anchors"),
        )
        .withColumnRenamed("_href", href)
        .select(href, "n_links", "n_distinct_anchors", "top_anchors")
    )


class _MetaExtractor(HTMLParser):
    """Collects the WAT-style head metadata of a page: <title> text, the
    first <meta name=description|robots content=...>, the first
    <link rel=canonical href=...>, and the <html lang=...> attribute.
    Head content is metadata here, NOT text — this parser reads exactly
    the subtrees extract_text skips (complementary contracts)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: str | None = None
        self.description: str | None = None
        self.robots: str | None = None
        self.canonical: str | None = None
        self.lang: str | None = None
        self._in_title = False
        self._title_parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        a = {k: v for k, v in attrs if v is not None}
        if tag == "html" and self.lang is None and "lang" in a:
            self.lang = a["lang"]
        elif tag == "title" and self.title is None:
            self._in_title = True
        elif tag == "meta":
            name = (a.get("name") or "").lower()
            if name == "description" and self.description is None:
                self.description = a.get("content")
            elif name == "robots" and self.robots is None:
                self.robots = a.get("content")
        elif tag == "link":
            rels = (a.get("rel") or "").lower().split()
            if "canonical" in rels and self.canonical is None:
                self.canonical = a.get("href")

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._in_title:
            self._in_title = False
            self.title = _WS_RUN.sub(" ", "".join(self._title_parts)).strip()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_parts.append(data)


def extract_html_metadata(raw) -> tuple:
    """(title, description, robots, canonical, lang) from one html
    payload; absent fields are None. First occurrence wins for each
    field (the WAT convention); an unclosed <title> at EOF yields no
    title (no balanced close = no value, matching extract_html_links'
    conservative read). Pure + idempotent."""
    s = _decode_payload(raw)
    if s is None:
        return (None, None, None, None, None)
    p = _MetaExtractor()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    return (p.title, p.description, p.robots, p.canonical, p.lang)


def extract_metadata(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-page head metadata — the WAT-record extraction stage of an
    archive pipeline (Common Crawl WAT files carry exactly these fields:
    Head-Title, Head-Metas, Link rel=canonical): one output row per page
    with (title, description, robots, canonical, lang), nulls for absent
    fields. Canonical feeds canonical-URL dedup; robots feeds
    noindex/nofollow admission.

    Arrow-batched `mapInPandas` over the binary html, scan-shaped (one
    output row per input row, no fan-out, no shuffle) — the same
    plumbing and decode contract as extract_text/extract_links. The id
    column's type is carried through from the input (bigint doc ids and
    string urls both work — streamed pages key by url)."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("title", T.StringType(), True),
            T.StructField("description", T.StringType(), True),
            T.StructField("robots", T.StringType(), True),
            T.StructField("canonical", T.StringType(), True),
            T.StructField("page_lang", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (i, *extract_html_metadata(payload))
                for i, payload in zip(pdf[id_col], pdf[html_col])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, html_col).mapInPandas(run, schema=schema)


class _JsonLdCollector(HTMLParser):
    """Collects the raw text of every <script type="application/ld+json">
    block (python's HTMLParser switches to CDATA mode inside <script>, so
    the JSON arrives verbatim in handle_data, charrefs untouched)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._in_ld = False
        self._parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "script":
            a = {k: v for k, v in attrs if v is not None}
            # MIME parameters (e.g. "; charset=utf-8") are legal and seen
            # in the wild — match on the media type alone
            t = (a.get("type") or "").split(";")[0].strip().lower()
            if t == "application/ld+json":
                self._in_ld = True
                self._parts = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "script" and self._in_ld:
            self._in_ld = False
            self.blocks.append("".join(self._parts))

    def handle_data(self, data: str) -> None:
        if self._in_ld:
            self._parts.append(data)


def _jsonld_types(obj) -> list[str]:
    """@type values of a parsed JSON-LD payload: a top-level object's
    @type (string or list of strings), or each element's @type for a
    top-level array (order of appearance; absent/odd-typed -> skipped)."""
    items = obj if isinstance(obj, list) else [obj]
    out: list[str] = []
    for it in items:
        if not isinstance(it, dict):
            continue
        t = it.get("@type")
        if isinstance(t, str):
            out.append(t)
        elif isinstance(t, list):
            out.extend(x for x in t if isinstance(x, str))
    return out


def extract_html_jsonld(raw) -> tuple[int, int, list[str]]:
    """(n_blocks, n_valid, types) for one html payload: count of ld+json
    script blocks, how many parse as JSON, and the @type values of the
    valid ones in document order. Pure + idempotent."""
    import json

    s = _decode_payload(raw)
    if s is None:
        return (0, 0, [])
    p = _JsonLdCollector()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    n_valid, types = 0, []
    for block in p.blocks:
        try:
            obj = json.loads(block)
        except ValueError:
            continue
        n_valid += 1
        types.extend(_jsonld_types(obj))
    return (len(p.blocks), n_valid, types)


def extract_jsonld(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Structured-data (JSON-LD) extraction — the schema.org side of a
    WAT-style archive pipeline (Common Crawl WAT records carry the
    Script/@type inventory of each page): one row per page with the
    ld+json block count, how many parse, and the ';'-joined @type list.

    Same Arrow-batched `mapInPandas` plumbing and decode contract as
    extract_text / extract_metadata: scan-shaped, one output row per
    input row, no shuffle."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("n_ld_blocks", T.LongType(), False),
            T.StructField("n_ld_valid", T.LongType(), False),
            T.StructField("ld_types", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[html_col]):
                nb, nv, types = extract_html_jsonld(payload)
                rows.append((i, nb, nv, ";".join(types)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, html_col).mapInPandas(run, schema=schema)


_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)


def sniff_charset(raw) -> tuple[str, str]:
    """(charset, evidence) for one html payload — the decode-stage
    diagnostic of an archive pipeline (WARC payloads carry no reliable
    encoding; real crawls sniff). Deterministic precedence, first hit
    wins, mirroring the WHATWG sniff order:

      1. BOM (utf-8 / utf-16le / utf-16be)         evidence='bom'
      2. <meta charset=...> / http-equiv content    evidence='meta'
         (byte-level regex over the first 1024 bytes, ASCII-compatible
         prefix assumed, charset name lowercased)
      3. strict-UTF-8 decodability of the payload   evidence='valid-utf8'
      4. fallback                                   ('windows-1252','fallback')

    Pure function of the bytes; None/str payloads report ('none','empty')
    / ('utf-8','str')."""
    if raw is None:
        return ("none", "empty")
    if isinstance(raw, str):
        return ("utf-8", "str")
    b = bytes(raw)
    if not b:
        return ("none", "empty")
    if b.startswith(b"\xef\xbb\xbf"):
        return ("utf-8", "bom")
    if b.startswith(b"\xff\xfe"):
        return ("utf-16le", "bom")
    if b.startswith(b"\xfe\xff"):
        return ("utf-16be", "bom")
    m = _META_CHARSET.search(b[:1024])
    if m:
        return (m.group(1).decode("ascii", "replace").lower(), "meta")
    try:
        b.decode("utf-8")
        return ("utf-8", "valid-utf8")
    except UnicodeDecodeError:
        return ("windows-1252", "fallback")


def detect_charset(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-page charset sniff over binary payloads: (id, charset,
    charset_evidence). Same Arrow-batched mapInPandas scan shape as the
    other extractors — no shuffle, one row per page."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("charset", T.StringType(), False),
            T.StructField("charset_evidence", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (i, *sniff_charset(payload))
                for i, payload in zip(pdf[id_col], pdf[html_col])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, html_col).mapInPandas(run, schema=schema)
