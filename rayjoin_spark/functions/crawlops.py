"""Crawl-politeness operators: robots.txt parsing and URL admission.

A crawl pipeline's frontier filter — before fetching (or before keeping
an archived page), every URL is checked against its host's robots.txt.
Both stages are fully declarative (no Python UDF anywhere):

* ``parse_robots`` turns raw robots.txt bodies into a rule table with a
  classic gaps-and-islands plan: posexplode lines -> classify via
  regexp -> lag/cumsum windows assign User-agent *sections* -> join
  agents to their section's rules. Windows partition by host; robots
  bodies are KB-sized, so a partition is one file — embarrassingly
  parallel at any corpus size.
* ``robots_allowed`` evaluates URLs: pick the host's most specific
  matching agent group (exact agent beats ``*``), match rule prefixes,
  longest prefix wins, Allow beats Disallow on equal length (the
  published Google/REP tie-break), no matching rule or no robots ->
  allowed. One equi-join on host (rule side is small — broadcastable)
  plus one combinable per-url argmax.

Spec notes (REP, RFC 9309): rule matching is by raw path prefix
(wildcards are an extension, not implemented — documented); an empty
``Disallow:`` value disallows nothing (rule dropped); agent names are
case-insensitive; a ``User-agent`` line adjacent to another joins the
same group (shared rule block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LINE_RE = r"^(?i)\s*(user-agent|allow|disallow|crawl-delay)\s*:\s*(.*?)\s*$"


def _sections(df: DataFrame, host: str, body: str):
    """Shared parse front-end: lines -> (host, sec, kind, value) with
    User-agent section ids assigned (gaps-and-islands windows)."""
    lines = df.select(
        # hostnames are case-insensitive; url_parts lowercases the URL
        # side, so the rule side must match or admission fails OPEN
        F.lower(F.col(host)).alias("host"),
        F.posexplode(F.split(F.col(body), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        F.regexp_replace("line", "#.*$", "").alias("line"),
    )
    classified = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _LINE_RE, 1)).alias("kind"),
        F.regexp_extract("line", _LINE_RE, 2).alias("value"),
    ).filter(F.col("kind") != "")
    w = Window.partitionBy("host").orderBy("pos")
    sec = classified.withColumn(
        "_new",
        (
            (F.col("kind") == "user-agent")
            & (F.coalesce(F.lag("kind").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("sec", F.sum("_new").over(w))
    agents = sec.filter(F.col("kind") == "user-agent").select(
        "host", "sec", F.lower("value").alias("agent")
    )
    return sec, agents


def parse_robots(
    df: DataFrame, host: str = "host", body: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies -> one row per (host, agent, allow, prefix)."""
    sec, agents = _sections(df, host, body)
    rules = sec.filter(
        F.col("kind").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host",
        "sec",
        (F.col("kind") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
    )
    return agents.join(rules, ["host", "sec"]).select(
        "host", "agent", "allow", "prefix"
    )


def crawl_delays(
    df: DataFrame, host: str = "host", body: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies -> (host, agent, delay_ms) from ``Crawl-delay``
    directives (the de-facto extension most crawlers honor). Fractional
    seconds parse exactly to truncated milliseconds — TEXTUALLY (integer
    and fraction digits split and scaled), never through a double, so
    '1.001' is exactly 1001 ms on any engine. Unparseable values are
    dropped; repeated directives for one (host, agent) — multiple lines
    or RFC-9309-merged duplicate agent groups — collapse to the MOST
    CONSERVATIVE (maximum) delay. Feed into `grouped_index`-based fetch
    slots so each host is polled no faster than it asked."""
    sec, agents = _sections(df, host, body)
    ip = F.element_at(F.split("value", r"\."), 1).cast("bigint")
    fp = F.rpad(
        F.substring(
            F.coalesce(F.try_element_at(F.split("value", r"\."), F.lit(2)), F.lit("")),
            1,
            3,
        ),
        3,
        "0",
    ).cast("bigint")
    delays = sec.filter(
        (F.col("kind") == "crawl-delay")
        & F.col("value").rlike(r"^[0-9]+(\.[0-9]+)?$")
    ).select("host", "sec", (ip * 1000 + fp).alias("delay_ms"))
    return (
        agents.join(delays, ["host", "sec"])
        .groupBy("host", "agent")
        .agg(F.max("delay_ms").alias("delay_ms"))
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url: str = "url",
    broadcast_rules: bool | None = None,
) -> DataFrame:
    """Append ``robots_ok`` to `urls` given a `parse_robots` rule table.

    Group selection: hosts that declare a group for `agent` use ONLY
    those rules; other hosts fall back to their ``*`` group; hosts with
    no robots (or no applicable group) allow everything.

    ``broadcast_rules``: True pins a broadcast of the rule table into
    the URL join (right when rules fit in memory — the URL side never
    shuffles); None (default) lets the optimizer/AQE decide from actual
    sizes, which degrades gracefully to a shuffle join at
    every-host-on-the-web rule-table scale (rows grow with #hosts, not
    robots-file size — a pinned broadcast would hard-fail there).
    """
    from rayjoin_spark.functions.htmlops import url_parts

    a = agent.lower()
    # single pass over `rules` (it is usually an unmaterialized window
    # plan — the old semi/anti/distinct formulation re-ran the whole
    # robots parse three times): score each rule's agent specificity,
    # keep each host's best tier (exact beats '*', everything else out)
    spec = (
        F.when(F.col("agent") == a, 2)
        .when(F.col("agent") == "*", 1)
        .otherwise(0)
    )
    scored = rules.withColumn("_spec", spec).filter(F.col("_spec") > 0)
    best = scored.groupBy("host").agg(F.max("_spec").alias("_mx"))
    eff = (
        scored.join(best, "host")
        .filter(F.col("_spec") == F.col("_mx"))
        .drop("_spec", "_mx")
    )
    u = url_parts(urls, url).withColumnRenamed("host", "_host")
    eff = F.broadcast(eff) if broadcast_rules else eff
    hit = (
        u.select(F.col(url).alias("_u"), "_host", "path")
        .join(eff, F.col("_host") == eff["host"])
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("_u")
        .agg(
            F.max(
                F.struct(
                    F.length("prefix").alias("l"),
                    F.col("allow").cast("int").alias("a"),
                )
            ).alias("_best")
        )
        .select("_u", (F.col("_best.a") == 1).alias("_ok"))
    )
    out = urls.join(hit, urls[url] == hit["_u"], "left").withColumn(
        "robots_ok", F.coalesce(F.col("_ok"), F.lit(True))
    )
    return out.drop("_u", "_ok")


def latest_snapshot(
    pages: DataFrame,
    url: str = "url",
    ts: str = "ts_epoch",
    tiebreak: str | None = None,
) -> DataFrame:
    """Revisit dedup: keep the NEWEST capture of each url (the CC-index
    "latest snapshot" rule — a crawl revisits pages; the corpus wants one
    row per url). One map-side-combinable ``max_by`` groupBy — a hot url
    (many revisits) collapses inside each partition's combiner before the
    single shuffle, so revisit skew never concentrates rows on one task.

    Ties on `ts` are broken deterministically by md5 of `tiebreak` when
    given (highest digest wins); otherwise ties pick an arbitrary-but-
    single row (set `tiebreak` whenever captures can share a timestamp).
    """
    key = F.struct(
        F.col(ts).alias("t"),
        (F.md5(F.col(tiebreak).cast("string")) if tiebreak else F.lit("")).alias(
            "h"
        ),
    )
    row = F.struct(*[F.col(c) for c in pages.columns])
    return (
        pages.groupBy(url)
        .agg(F.max_by(row, key).alias("_r"))
        .select("_r.*")
    )


#: XML predefined entities, ampersand LAST so "&amp;lt;" decodes to the
#: literal "&lt;" (single-pass unescape order; numeric references are
#: decoded before the ampersand pass for the same reason — "&amp;#47;"
#: must yield the literal "&#47;", not "/")
_XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

#: numeric character reference (decimal &#47; or hex &#x2F;)
_NUMREF = r"&#[xX]?[0-9A-Fa-f]+;"


def _numref_char(ref):
    """Decode one numeric character reference Column to its character,
    for PRINTABLE-ASCII code points (32..126 — the range that occurs in
    URLs: / & = ? : ' " etc.); anything else stays literal. Pure
    codegen: code point -> 2-hex-digit byte -> unhex -> utf-8 decode.
    Every parse is guarded so a garbage body degrades to literal: the
    hex branch is length-capped BEFORE conv() (ANSI conv overflows —
    throws, not wraps — past 64 bits, and it is not try_-guardable),
    the decimal branch try_casts (huge values -> NULL, no overflow)."""
    body = F.substring(ref, 3, F.length(ref) - F.lit(3))
    is_hex = F.lower(F.substring(body, 1, 1)) == "x"
    hex_digits = F.substring(body, 2, F.length(body) - F.lit(1))
    code = F.when(
        is_hex,
        # CASE branches evaluate lazily, so conv() never sees a >15-digit
        # body (15 hex digits < 2^60 always fits bigint; in-range code
        # points need only 2)
        F.when(F.length(hex_digits) <= 15, F.conv(hex_digits, 16, 10)),
    ).otherwise(body).try_cast("bigint")
    ch = F.decode(F.unhex(F.lpad(F.conv(code.cast("string"), 10, 16), 2, "0")), "UTF-8")
    return F.when((code >= 32) & (code <= 126), ch).otherwise(ref)


def _decode_xml_entities(col):
    """Single-pass XML unescape of the named entities plus printable-
    ASCII numeric references. Named entities other than &amp; first
    (their bodies can't overlap a numeric ref), then numeric refs, then
    &amp; last — so "&amp;lt;"/"&amp;#47;" decode to the literal texts
    "&lt;"/"&#47;" exactly as a one-pass decoder would. The &amp; pass
    runs PER SEGMENT (the texts between numeric refs), before the
    decoded ref characters are spliced back in — an '&' produced by the
    numeric pass can therefore never pair with a following 'amp;' into
    a phantom '&amp;' ("&#38;amp;" correctly yields the literal
    "&amp;", not "&")."""
    for ent, ch in _XML_ENTITIES[:-1]:
        col = F.replace(col, F.lit(ent), F.lit(ch))

    def _amp(c):
        return F.replace(c, F.lit("&amp;"), F.lit("&"))

    parts = F.split(col, _NUMREF)
    refs = F.regexp_extract_all(col, F.lit(f"({_NUMREF})"), F.lit(1))
    tail = F.zip_with(
        refs,
        F.slice(parts, 2, F.greatest(F.size(parts) - F.lit(1), F.lit(0))),
        lambda r, p: F.concat(_numref_char(r), _amp(p)),
    )
    return F.concat(_amp(F.element_at(parts, 1)), F.array_join(tail, ""))


#: parse_sitemap output columns — same-named input columns are replaced
#: (rename before calling to keep a parent sitemap's fields, e.g. in the
#: two-level sitemapindex flow)
_SITEMAP_FIELDS = ("seq", "loc", "lastmod", "priority")


def parse_sitemap(
    df: DataFrame,
    xml: str = "sitemap_xml",
    block_tag: str = "url",
) -> DataFrame:
    """XML sitemap parse (sitemaps.org protocol) — the discovery stage
    between robots.txt (which names the sitemap) and the crawl frontier:
    turn ``<urlset>`` documents into one row per ``<url>`` entry with
    `loc` (required; whitespace-trimmed, XML entities + printable-ASCII
    numeric character references decoded), `lastmod` (W3C date string or
    NULL) and `priority` (double, NULL when absent or malformed —
    try_cast, so one bad value can't fail the job under ANSI mode).
    Sitemap INDEX files (``<sitemapindex>``) parse with
    ``block_tag="sitemap"``, yielding the child sitemap locs; input
    columns named seq/loc/lastmod/priority are REPLACED by the outputs
    (rename the parent's first when chaining index -> child parses).

    Fully declarative: one ``regexp_extract_all`` pulls the entry blocks
    ((?s) non-greedy, so multi-line pretty-printed XML works), one
    posexplode fans them out (`seq` = 0-based position in the file, the
    crawl-order hint), and per-field regexp_extract + a replace chain
    decode the values — pure JVM codegen, no Python, no XML library, and
    the only shuffle is whatever the caller does next. Entries missing
    ``<loc>`` are dropped (spec: loc is required)."""
    blocks = F.regexp_extract_all(
        F.col(xml),
        F.lit(rf"(?s)<{block_tag}(?:\s[^>]*)?>(.*?)</{block_tag}>"),
        F.lit(1),
    )
    keep = [c for c in df.columns if c != xml and c not in _SITEMAP_FIELDS]
    e = df.select(*keep, F.posexplode(blocks).alias("_seq", "_block"))

    def _field(tag: str) -> F.Column:
        v = F.regexp_extract(
            "_block", rf"(?s)<{tag}(?:\s[^>]*)?>\s*(.*?)\s*</{tag}>", 1
        )
        return F.nullif(v, F.lit(""))

    out = e.select(
        *keep,
        F.col("_seq").cast("bigint").alias("seq"),
        _decode_xml_entities(_field("loc")).alias("loc"),
        _field("lastmod").alias("lastmod"),
        _field("priority").try_cast("double").alias("priority"),
    )
    return out.filter(F.col("loc").isNotNull())


#: Sitemap directive line (RFC 9309 §2.2.4 sitemaps.org extension):
#: GLOBAL scope — valid anywhere in the file, not owned by a User-agent
#: group, so extraction ignores sections entirely.
_SITEMAP_LINE = r"(?i)^\s*sitemap\s*:\s*(\S+)"


def robots_sitemaps(
    df: DataFrame, host: str = "host", body: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies -> (host, sitemap_url): the ``Sitemap:``
    discovery seam that feeds `parse_sitemap` (robots names the sitemap;
    the sitemap names the pages). Unlike Allow/Disallow, the directive
    is global — no section join, just a line scan. URL case is
    preserved (paths are case-sensitive); the host column lowers like
    every other crawlops host key; comments strip before the match
    (same ``#``-to-EOL grammar as `_sections`); duplicates collapse.

    Scale shape: explode + regexp + distinct — one shuffle for the
    dedup, over (host, url) pairs only (robots files name a handful of
    sitemaps each). Pure codegen until the distinct."""
    lines = df.select(
        F.lower(F.col(host)).alias("host"),
        F.explode(F.split(F.col(body), "\n")).alias("line"),
    ).select("host", F.regexp_replace("line", "#.*$", "").alias("line"))
    url = F.regexp_extract("line", _SITEMAP_LINE, 1)
    return (
        lines.select("host", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def recrawl_schedule(
    df: DataFrame,
    url: str = "url",
    ts: str = "ts_epoch",
    fingerprint: str = "fingerprint",
    min_interval_s: int = 60,
    backoff_factor: int = 2,
) -> DataFrame:
    """Change-rate-driven revisit scheduling (Cho & Garcia-Molina,
    "Estimating frequency of change", TOIT 2003 — the classic incremental
    -crawler policy): from a capture history (url, ts, content
    fingerprint), estimate each URL's change period and emit when it is
    next due.

    Estimator, kept INTEGER-EXACT so results hash identically on any
    engine (no log/double): X = observed changes (consecutive captures
    whose fingerprints differ), T = observed span seconds. X/T is the
    Poisson MLE of the change rate, so the revisit period is its
    reciprocal ``T DIV X``; URLs never seen to change back off to
    ``backoff_factor * T`` (exponential horizon growth as evidence of
    stability accumulates — rerunning after the next capture doubles
    again); everything clamps to ``min_interval_s`` politeness.

    Output per url: ``n_caps, n_changes, span_s, change_ppm`` (changes
    per observation interval, parts-per-million — the exact-integer
    stand-in for the rate), ``revisit_s, next_due_epoch``.

    Scale shape: one window (partition by url — captures per url are
    dozens, never skewed) + one combinable groupBy. Both shuffle on the
    url key; at 10^10 urls that is the natural partitioning, and the
    output is exactly the frontier scheduler's input.
    """
    # fingerprint tiebreak: two captures in the same second must order
    # deterministically or n_changes varies run-to-run (the same rule as
    # latest_snapshot's md5 tiebreak — hash-identical on any engine)
    w = Window.partitionBy(url).orderBy(ts, fingerprint)
    prev = F.lag(fingerprint).over(w)
    changed = (prev.isNotNull() & (F.col(fingerprint) != prev)).cast("bigint")
    agg = (
        df.select(url, ts, changed.alias("_chg"))
        .groupBy(url)
        .agg(
            F.count("*").alias("n_caps"),
            F.sum("_chg").alias("n_changes"),
            (F.max(ts) - F.min(ts)).alias("span_s"),
            F.max(ts).alias("_last"),
        )
    )
    est = F.when(
        F.col("n_changes") > 0, F.expr("span_s DIV n_changes")
    ).otherwise(F.col("span_s") * backoff_factor)
    return agg.select(
        url,
        "n_caps",
        "n_changes",
        "span_s",
        F.expr("(n_changes * 1000000) DIV greatest(n_caps - 1, 1)").alias(
            "change_ppm"
        ),
        F.greatest(est, F.lit(min_interval_s)).alias("revisit_s"),
        (F.col("_last") + F.greatest(est, F.lit(min_interval_s))).alias(
            "next_due_epoch"
        ),
    )


def allocate_budget(
    df: DataFrame,
    budget: int,
    host: str = "host",
    demand: str = "demand",
) -> DataFrame:
    """Crawl-budget allocation: split a global per-cycle fetch budget
    across hosts proportionally to their pending demand, by the
    LARGEST-REMAINDER (Hamilton) method — ``sum(quota) == min(budget,
    total_demand)`` exactly, every host gets at most its demand, and the
    result is integer-exact (no double apportionment drift), so two
    engines agree bit-for-bit.

    Plan shape: two scalar aggregates broadcast back via crossJoin (the
    total and the floor-allocation sum — one row each, never a shuffle
    of the host table), plus one `ordered_index` over (-remainder, host)
    for the top-R remainder bonus — the distributed rank, no
    single-partition window, so a web-scale host table (10^8 rows)
    allocates in one range shuffle. Hosts with zero/negative demand drop
    (nothing to fetch)."""
    from rayjoin_spark.plans.ranking import ordered_index

    pos = df.select(
        F.col(host).alias("_host"), F.col(demand).cast("bigint").alias("_dem")
    ).filter(F.col("_dem") > 0)
    tot = pos.agg(F.sum("_dem").alias("_tot"))
    j = (
        pos.crossJoin(F.broadcast(tot))
        .withColumn(
            "_beff", F.least(F.lit(int(budget)).cast("bigint"), F.col("_tot"))
        )
        # _floor, not _base: ordered_index uses _base internally
        .withColumn("_floor", F.expr("(_beff * _dem) DIV _tot"))
        .withColumn("_rem", F.expr("(_beff * _dem) % _tot"))
        .withColumn("_negrem", -F.col("_rem"))
    )
    r = ordered_index(j, ["_negrem", "_host"], "_rk")
    sb = j.agg(F.sum("_floor").alias("_sb"))
    out = r.crossJoin(F.broadcast(sb)).select(
        F.col("_host").alias(host),
        F.col("_dem").alias(demand),
        (
            F.col("_floor")
            + F.when(F.col("_rk") < F.col("_beff") - F.col("_sb"), 1).otherwise(0)
        ).alias("quota"),
    )
    return out


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url: str = "url",
    fingerprint: str = "fingerprint",
) -> DataFrame:
    """Snapshot diff — the freshness report between two crawl cycles:
    one row per url with status ``added`` (new only), ``removed`` (old
    only), ``changed`` (both, fingerprints differ) or ``unchanged``.
    Feed each side through `latest_snapshot` first so urls are unique
    per side. The output drives recrawl dashboards and incremental
    index updates (added+changed = the reprocess set).

    Scale shape: ONE full-outer equi-join on url — both sides shuffle
    on the natural key once; everything else is a codegen CASE.

    Side presence is tracked by explicit marker columns, NOT fingerprint
    nullness — a row whose fingerprint is NULL (hash failure upstream)
    still counts as present on its side. Both-sides fingerprints compare
    null-safely: NULL vs value reports ``changed`` (an unknown hash must
    trigger a refetch), NULL vs NULL reports ``unchanged``."""
    o = old.select(
        F.col(url).alias("_u"), F.col(fingerprint).alias("_fo"), F.lit(1).alias("_po")
    )
    n = new.select(
        F.col(url).alias("_u"), F.col(fingerprint).alias("_fn"), F.lit(1).alias("_pn")
    )
    status = (
        F.when(F.col("_po").isNull(), "added")
        .when(F.col("_pn").isNull(), "removed")
        .when(~F.col("_fo").eqNullSafe(F.col("_fn")), "changed")
        .otherwise("unchanged")
    )
    return (
        o.join(n, "_u", "full_outer")
        .select(F.col("_u").alias(url), status.alias("status"))
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_labels: int = 10,
) -> DataFrame:
    """UT1-style domain blocklist admission: a page is blocked iff its
    host OR ANY parent-domain suffix appears in the blocklist (the
    standard blocklist semantics: listing ``example.org`` blocks
    ``a.b.example.org``). Emits every input row with its host, a
    ``blocked`` int flag, and ``matched_rule`` — the LONGEST matching
    suffix (ties to the lexicographically greatest), null when clean.

    Scale shape: host by codegen regexp (userinfo/port stripped), a
    bounded suffix explode (<= max_labels rows per page), an equi-join
    against the BROADCAST blocklist (blocklists are list-shaped: small
    vs the corpus), and one combinable per-id max — the corpus never
    reshuffles on anything but its own id."""
    from rayjoin_spark.functions.htmlops import _HOST_RE

    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    host = F.regexp_replace(F.regexp_replace(host, r"^[^@]*@", ""), r":[0-9]+$", "")
    withh = df.withColumn("host", host).withColumn("_labels", F.split(F.col("host"), r"\."))
    sufs = withh.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, least(size(_labels), {max_labels})),"
                " i -> array_join(slice(_labels, -i, i), '.'))"
            )
        ).alias("suffix"),
    )
    hits = (
        sufs.join(
            F.broadcast(blocklist.select(F.col("domain").alias("suffix"))), "suffix"
        )
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(F.length("suffix").alias("l"), F.col("suffix").alias("s"))
            ).alias("_m")
        )
        .select(id_col, F.col("_m.s").alias("matched_rule"))
    )
    return withh.drop("_labels").join(hits, id_col, "left").withColumn(
        "blocked", F.col("matched_rule").isNotNull().cast("int")
    )
