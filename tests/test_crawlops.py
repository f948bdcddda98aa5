"""robots.txt parse + admission contracts (REP/RFC 9309 subset)."""

from pyspark.sql import functions as F

from rayjoin_spark.functions import crawlops

ROBOTS = """# global group
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: SpecialBot
User-agent: OtherBot
Disallow: /d/   # trailing comment
Allow: /d/open
Disallow:
"""


def _rules(spark):
    df = spark.createDataFrame([("h.example", ROBOTS)], "host string, robots_txt string")
    return crawlops.parse_robots(df)


def test_parse_sections_and_shared_agent_block(spark):
    got = {
        (r.agent, r.allow, r.prefix) for r in _rules(spark).collect()
    }
    assert got == {
        ("*", False, "/private/"),
        ("*", True, "/private/ok"),
        ("specialbot", False, "/d/"),
        ("specialbot", True, "/d/open"),
        ("otherbot", False, "/d/"),
        ("otherbot", True, "/d/open"),
    }  # empty Disallow dropped; comments stripped; agents lowercased


def _verdicts(spark, agent):
    urls = spark.createDataFrame(
        [
            ("https://h.example/d/1",),
            ("https://h.example/d/open2",),
            ("https://h.example/private/x",),
            ("https://h.example/private/ok3",),
            ("https://other.example/private/x",),
        ],
        "url string",
    )
    out = crawlops.robots_allowed(urls, _rules(spark), agent=agent)
    return {r.url: r.robots_ok for r in out.collect()}


def test_star_agent_verdicts(spark):
    v = _verdicts(spark, "*")
    assert v == {
        "https://h.example/d/1": True,
        "https://h.example/d/open2": True,
        "https://h.example/private/x": False,
        "https://h.example/private/ok3": True,  # longest prefix, allow wins
        "https://other.example/private/x": True,  # no robots -> allowed
    }


def test_specific_agent_overrides_star(spark):
    v = _verdicts(spark, "SpecialBot")  # case-insensitive
    assert v == {
        "https://h.example/d/1": False,
        "https://h.example/d/open2": True,
        "https://h.example/private/x": True,  # '*' group ignored entirely
        "https://h.example/private/ok3": True,
        "https://other.example/private/x": True,
    }


def test_no_python_in_plan(spark):
    urls = spark.createDataFrame([("https://h.example/d/1",)], "url string")
    plan = (
        crawlops.robots_allowed(urls, _rules(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crawl_delays(spark):
    body = (
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n\n"
        "User-agent: FastBot\nCrawl-delay: 0.25\n"
        "User-agent: BadBot\nCrawl-delay: soon\n"
    )
    df = spark.createDataFrame([("h.example", body)], "host string, robots_txt string")
    got = {(r.agent, r.delay_ms) for r in crawlops.crawl_delays(df).collect()}
    # 'soon' is unparseable -> dropped; BadBot's section has no valid delay
    assert got == {("*", 2500), ("fastbot", 250)}


def test_latest_snapshot(spark):
    rows = [
        ("u1", 10, "old"),
        ("u1", 30, "new"),
        ("u1", 20, "mid"),
        ("u2", 5, "only"),
        ("u3", 7, "a"),   # tie on ts: md5 tiebreak, deterministic
        ("u3", 7, "b"),
    ]
    df = spark.createDataFrame(rows, "url string, ts_epoch long, text string")
    got = {
        r.url: (r.ts_epoch, r.text)
        for r in crawlops.latest_snapshot(df, tiebreak="text").collect()
    }
    assert got["u1"] == (30, "new") and got["u2"] == (5, "only")
    import hashlib

    win = max(["a", "b"], key=lambda t: hashlib.md5(t.encode()).hexdigest())
    assert got["u3"] == (7, win)
    # partitioning-invariant
    got2 = {
        r.url: (r.ts_epoch, r.text)
        for r in crawlops.latest_snapshot(df.repartition(5), tiebreak="text").collect()
    }
    assert got == got2


def test_crawl_delay_exact_ms_and_merge(spark):
    body = (
        "User-agent: *\nCrawl-delay: 1.001\n"
        "User-agent: x\nCrawl-delay: 5\n\n"
        "User-agent: x\nCrawl-delay: 10\n"  # duplicate group: merge to max
    )
    df = spark.createDataFrame([("h", body)], "host string, robots_txt string")
    got = {(r.agent, r.delay_ms) for r in crawlops.crawl_delays(df).collect()}
    assert got == {("*", 1001), ("x", 10000)}  # no double rounding; max merge


def test_crawl_delay_line_ends_agent_accumulation(spark):
    # RFC 9309: a non-user-agent record ends the group's agent list, so a
    # following User-agent starts a NEW group (pinned behavior)
    body = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"
    df = spark.createDataFrame([("h", body)], "host string, robots_txt string")
    rules = {(r.agent, r.prefix) for r in crawlops.parse_robots(df).collect()}
    assert rules == {("b", "/x")}  # agent a has the delay, not the rule
    delays = {(r.agent, r.delay_ms) for r in crawlops.crawl_delays(df).collect()}
    assert delays == {("a", 1000)}


def test_robots_host_case_insensitive(spark):
    df = spark.createDataFrame(
        [("H.Example", "User-agent: *\nDisallow: /p\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame([("https://h.example/p/x",)], "url string")
    got = crawlops.robots_allowed(urls, crawlops.parse_robots(df)).collect()
    assert got[0].robots_ok is False  # would fail OPEN without lowercasing


def test_robots_sitemaps_global_scope_and_dedup(spark):
    """Sitemap: lines surface regardless of User-agent sections; case
    and indentation don't matter; comments strip; duplicates collapse;
    a file with none yields nothing."""
    body = (
        "User-agent: *\nDisallow: /p\n"
        "Sitemap: https://h.example/a.xml\n"
        "  sitemap: https://h.example/a.xml  # same, indented\n"
        "User-agent: Bot\n"
        "SITEMAP: https://h.example/B.xml\n"
    )
    df = spark.createDataFrame(
        [("H.Example", body), ("other.example", "User-agent: *\nAllow: /\n")],
        "host string, robots_txt string",
    )
    got = {(r.host, r.sitemap_url) for r in crawlops.robots_sitemaps(df).collect()}
    assert got == {
        ("h.example", "https://h.example/a.xml"),
        ("h.example", "https://h.example/B.xml"),  # URL case preserved
    }


def test_recrawl_schedule_contract(spark):
    """Three shapes: a changing url (period = span // changes), a stable
    url (backoff = 2x span), a single capture (clamps to min)."""
    rows = [
        ("u1", 0, "a"), ("u1", 100, "b"), ("u1", 300, "b"), ("u1", 600, "c"),
        ("u2", 0, "x"), ("u2", 500, "x"),
        ("u3", 42, "z"),
    ]
    df = spark.createDataFrame(rows, "url string, ts_epoch bigint, fingerprint string")
    got = {r.url: r for r in crawlops.recrawl_schedule(df, min_interval_s=60).collect()}
    u1 = got["u1"]  # 4 caps, 2 changes over span 600
    assert (u1.n_caps, u1.n_changes, u1.span_s) == (4, 2, 600)
    assert u1.change_ppm == 2 * 1000000 // 3
    assert u1.revisit_s == 300 and u1.next_due_epoch == 900
    u2 = got["u2"]  # never changed: backoff 2*500, due 500+1000
    assert (u2.n_changes, u2.revisit_s, u2.next_due_epoch) == (0, 1000, 1500)
    u3 = got["u3"]  # single capture: span 0 -> min clamp
    assert (u3.n_caps, u3.revisit_s, u3.next_due_epoch) == (1, 60, 102)


def test_allocate_budget_hamilton_exact(spark):
    """sum(quota) == min(budget, total); quota <= demand; largest
    remainders get the bonus; zero-demand hosts drop."""
    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2), ("d", 0)],
        "host string, demand bigint",
    )
    got = {r.host: r.quota for r in crawlops.allocate_budget(hosts, budget=7).collect()}
    # floors: a=3 (35/10), b=2 (21/10), c=1 (14/10); rems .5/.1/.4 -> bonus to a
    assert got == {"a": 4, "b": 2, "c": 1}
    assert sum(got.values()) == 7


def test_allocate_budget_not_binding(spark):
    """budget >= total: every host gets exactly its demand."""
    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3)], "host string, demand bigint"
    )
    got = {r.host: r.quota for r in crawlops.allocate_budget(hosts, budget=100).collect()}
    assert got == {"a": 5, "b": 3}


def test_recrawl_schedule_same_second_deterministic(spark):
    """Captures sharing a timestamp order by fingerprint — n_changes is
    a pure function of the multiset, not of shuffle order."""
    rows = [("u", 100, "b"), ("u", 100, "a"), ("u", 200, "a")]
    df = spark.createDataFrame(rows, "url string, ts_epoch bigint, fingerprint string")
    outs = {
        tuple(r)
        for _ in range(3)
        for r in crawlops.recrawl_schedule(
            df.repartition(4), min_interval_s=1
        ).select("n_changes").collect()
    }
    # order a,b then b->a at ts 200? no: (100,a),(100,b),(200,a): a->b change, b->a change = 2
    assert outs == {(2,)}


def test_crawl_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "B"), ("u4", "d")], "url string, fingerprint string"
    )
    got = {r.url: r.status for r in crawlops.crawl_diff(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed", "u3": "removed", "u4": "added"}


def test_blocklist_suffix_semantics(spark):
    """Listing a domain blocks it and all subdomains; sibling domains
    pass; the longest matching rule wins; userinfo/port strip."""
    from rayjoin_spark.functions.crawlops import blocklist_filter

    rows = [
        (1, "https://ads.example.org/x"),          # exact rule
        (2, "https://a.b.ads.example.org/x"),      # deep subdomain
        (3, "https://u:p@ads.example.org:8443/x"), # userinfo + port
        (4, "https://example.org/x"),              # parent of a rule: clean
        (5, "https://goodads.example.org/x"),      # label boundary: clean
        (6, "https://t.bad.ads.example.org/x"),    # two rules match: longest
    ]
    bl = spark.createDataFrame(
        [("ads.example.org",), ("bad.ads.example.org",)], "domain string"
    )
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r["doc_id"]: r for r in blocklist_filter(df, bl).collect()}
    assert got[1]["blocked"] == 1 and got[1]["matched_rule"] == "ads.example.org"
    assert got[2]["blocked"] == 1 and got[2]["matched_rule"] == "ads.example.org"
    assert got[3]["blocked"] == 1 and got[3]["host"] == "ads.example.org"
    assert got[4]["blocked"] == 0 and got[4]["matched_rule"] is None
    assert got[5]["blocked"] == 0
    assert got[6]["matched_rule"] == "bad.ads.example.org"


def test_crawl_diff_null_fingerprints(spark):
    # review fix: presence comes from side markers, not fingerprint
    # nullness; NULL-vs-value -> changed, NULL-vs-NULL -> unchanged
    from rayjoin_spark.functions.crawlops import crawl_diff

    old = spark.createDataFrame(
        [("u1", "abc"), ("u2", None), ("u3", None), ("u4", "x")],
        "url string, fingerprint string",
    )
    new = spark.createDataFrame(
        [("u1", None), ("u2", "def"), ("u3", None), ("u5", None)],
        "url string, fingerprint string",
    )
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "u1": "changed",   # value -> NULL hash: refetch, NOT 'removed'
        "u2": "changed",   # NULL -> value: refetch, NOT 'added'
        "u3": "unchanged", # both unknown
        "u4": "removed",
        "u5": "added",
    }
