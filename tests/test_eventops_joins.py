"""Semantic tests for the time-series join operators (asof_join,
interval_join) and the cross-document boilerplate score. Oracle parity
runs separately in test_entry_oracle.py; these pin the intended
semantics — tie rules, boundary inclusivity, chunk-spanning exactness —
on crafted fixtures where the right answer is computed by hand or by a
brute-force plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rayjoin_spark.functions.eventops import asof_join, interval_join
from rayjoin_spark.functions.textops import boilerplate_score

EV_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def _ts(us):
    return dt.datetime(2020, 1, 1) + dt.timedelta(microseconds=us)


def _events(spark, rows):
    # rows: (event_id, us_offset, user_id, event_type, value)
    return spark.createDataFrame(
        [(i, _ts(us), u, t, v) for (i, us, u, t, v) in rows], EV_SCHEMA
    )


def test_asof_inclusive_and_tie_rule(spark):
    ev = _events(
        spark,
        [
            (1, 0, 7, "view", 1.0),
            (2, 0, 7, "view", 2.0),   # same ts as event 1: higher id wins
            (3, 0, 7, "click", 0.0),  # click AT the views' ts: inclusive
            (4, 500, 7, "click", 0.0),
            (5, 900, 7, "view", 3.0),
            (6, 1000, 7, "click", 0.0),
            (7, 100, 8, "click", 0.0),  # user 8 has no views at all
        ],
    )
    got = {r["event_id"]: r for r in asof_join(ev).collect()}
    assert set(got) == {3, 4, 6, 7}
    assert got[3]["asof_event_id"] == 2 and got[3]["asof_lag_us"] == 0
    assert got[4]["asof_event_id"] == 2 and got[4]["asof_lag_us"] == 500
    assert got[6]["asof_event_id"] == 5 and got[6]["asof_value"] == 3.0
    assert got[7]["asof_event_id"] is None and got[7]["asof_lag_us"] is None


def test_asof_gap_cap_voids_stale_matches(spark):
    ev = _events(
        spark,
        [
            (1, 0, 1, "view", 1.0),
            (2, 50, 1, "click", 0.0),
            (3, 500, 1, "click", 0.0),
        ],
    )
    got = {r["event_id"]: r for r in asof_join(ev, gap_cap_us=100).collect()}
    assert got[2]["asof_event_id"] == 1
    assert got[3]["asof_event_id"] is None and got[3]["asof_us"] is None


def test_interval_join_boundaries_and_chunk_span(spark):
    # half width 100us -> chunk 200us. Anchor at us=190 spans chunks 0
    # and 1 ([90, 290]); events land on the exact lo/hi boundaries and on
    # both sides of the chunk cut — each must count exactly once.
    w = 100
    ev = _events(
        spark,
        [
            (10, 190, 1, "purchase", 0.0),
            (11, 90, 2, "view", 0.0),    # == lo, included
            (12, 290, 3, "view", 0.0),   # == hi, included
            (13, 89, 4, "view", 0.0),    # just outside
            (14, 291, 5, "view", 0.0),   # just outside
            (15, 199, 6, "view", 0.0),   # chunk 0 side of the cut
            (16, 201, 6, "view", 0.0),   # chunk 1 side, same user
        ],
    )
    got = interval_join(ev, half_width_us=w).collect()
    assert len(got) == 1
    r = got[0]
    # anchor itself + 11, 12, 15, 16
    assert r["interval_id"] == 10 and r["n_events"] == 5
    assert r["n_users"] == 4  # users 1, 2, 3, 6
    assert r["last_us"] - r["first_us"] == 200


def test_interval_join_matches_bruteforce(spark):
    # pseudo-random-ish deterministic spread, several anchors, negative
    # offsets too (exercises the subtract-pmod floor on pre-1970 epochs
    # when the base date minus offset crosses a chunk boundary)
    rows, uid = [], 0
    for i in range(300):
        us = ((i * 7919) % 601) * 37 - 3000
        typ = "purchase" if i % 29 == 0 else "view"
        rows.append((i, us, i % 13, typ, 0.0))
    ev = _events(spark, rows)
    got = {
        r["interval_id"]: (r["n_events"], r["n_users"])
        for r in interval_join(ev, half_width_us=500).collect()
    }
    e = [(i, us, u) for (i, us, u, t, v) in rows]
    want = {}
    for (i, us, u, t, v) in rows:
        if t != "purchase":
            continue
        hits = [(j, eu) for (j, jus, eu) in e if us - 500 <= jus <= us + 500]
        want[i] = (len(hits), len({eu for _, eu in hits}))
    assert got == want


def test_boilerplate_score_groups_and_threshold(spark):
    mk = lambda i, txt, src: (i, txt, src)
    tmpl = "this site is protected by law all rights reserved"
    docs = spark.createDataFrame(
        [
            mk(1, "unique prose alpha beta gamma delta " + tmpl, "a"),
            mk(2, "other words entirely different here too " + tmpl, "a"),
            mk(3, "third doc of source a shares footer text " + tmpl, "a"),
            # same template in source b only once -> NOT boilerplate there
            mk(4, "source b solitary document with footer " + tmpl, "b"),
            mk(5, "tiny", "b"),  # shorter than n tokens -> zeros
        ],
        "doc_id bigint, text string, source string",
    )
    out = {r["doc_id"]: r for r in boilerplate_score(docs, n=5, min_docs=3).collect()}
    assert out[5]["n_grams"] == 0 and out[5]["boiler_frac"] == 0.0
    # the 9-token template yields 5 shared 5-grams in source a docs
    for d in (1, 2, 3):
        assert out[d]["n_boiler"] == 5, out[d]
        assert 0 < out[d]["boiler_frac"] < 1
    # source b: same grams exist but only in one doc of that group
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_frac"] == 0.0
