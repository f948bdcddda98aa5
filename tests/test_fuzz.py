"""Seeded randomized fuzz: engine vs exact oracle on adversarial inputs.

Random segments (including many axis-aligned, shared-endpoint, and
short/degenerate ones — the SoS stress cases) through the full
chains->edges->join path, compared to the arbitrary-precision oracle.
"""

import numpy as np
import pytest

from rayjoin_spark.operators.lsi import lsi_join
from rayjoin_spark.operators.pip import pip_locate
from rayjoin_spark.plans.layers import build_edges
from rayjoin_spark.plans.scaling import GridSpec, compute_scaling

from tests.oracle import build_edges_py, face_of, lsi_oracle, pip_oracle_one, scale_points_py


def _random_layer(spark, n, seed, grid_snap=8):
    """n 2-point chains; coords snapped to 1/grid_snap so coincidences
    (shared endpoints, collinear, identical edges) happen often."""
    rng = np.random.default_rng(seed)
    x0 = np.round(rng.uniform(0, 50, n) * grid_snap) / grid_snap
    y0 = np.round(rng.uniform(0, 50, n) * grid_snap) / grid_snap
    dx = np.round(rng.uniform(-3, 3, n) * grid_snap) / grid_snap
    dy = np.round(rng.uniform(-3, 3, n) * grid_snap) / grid_snap
    # force some degenerate classes
    dx[: n // 10] = 0.0                      # vertical
    dy[n // 10 : n // 5] = 0.0               # horizontal
    x0[n // 5 : n // 4] = x0[: n // 20].repeat(  # duplicated starts
        int(np.ceil((n // 4 - n // 5) / max(n // 20, 1)))
    )[: n // 4 - n // 5]
    rows_c, rows_p = [], []
    for i in range(n):
        if dx[i] == 0 and dy[i] == 0:
            dy[i] = 1.0 / grid_snap
        rows_c.append((i, int(i % 7), int((i + 3) % 7)))
        rows_p.append((i, 0, float(x0[i]), float(y0[i])))
        rows_p.append((i, 1, float(x0[i] + dx[i]), float(y0[i] + dy[i])))
    chains = spark.createDataFrame(
        rows_c, "chain_id long, left_polygon_id long, right_polygon_id long"
    )
    points = spark.createDataFrame(rows_p, "chain_id long, seq int, x double, y double")
    c_py = {r[0]: (r[1], r[2]) for r in rows_c}
    return chains, points, c_py, rows_p


@pytest.mark.parametrize("seed", [1, 7, 99])
def test_fuzz_lsi(spark, seed):
    ca, pa, ca_py, pa_rows = _random_layer(spark, 250, seed)
    cb, pb, cb_py, pb_rows = _random_layer(spark, 250, seed + 1000)
    scaling = compute_scaling(pa, pb)
    ea, eb = build_edges(ca, pa, scaling), build_edges(cb, pb, scaling)
    got = {(r["eid_a"], r["eid_b"]) for r in lsi_join(ea, eb, GridSpec(32)).collect()}
    ea_py = build_edges_py(ca_py, sorted(pa_rows), scaling)
    eb_py = build_edges_py(cb_py, sorted(pb_rows), scaling)
    want = lsi_oracle(ea_py, eb_py)
    assert got == want
    assert len(want) > 50  # sanity: the fixture actually intersects


@pytest.mark.parametrize("seed", [5])
def test_fuzz_pip(spark, seed):
    ca, pa, ca_py, pa_rows = _random_layer(spark, 150, seed)
    rng = np.random.default_rng(seed + 5)
    qpts = [(i, float(np.round(rng.uniform(0, 50) * 8) / 8),
             float(np.round(rng.uniform(0, 50) * 8) / 8)) for i in range(120)]
    pts = spark.createDataFrame(qpts, "point_id long, x double, y double")
    scaling = compute_scaling(pa, pts)
    ea = build_edges(ca, pa, scaling)
    got = {
        r["point_id"]: (r["closest_eid"], r["face_id"])
        for r in pip_locate(pts, ea, scaling, GridSpec(32)).collect()
    }
    ea_py = build_edges_py(ca_py, sorted(pa_rows), scaling)
    xi, yi = scale_points_py([p[1] for p in qpts], [p[2] for p in qpts], scaling)
    for (pid, _, _), px, py in zip(qpts, xi, yi):
        best = pip_oracle_one(int(px), int(py), ea_py)
        assert got[pid] == (None if best is None else best["eid"], face_of(best)), pid


# ---------------------------------------------------------------------------
# Entity-decode + normalize fuzz (webtext graft)
# ---------------------------------------------------------------------------

_NAMED = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"))


def _onepass_decode(s):
    """Independent ONE-PASS reference for crawlops._decode_xml_entities:
    scan left to right, decode numeric refs (printable ASCII, bounded)
    and the five XML named entities; anything else stays literal."""
    import re as _re

    out, i = [], 0
    numref = _re.compile(r"&#([xX])?([0-9A-Fa-f]+);")
    while i < len(s):
        if s[i] == "&":
            m = numref.match(s, i)
            if m:
                isx, body = m.group(1), m.group(2)
                code = None
                if isx:
                    if len(body) <= 15:
                        code = int(body, 16)
                elif body.isdigit() and int(body) < 2**63:
                    code = int(body)
                out.append(chr(code) if code is not None and 32 <= code <= 126 else m.group(0))
                i = m.end()
                continue
            for ent, ch in _NAMED:
                if s.startswith(ent, i):
                    out.append(ch)
                    i += len(ent)
                    break
            else:
                out.append("&")
                i += 1
            continue
        out.append(s[i])
        i += 1
    return "".join(out)


_SOUP = ["&", "amp;", "#38;", "#x26;", "#X2f;", "lt;", "gt;", "quot;", "apos;",
         "#xFFFFFFFFFFFFFFFFF;", "#999999999999999999999;", "#9731;", "#x10FFFF;",
         "#AF;", "#x;", "a", "Zz", "/", ";", "#", "x", "&#", "&amp;", "&#38;amp;",
         "#0;", "#31;", "#32;", "#126;", "#127;"]


@pytest.mark.parametrize("seed", [3, 42])
def test_fuzz_entity_decode_vs_onepass(spark, seed):
    """The declarative entity decoder == an independent one-pass scanner
    on random adversarial entity soup."""
    from rayjoin_spark.functions import crawlops
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    texts = [
        "".join(rng.choice(_SOUP) for _ in range(int(rng.integers(0, 25))))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: r.d
        for r in df.select("i", crawlops._decode_xml_entities(F.col("t")).alias("d")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _onepass_decode(t), (t, got[i], _onepass_decode(t))


@pytest.mark.parametrize("seed", [5])
def test_fuzz_normalize_text_idempotent_and_invariants(spark, seed):
    """normalize_text is idempotent and its output never contains CR,
    tab, control chars, runs of spaces, 3+ newlines, or edge whitespace."""
    import re as _re
    from rayjoin_spark.functions import textops
    from pyspark.sql import functions as F

    pool = [" ", "  ", "\t", "\r\n", "\r", "\n", "\n\n\n\n", "a", "Bc", ".",
            "\u00a0", "\u200b", "\u00ad", "\u0007", "\u202f", "w x", "\ufeff"]
    rng = np.random.default_rng(seed)
    texts = [
        "".join(rng.choice(pool) for _ in range(int(rng.integers(0, 40))))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    once = textops.normalize_text(df).select("doc_id", F.col("norm_text").alias("text"))
    twice = textops.normalize_text(once)
    bad = _re.compile("[\r\t\x00-\x08\x0b\x0c\x0e-\x1f\x7f\u00a0\u200b\u00ad]|  |\n{3}|^[ \n]|[ \n]$")
    for r in twice.collect():
        assert r.norm_text == r.text, (r.text, r.norm_text)  # idempotent
        assert not bad.search(r.norm_text), repr(r.norm_text)


def test_fuzz_winnow_vs_python_mirror(spark):
    """Random texts — including adversarial all-equal and periodic hash
    runs — through the Spark winnowing selection vs an independent pure-
    python mirror of the documented rule (window min, rightmost tie)."""
    import hashlib
    from rayjoin_spark.functions import textops

    rng = np.random.default_rng(12345)
    alpha = "ab \n."  # tiny alphabet -> dense hash collisions and ties
    texts = []
    for i in range(40):
        n = int(rng.integers(0, 60))
        texts.append("".join(rng.choice(list(alpha), n)))
    texts += ["a" * 30, "ab" * 20, "", "abcdefgh"]  # degenerate classes
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in textops.winnow_fingerprints(docs, k=4, w=3).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    for i, t in enumerate(texts):
        ng = max(len(t) - 3, 1)
        hs = [hashlib.md5(t[p:p + 4].encode()).hexdigest() for p in range(ng)]
        want = set()
        for s in range(max(ng - 2, 1)):
            win = hs[s:s + 3]
            m = min(win)
            want.add((s + 1 + max(j for j, h in enumerate(win) if h == m), m))
        assert got.get(i, set()) == want, (i, repr(t))


def test_fuzz_metadata_parser_hostile(spark):
    """Random tag soup through extract_html_metadata: must never raise,
    must be deterministic, and fields must obey the first-wins +
    whitespace-collapse contract."""
    from rayjoin_spark.functions.htmlops import extract_html_metadata

    rng = np.random.default_rng(999)
    frags = [
        "<title>", "</title>", "<meta name=description content=x>",
        '<meta name="robots"', ">", "<link rel=canonical href=h>",
        "<html lang=xx>", "&amp;", "&#xZZ;", "txt ", "<!-- c ", "--!>",
        "<a href='", "<script>", "</head>", "\x00", "é", "<TITLE>T</TITLE>",
    ]
    for trial in range(60):
        n = int(rng.integers(0, 12))
        s = "".join(rng.choice(frags) for _ in range(n))
        out1 = extract_html_metadata(s.encode("utf-8", "ignore"))
        out2 = extract_html_metadata(s.encode("utf-8", "ignore"))
        assert out1 == out2
        title = out1[0]
        if title is not None:
            assert "  " not in title and title == title.strip()
    # invalid utf-8 decodes with replacement, never raises
    assert extract_html_metadata(b"\xff\xfe<title>x</title>")[0] == "x"
