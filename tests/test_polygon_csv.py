"""Polygon-per-line CSV source (reference src/map/polygon_parser.h)."""

import pytest

from rayjoin_spark.sources.polygon_csv import polygons_to_chains, read_polygon_csv

FIXTURE = """3
0 0,0 4,0 4,4 0,4
1 10,10 14,10 12,13
2 -2,-2 -1,-2 -1,-1 -2,-1 -2,-2
"""


def _write(tmp_path, text, name="polys.csv"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _python_parse(text, head_eq_tail=False):
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    out = []
    for ln in lines[1:]:
        toks = ln.split(" ")
        pid = int(toks[0])
        ring = [tuple(float(v) for v in t.split(",")) for t in toks[1:]]
        if head_eq_tail and ring[0] != ring[-1]:
            ring.append(ring[0])
        out += [(pid, i, x, y) for i, (x, y) in enumerate(ring)]
    return sorted(out)


def test_parse_matches_python_oracle(spark, tmp_path):
    path = _write(tmp_path, FIXTURE)
    got = sorted(
        (r["polygon_id"], r["seq"], r["x"], r["y"])
        for r in read_polygon_csv(spark, path).collect()
    )
    assert got == _python_parse(FIXTURE)


def test_head_eq_tail_closes_open_rings(spark, tmp_path):
    path = _write(tmp_path, FIXTURE)
    got = sorted(
        (r["polygon_id"], r["seq"], r["x"], r["y"])
        for r in read_polygon_csv(spark, path, head_eq_tail=True).collect()
    )
    want = _python_parse(FIXTURE, head_eq_tail=True)
    assert got == want
    # polygon 2 is already closed: no extra vertex (reference numeric
    # compare, src/map/polygon_parser.h:73-78)
    assert sum(1 for r in want if r[0] == 2) == 5


def test_bad_polygon_id_rejected(spark, tmp_path):
    path = _write(tmp_path, "2\n0 0,0 1,0\n5 2,2 3,3\n")
    with pytest.raises(ValueError, match="out of range"):
        read_polygon_csv(spark, path)


def test_declared_count_mismatch_rejected(spark, tmp_path):
    path = _write(tmp_path, "9\n0 0,0 1,0\n1 2,2 3,3\n")
    with pytest.raises(ValueError, match="declares 9"):
        read_polygon_csv(spark, path)


def test_polygons_to_chains_feeds_the_engine(spark, tmp_path):
    from rayjoin_spark.plans.layers import build_edges
    from rayjoin_spark.plans.scaling import compute_scaling

    path = _write(tmp_path, FIXTURE)
    chains, points = polygons_to_chains(
        read_polygon_csv(spark, path, head_eq_tail=True)
    )
    ch = {r["chain_id"]: r.asDict() for r in chains.collect()}
    # CDB-convention cumulative offsets over the CLOSED rings (5, 4, 5 pts)
    assert ch[0]["first_point_idx"] == 0 and ch[0]["last_point_idx"] == 4
    assert ch[1]["first_point_idx"] == 5 and ch[1]["last_point_idx"] == 8
    assert ch[2]["first_point_idx"] == 9 and ch[2]["last_point_idx"] == 13
    assert ch[1]["left_polygon_id"] == 2 and ch[1]["right_polygon_id"] == 0
    # the converted pair drops straight into the edge builder
    edges = build_edges(chains, points, compute_scaling(points, points))
    n_edges = edges.count()
    assert n_edges == (5 - 1) + (4 - 1) + (5 - 1)


def test_cli_convert_poly_csv(spark, tmp_path, capsys):
    """convert --poly-csv produces a parquet cache the query subcommand
    loads like any converted CDB layer."""
    import json

    from rayjoin_spark import cli

    path = _write(tmp_path, FIXTURE)
    out = str(tmp_path / "conv")
    assert cli.main(
        ["convert", "--poly-csv", path, "--head-eq-tail", "--out", out]
    ) == 0
    assert cli.main(
        ["query", "--poly1", out, "--poly2", out, "--query", "lsi",
         "--grid-size", "8"]
    ) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["query"] == "lsi" and rec["rows"] >= 0
