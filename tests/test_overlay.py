"""Overlay pipeline vs the sequential Python oracle (reference writer
semantics), plus a committed golden file."""

import os

import pytest

from rayjoin_spark.operators.overlay import overlay, write_cdb
from rayjoin_spark.plans.scaling import GridSpec, compute_scaling
from rayjoin_spark.sources.datagen import lattice_chains, transformed_lattice

from tests.oracle import build_edges_py
from tests.oracle_overlay import overlay_oracle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "overlay_m4.cdb")


def _setup(spark, m):
    ca, pa = lattice_chains(spark, m)
    cb, pb = transformed_lattice(spark, m)
    scaling = compute_scaling(pa, pb)
    layers = []
    for c, p in [(ca, pa), (cb, pb)]:
        c_py = {r["chain_id"]: (r["left_polygon_id"], r["right_polygon_id"]) for r in c.collect()}
        p_py = sorted((r["chain_id"], r["seq"], r["x"], r["y"]) for r in p.collect())
        layers.append((c_py, p_py))
    e0 = build_edges_py(layers[0][0], layers[0][1], scaling)
    e1 = build_edges_py(layers[1][0], layers[1][1], scaling)
    return ca, pa, cb, pb, scaling, layers, e0, e1


@pytest.mark.parametrize("m,gsize", [(3, 32), (4, 16)])
def test_overlay_matches_oracle(spark, m, gsize):
    ca, pa, cb, pb, scaling, layers, e0, e1 = _setup(spark, m)
    oc, op = overlay(ca, pa, cb, pb, scaling, GridSpec(gsize))
    got_chains = sorted(
        (r["chain_id"], r["n_points"], r["first_point_id"], r["last_point_id"],
         r["left_face"], r["right_face"])
        for r in oc.collect()
    )
    got_points = sorted(
        (r["chain_id"], r["seq"], round(r["x"], 9), round(r["y"], 9))
        for r in op.collect()
    )
    chains_rows, points_rows = overlay_oracle(
        [e0, e1], [layers[0][0], layers[1][0]], [layers[0][1], layers[1][1]], scaling
    )
    want_chains = sorted(
        (r["chain_id"], r["n_points"], r["first_point_id"], r["last_point_id"],
         r["left_face"], r["right_face"])
        for r in chains_rows
    )
    want_points = sorted(
        (r["chain_id"], r["seq"], round(r["x"], 9), round(r["y"], 9))
        for r in points_rows
    )
    assert len(got_chains) == len(want_chains)
    assert got_chains == want_chains
    assert got_points == want_points
    assert len(got_chains) > 0


def test_overlay_golden_file(spark, tmp_path):
    """End-to-end golden diff, mirroring reference test/test_overlay.sh."""
    ca, pa, cb, pb, scaling, *_ = _setup(spark, 4)
    oc, op = overlay(ca, pa, cb, pb, scaling, GridSpec(16))
    out = tmp_path / "overlay_m4.cdb"
    write_cdb(oc, op, str(out))
    text = out.read_text()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(text)
        pytest.skip("golden file created; re-run to compare")
    assert text == open(GOLDEN).read()
