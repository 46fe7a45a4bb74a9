"""Sharded-pipeline invariance tests (SURVEY.md §4.4/§4.5).

The BASELINE.json determinism requirement: output must be bit-identical
for ANY device count / mesh shape / window assignment. Runs on the
8-virtual-device CPU mesh from conftest.py.
"""

import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.dist.mesh import make_mesh
from repkiller_tpu.dist.sharded import compare_sharded
from repkiller_tpu.oracle import pipeline as orc
from repkiller_tpu.utils import synth

CFG = Config(k=12, strands="fr", hit_capacity=1 << 13, max_extend=256)

MESHES = [(1, 1), (2, 1), (1, 2), (4, 2), (2, 4), (8, 1)]


def _assert_frag_equal(got, want):
    for f in list(orc.FRAG_FIELDS) + ["group"]:
        assert np.array_equal(got[f], want[f]), (f, got[f], want[f])


@pytest.mark.parametrize("shape", MESHES)
def test_self_invariant_over_mesh(shape):
    g = synth.plant(3000, [(120, 3, 0.05, 1), (80, 2, 0.0, 0)], seed=11)
    want = orc.compare(g.codes, None, CFG)
    mesh = make_mesh(*shape)
    got = compare_sharded(g.codes, None, CFG, mesh)
    _assert_frag_equal(got, want)
    assert got["xStart"].shape[0] > 0


@pytest.mark.parametrize("shape", [(2, 2), (8, 1), (1, 4)])
def test_cross_invariant_over_mesh(shape):
    rng = np.random.default_rng(5)
    cx = rng.integers(0, 4, 2500, dtype=np.uint8)
    cy = rng.integers(0, 4, 1700, dtype=np.uint8)
    cy[200:400] = cx[600:800]
    from repkiller_tpu.io import codec
    cy[900:1000] = codec.revcomp_codes(cx[1200:1300])
    want = orc.compare(cx, cy, CFG)
    got = compare_sharded(cx, cy, CFG, make_mesh(*shape))
    _assert_frag_equal(got, want)
    assert got["xStart"].shape[0] > 0


@pytest.mark.parametrize("strands", ["r", "fr"])
def test_self_strand_selection_over_mesh(strands):
    """The canonical sharded self path builds its strand outputs from a
    static strand list (round 5) — cover the r-only and both-strand
    variants on a 2-axis mesh (f-only is the suite default elsewhere)."""
    cfg = CFG.replace(strands=strands)
    g = synth.plant(3000, [(120, 4, 0.04, 2), (80, 2, 0.0, 1)], seed=13)
    want = orc.compare(g.codes, None, cfg)
    got = compare_sharded(g.codes, None, cfg, make_mesh(2, 2))
    _assert_frag_equal(got, want)
    assert got["xStart"].shape[0] > 0
    if strands == "r":
        assert set(got["strand"].tolist()) == {1}


def test_banded_sharded_matches_oracle():
    cfg = CFG.replace(extend_mode="banded", band=4)
    g = synth.plant(2000, [(100, 3, 0.04, 1)], seed=3)
    want = orc.compare(g.codes, None, cfg)
    got = compare_sharded(g.codes, None, cfg, make_mesh(4, 2))
    _assert_frag_equal(got, want)
    assert got["xStart"].shape[0] > 0


def test_overflow_detected_sharded():
    codes = np.zeros(400, dtype=np.uint8)  # poly-A hyper-repeat
    cfg = Config(k=8, max_occ=10000, hit_capacity=64 * 8, max_extend=128)
    with pytest.raises(ValueError, match="capacity"):
        compare_sharded(codes, None, cfg, make_mesh(4, 2))


def test_indivisible_capacity_rejected():
    cfg = Config(hit_capacity=100)  # not divisible by 8
    with pytest.raises(ValueError, match="divisible"):
        compare_sharded(np.zeros(100, np.uint8), None, cfg, make_mesh(4, 2))
