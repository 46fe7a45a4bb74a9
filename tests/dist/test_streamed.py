"""Windowed streaming + checkpoint/resume tests (SURVEY.md §5)."""

import json
import os

import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.dist.windows import compare_streamed
from repkiller_tpu.oracle import pipeline as orc
from repkiller_tpu.utils import synth

# gate_stride=256 so the window quantum (lcm(min_hit_dist, gate_stride))
# stays 256 and the small test windows below survive rounding
CFG = Config(k=12, strands="fr", hit_capacity=1 << 13, max_extend=256,
             gate_stride=256)


def _assert_frag_equal(got, want):
    for f in list(orc.FRAG_FIELDS) + ["group"]:
        assert np.array_equal(got[f], want[f]), (f, got[f], want[f])


@pytest.mark.parametrize("window", [512, 1024, 4096])
def test_streamed_invariant_over_window(window):
    g = synth.plant(3000, [(120, 3, 0.05, 1), (80, 2, 0.0, 0)], seed=11)
    want = orc.compare(g.codes, None, CFG)
    got = compare_streamed(g.codes, None, CFG, window=window)
    _assert_frag_equal(got, want)
    assert got["xStart"].shape[0] > 0


def test_streamed_cross():
    rng = np.random.default_rng(5)
    cx = rng.integers(0, 4, 2500, dtype=np.uint8)
    cy = rng.integers(0, 4, 1700, dtype=np.uint8)
    cy[200:400] = cx[600:800]
    want = orc.compare(cx, cy, CFG)
    got = compare_streamed(cx, cy, CFG, window=777)  # rounds to 768
    _assert_frag_equal(got, want)


def test_checkpoint_resume(tmp_path):
    g = synth.plant(4000, [(120, 3, 0.05, 1)], seed=7)
    want = orc.compare(g.codes, None, CFG)
    out_dir = str(tmp_path / "ckpt")
    got1 = compare_streamed(g.codes, None, CFG, out_dir=out_dir, window=1024)
    _assert_frag_equal(got1, want)
    manifest = os.path.join(out_dir, "manifest.jsonl")
    n_lines = sum(1 for _ in open(manifest))
    assert n_lines == 8                      # 4 windows x 2 strands

    # drop the last two windows from the manifest -> resume recomputes
    # exactly those, appends them, and the output is unchanged
    lines = open(manifest).read().splitlines()
    with open(manifest, "w") as f:
        f.write("\n".join(lines[:-2]) + "\n")
    got2 = compare_streamed(g.codes, None, CFG, out_dir=out_dir, window=1024)
    _assert_frag_equal(got2, want)
    assert sum(1 for _ in open(manifest)) == n_lines

    # different config -> fingerprint mismatch, nothing reused, still right
    cfg2 = CFG.replace(min_len=41)
    got3 = compare_streamed(g.codes, None, cfg2, out_dir=out_dir, window=1024)
    _assert_frag_equal(got3, orc.compare(g.codes, None, cfg2))
