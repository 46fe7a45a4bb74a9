"""--keep-intermediates per-stage checkpoint/resume (SURVEY.md §5
"Checkpoint/resume"; round-1 verdict item 7): stage dumps exist after a
run, a rerun reloads them (no recomputation), resumed output is
bit-identical, and a config change changes the fingerprint."""

import glob

import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu import device
from repkiller_tpu.oracle import pipeline as orc
from repkiller_tpu.utils import synth


CFG = Config(k=12, strands="fr", hit_capacity=1 << 14, max_extend=256)


@pytest.mark.parametrize("self_cmp", [True, False])
def test_resume_bit_identical(tmp_path, self_cmp):
    g = synth.plant(4000, [(150, 3, 0.02, 1)], seed=50)
    cy = None
    if not self_cmp:
        rng = np.random.default_rng(51)
        cy = synth.mutate(g.codes, 0.05, rng)[:3500]
    want = device.compare(g.codes, cy, CFG)

    d = str(tmp_path / "ckpt")
    first = device.compare(g.codes, cy, CFG, keep_intermediates=d)
    files = glob.glob(d + "/stage_*.npz")
    # seeds + extend per strand at least
    assert len(files) >= 4, files

    # resume: every stage reloads -> no stage timings recorded for the
    # heavy stages, and output identical
    timings = {}
    again = device.compare(g.codes, cy, CFG, keep_intermediates=d,
                           timings=timings)
    assert "extend" not in timings and "seeds" not in timings \
        and "join" not in timings, timings
    for f in list(orc.FRAG_FIELDS) + ["group"]:
        assert np.array_equal(first[f], want[f]), f
        assert np.array_equal(again[f], want[f]), f

    # different config -> different fingerprint -> no stale reuse
    other = device.compare(g.codes, cy, CFG.replace(min_len=60),
                           keep_intermediates=d)
    assert len(glob.glob(d + "/stage_*.npz")) > len(files)
    assert other["xStart"].shape[0] <= want["xStart"].shape[0]
