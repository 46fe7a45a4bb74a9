"""Pallas banded-Gotoh kernel parity (SURVEY.md §7 M2): must match the
numpy oracle and the XLA wavefront version bit-identically. Runs the
kernel in Pallas interpret mode on the CPU test platform."""

import numpy as np
import jax.numpy as jnp
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.oracle import banded as obanded
from repkiller_tpu.extend.banded_pallas import extend_banded_pallas
from repkiller_tpu.utils import synth


def _run_pallas(px, py, cx, cy, cfg, seed_chunk=256):
    n = px.shape[0]
    frag = extend_banded_pallas(
        jnp.asarray(px), jnp.asarray(py), jnp.ones(n, bool),
        jnp.asarray(cx), jnp.asarray(cy),
        k=cfg.k, match=cfg.match, mismatch=cfg.mismatch,
        x_drop=cfg.x_drop, max_extend=cfg.max_extend,
        band=cfg.band, gap_open=cfg.gap_open, gap_extend=cfg.gap_extend,
        seed_chunk=seed_chunk, interpret=True,
    )
    return {k: np.asarray(v) for k, v in frag.items()}


def _assert_equal(got, want):
    for f in ("xStart", "yStart", "xEnd", "yEnd", "score", "idents", "length"):
        assert np.array_equal(got[f], want[f]), (
            f, got[f][:20], want[f][:20])


@pytest.mark.parametrize("band,max_extend,xd", [(4, 64, 30), (8, 128, 40),
                                                (16, 96, 24)])
def test_random_seeds_vs_oracle(band, max_extend, xd):
    cfg = Config(k=8, band=band, max_extend=max_extend, x_drop=xd,
                 extend_mode="banded")
    rng = np.random.default_rng(band * 7 + max_extend)
    L = 1200
    cx = rng.integers(0, 4, L, dtype=np.uint8)
    cy = cx.copy()
    # mutate y lightly so gapped paths appear
    mut = rng.random(L) < 0.05
    cy[mut] = (cy[mut] + rng.integers(1, 4, mut.sum())) % 4
    # deletions: shift a block
    cy[600:] = np.roll(cy[600:], 2)
    n = 96
    px = rng.integers(0, L - cfg.k, n).astype(np.int32)
    py = np.clip(px + rng.integers(-3, 4, n), 0, L - cfg.k).astype(np.int32)
    want = obanded.extend_banded(px, py, cx, cy, cfg)
    got = _run_pallas(px, py, cx, cy, cfg)
    _assert_equal(got, want)


def test_ns_and_bounds():
    cfg = Config(k=8, band=4, max_extend=64, x_drop=20, extend_mode="banded")
    rng = np.random.default_rng(0)
    cx = rng.integers(0, 4, 300, dtype=np.uint8)
    cy = cx.copy()
    cx[40:45] = 4          # N block mid-sequence
    px = np.array([0, 10, 35, 290, 150], np.int32)   # edges + around the Ns
    py = px.copy()
    want = obanded.extend_banded(px, py, cx, cy, cfg)
    got = _run_pallas(px, py, cx, cy, cfg)
    _assert_equal(got, want)


def test_invalid_seeds_zeroed():
    cfg = Config(k=8, band=4, max_extend=64, extend_mode="banded")
    cx = np.tile(np.arange(4, dtype=np.uint8), 64)
    px = np.array([8, 16], np.int32)
    frag = extend_banded_pallas(
        jnp.asarray(px), jnp.asarray(px), jnp.asarray([True, False]),
        jnp.asarray(cx), jnp.asarray(cx),
        k=cfg.k, match=cfg.match, mismatch=cfg.mismatch,
        x_drop=cfg.x_drop, max_extend=cfg.max_extend,
        band=cfg.band, gap_open=cfg.gap_open, gap_extend=cfg.gap_extend,
        seed_chunk=128, interpret=True,
    )
    assert int(frag["score"][1]) == 0 and int(frag["length"][1]) == 0


def test_full_pipeline_banded_pallas_matches_oracle():
    from repkiller_tpu import device
    from repkiller_tpu.oracle import pipeline as orc
    cfg = Config(k=12, strands="fr", extend_mode="banded", band=4,
                 banded_impl="pallas", hit_capacity=1 << 12, max_extend=128)
    g = synth.plant(2000, [(100, 3, 0.04, 1)], seed=9)
    want = orc.compare(g.codes, None, cfg.replace(banded_impl="xla"))
    got = device.compare(g.codes, None, cfg)
    for f in list(orc.FRAG_FIELDS) + ["group"]:
        assert np.array_equal(got[f], want[f]), f
    assert got["xStart"].shape[0] > 0


def test_packed_gather_equals_byte_gather():
    import jax.numpy as jnp
    from repkiller_tpu.extend import banded_pallas as bp
    from repkiller_tpu.io.codec_device import pack_2bit_device
    from repkiller_tpu.io import codec

    rng = np.random.default_rng(17)
    L = 1000
    codes = rng.integers(0, 5, L, dtype=np.uint8)
    # device packing matches the host codec bit-for-bit
    wd, md = pack_2bit_device(jnp.asarray(codes))
    wh, mh, _ = codec.pack_2bit(codes)
    assert np.array_equal(np.asarray(wd), wh)
    assert np.array_equal(np.asarray(md), mh)

    n = 64
    start = rng.integers(-40, L + 40, n).astype(np.int32)
    valid = rng.random(n) < 0.9
    for step in (+1, -1):
        for rows, lead in ((64, 0), (96, 16)):
            a = bp._gather_window(jnp.asarray(codes), jnp.asarray(start),
                                  step, rows, lead, jnp.asarray(valid))
            b = bp._gather_window_packed(wd, md, L, jnp.asarray(start),
                                         step, rows, lead, jnp.asarray(valid))
            assert np.array_equal(np.asarray(a), np.asarray(b)), (step, rows)


def test_two_phase_matches_single_phase():
    """Force the phase-1/compaction path (tiny phase1_rows) on inputs with
    deep survivors; must equal the single-phase run and the oracle."""
    cfg = Config(k=8, band=4, max_extend=256, x_drop=40,
                 extend_mode="banded")
    rng = np.random.default_rng(33)
    L = 4000
    cx = rng.integers(0, 4, L, dtype=np.uint8)
    cy = cx.copy()
    mut = rng.random(L) < 0.02          # long high-identity stretches
    cy[mut] = (cy[mut] + rng.integers(1, 4, mut.sum())) % 4
    n = 128
    px = rng.integers(0, L - cfg.k, n).astype(np.int32)
    py = np.clip(px + rng.integers(-2, 3, n), 0, L - cfg.k).astype(np.int32)
    valid = np.ones(n, bool)
    valid[100:] = False

    def run(two_phase, phase1_rows=32, pre=0):
        frag = extend_banded_pallas(
            jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid),
            jnp.asarray(cx), jnp.asarray(cy),
            k=cfg.k, match=cfg.match, mismatch=cfg.mismatch,
            x_drop=cfg.x_drop, max_extend=cfg.max_extend,
            band=cfg.band, gap_open=cfg.gap_open, gap_extend=cfg.gap_extend,
            seed_chunk=128, interpret=True, two_phase=two_phase,
            phase1_rows=phase1_rows, phase1_pre=pre, n_live=jnp.int32(100))
        return {k2: np.asarray(v) for k2, v in frag.items()}

    one = run(False)
    two = run(True)
    three = run(True, phase1_rows=64, pre=32)    # pre-tier cascade branch
    for f in ("xStart", "yStart", "xEnd", "yEnd", "score", "idents"):
        assert np.array_equal(one[f], two[f]), f
        assert np.array_equal(one[f], three[f]), f
    want = obanded.extend_banded(px[:100], py[:100], cx, cy, cfg)
    for f in ("xStart", "yStart", "xEnd", "yEnd", "score", "idents"):
        assert np.array_equal(two[f][:100], want[f]), f
    # deep survivors actually exist (the path is exercised)
    assert (want["length"] > 64).any()
