"""Device-pipeline parity tests (SURVEY.md §4: every device stage must match
the numpy oracle bit-identically; this is the BASELINE.json acceptance
criterion applied stage by stage and end to end)."""

import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu import device
from repkiller_tpu.index import build as dbuild
from repkiller_tpu.seeds.join import join_hits
from repkiller_tpu.seeds.filter import filter_hits
from repkiller_tpu.oracle import pipeline as orc
from repkiller_tpu.utils import synth


def _codes(n, seed):
    return synth.random_codes(n, seed)


def test_index_matches_oracle():
    codes = _codes(500, 1)
    codes[50:60] = 4  # N block
    for k in (4, 12, 16):
        km, pos, nv = dbuild.build_index_jit(np.asarray(codes), k)
        okm, opos = orc.build_index(codes, k)
        nv = int(nv)
        assert nv == okm.shape[0]
        assert np.array_equal(np.asarray(km[:nv]), okm)
        assert np.array_equal(np.asarray(pos[:nv]), opos)


def _device_hits(cx, cy, cfg, self_mode=None):
    import jax.numpy as jnp

    kx, px, nxv = dbuild.build_index_jit(np.asarray(cx), cfg.k)
    if self_mode == "f":
        ky, py, nyv = kx, px, nxv
    else:
        ky, py, nyv = dbuild.build_index_jit(np.asarray(cy), cfg.k)
    hpx, hpy, hv, total = join_hits(
        kx, px, nxv, ky, py, nyv, k=cfg.k, max_occ=cfg.max_occ,
        capacity=4096, self_mode=self_mode, y_len=len(cy),
    )
    hv = np.asarray(hv)
    return np.asarray(hpx)[hv], np.asarray(hpy)[hv], int(total)


@pytest.mark.parametrize("mode", [None, "f", "r"])
def test_hits_match_oracle(mode):
    cfg = Config(k=8, max_occ=16)
    cx = _codes(400, 2)
    cx[100:140] = cx[200:240]  # planted shared block
    if mode is None:
        cy = _codes(300, 3)
        cy[10:50] = cx[100:140]
    elif mode == "f":
        cy = cx
    else:
        from repkiller_tpu.io import codec
        cy = codec.revcomp_codes(cx)
    px, py, total = _device_hits(cx, cy, cfg, self_mode=mode)
    opx, opy = orc.find_hits(
        orc.build_index(cx, cfg.k),
        orc.build_index(cx, cfg.k) if mode == "f" else orc.build_index(cy, cfg.k),
        cfg, self_mode=mode, y_len=len(cy),
    )
    got = sorted(zip(px.tolist(), py.tolist()))
    want = sorted(zip(opx.tolist(), opy.tolist()))
    assert got == want
    if mode == "f":
        assert total == len(want)  # exact count on the self fast path


def test_filter_matches_oracle():
    import jax.numpy as jnp

    cfg = Config(min_hit_dist=32)
    rng = np.random.default_rng(7)
    n = 300
    px = rng.integers(0, 1000, n).astype(np.int32)
    py = rng.integers(0, 1000, n).astype(np.int32)
    # dedupe (joins never emit duplicate pairs)
    pairs = sorted(set(zip(px.tolist(), py.tolist())))
    px = np.array([p for p, _ in pairs], np.int32)
    py = np.array([q for _, q in pairs], np.int32)
    cap = 512
    hpx = np.zeros(cap, np.int32)
    hpy = np.zeros(cap, np.int32)
    hv = np.zeros(cap, bool)
    hpx[: len(px)], hpy[: len(px)], hv[: len(px)] = px, py, True
    fx, fy, fv, nk = filter_hits(jnp.asarray(hpx), jnp.asarray(hpy),
                                 jnp.asarray(hv), cfg.min_hit_dist)
    nk = int(nk)
    ox, oy = orc.filter_hits(px, py, cfg)
    assert np.array_equal(np.asarray(fx)[:nk], ox)
    assert np.array_equal(np.asarray(fy)[:nk], oy)


CONFIGS = [
    Config(k=12, strands="f", hit_capacity=1 << 14, max_extend=256),
    Config(k=12, strands="fr", hit_capacity=1 << 14, max_extend=256),
    Config(k=8, strands="fr", max_occ=16, hit_capacity=1 << 14, max_extend=256,
           min_len=30),
    Config(k=12, strands="fr", extend_mode="banded", band=4,
           hit_capacity=1 << 14, max_extend=256),
]


def _assert_frag_equal(got, want):
    for f in list(orc.FRAG_FIELDS) + ["group"]:
        assert np.array_equal(got[f], want[f]), (
            f, got[f], want[f])


@pytest.mark.parametrize("ci", range(len(CONFIGS)))
def test_end_to_end_self_matches_oracle(ci):
    cfg = CONFIGS[ci]
    g = synth.plant(3000, [(120, 3, 0.05, 1), (80, 2, 0.0, 0)], seed=ci + 1)
    got = device.compare(g.codes, None, cfg)
    want = orc.compare(g.codes, None, cfg)
    _assert_frag_equal(got, want)
    assert got["xStart"].shape[0] > 0  # non-trivial comparison


@pytest.mark.parametrize("ci", [0, 1, 3])
def test_end_to_end_cross_matches_oracle(ci):
    cfg = CONFIGS[ci]
    rng = np.random.default_rng(100 + ci)
    cx = rng.integers(0, 4, 2500, dtype=np.uint8)
    cy = rng.integers(0, 4, 2000, dtype=np.uint8)
    cy[300:500] = cx[700:900]
    from repkiller_tpu.io import codec
    cy[1200:1300] = codec.revcomp_codes(cx[1500:1600])  # inverted shared block
    got = device.compare(cx, cy, cfg)
    want = orc.compare(cx, cy, cfg)
    _assert_frag_equal(got, want)
    assert got["xStart"].shape[0] > 0


def test_overflow_detected():
    codes = np.zeros(200, dtype=np.uint8)  # poly-A, hyper-repetitive
    cfg = Config(k=8, max_occ=10000, hit_capacity=64, max_extend=128)
    with pytest.raises(ValueError, match="hit_capacity"):
        device.compare(codes, None, cfg)


def test_empty_input():
    cfg = Config(k=12, max_extend=128)
    out = device.compare(np.zeros(4, np.uint8), None, cfg)
    assert out["xStart"].shape[0] == 0
