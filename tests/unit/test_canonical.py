"""Canonical-index self-join vs the oracle's two-index joins
(index/canonical.py + seeds/self_join.py; SURVEY.md §2.2 "Hit finding").

The canonical path must produce EXACTLY the oracle's hit sets for both
strands — including palindromic k-mers (whole-run matches on both
strands, self pair kept once), N-masked windows, occurrence caps, and
odd/even k."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.index.canonical import build_canonical_index, revcomp_kmer
from repkiller_tpu.io import codec
from repkiller_tpu.oracle import pipeline as orc
from repkiller_tpu.seeds.self_join import join_self_canonical


def test_revcomp_kmer_brute():
    rng = np.random.default_rng(11)
    for k in (1, 3, 8, 12, 16):
        hi = (1 << (2 * k)) - 1 if k < 16 else 0xFFFFFFFF
        km = rng.integers(0, hi, 100, dtype=np.uint64).astype(np.uint32)

        def brute(v):
            bases = [(v >> (2 * (k - 1 - i))) & 3 for i in range(k)]
            res = 0
            for b in reversed(bases):          # reverse order, complement
                res = (res << 2) | (3 - b)
            return res

        got = np.asarray(jax.jit(
            functools.partial(revcomp_kmer, k=k))(jnp.asarray(km)))
        want = np.array([brute(int(v)) for v in km], np.uint32)
        assert np.array_equal(got, want), k


def test_revcomp_kmer_involution():
    rng = np.random.default_rng(5)
    for k in (2, 12, 16):
        mask = np.uint32(0xFFFFFFFF if k == 16 else (1 << (2 * k)) - 1)
        km = (rng.integers(0, 1 << 31, 500, dtype=np.uint32) & mask)
        f = jax.jit(functools.partial(revcomp_kmer, k=k))
        assert np.array_equal(np.asarray(f(f(jnp.asarray(km)))), km)


@functools.partial(jax.jit, static_argnames=("k", "max_occ", "cap", "y_len"))
def _run(cj, k, max_occ, cap, y_len):
    ci = build_canonical_index(cj, k)
    return join_self_canonical(ci, k, max_occ, cap, y_len)


def _hit_set(h):
    px, py, v, total = h
    pairs = set(zip(np.asarray(px)[np.asarray(v)].tolist(),
                    np.asarray(py)[np.asarray(v)].tolist()))
    assert len(pairs) == int(total)
    return pairs


@pytest.mark.parametrize("k,max_occ,seed", [
    (4, 8, 0), (8, 64, 1), (11, 2, 2), (12, 64, 3), (16, 8, 4)])
def test_self_join_matches_oracle(k, max_occ, seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(300, 2500))
    codes = rng.integers(0, 4, L).astype(np.uint8)
    codes[rng.integers(0, L, L // 40)] = 4          # Ns
    if k % 2 == 0:                                   # plant palindromes
        half = rng.integers(0, 4, k // 2)
        pal = np.concatenate([half, 3 - half[::-1]]).astype(np.uint8)
        for _ in range(4):
            p = int(rng.integers(0, L - k))
            codes[p:p + k] = pal
    cfg = Config(k=k, max_occ=max_occ)
    idxX = orc.build_index(codes, k)
    fx, fy = orc.find_hits(idxX, idxX, cfg, self_mode="f", y_len=L)
    idxR = orc.build_index(codec.revcomp_codes(codes), k)
    rx, ry = orc.find_hits(idxX, idxR, cfg, self_mode="r", y_len=L)

    hf, hr = _run(jnp.asarray(codes), k, max_occ, 1 << 14, L)
    assert _hit_set(hf) == set(zip(fx.tolist(), fy.tolist()))
    assert _hit_set(hr) == set(zip(rx.tolist(), ry.tolist()))


def test_self_join_pure_palindrome_run():
    # every copy of a palindromic k-mer hits every other on BOTH strands,
    # and itself on the reverse strand exactly once
    k = 8
    half = np.array([0, 1, 2, 3], np.uint8)
    pal = np.concatenate([half, 3 - half[::-1]]).astype(np.uint8)
    assert np.array_equal(codec.revcomp_codes(pal), pal)
    gap = np.full(50, 4, np.uint8)                   # Ns isolate the copies
    codes = np.concatenate([gap, pal, gap, pal, gap])
    cfg = Config(k=k, max_occ=64)
    idxX = orc.build_index(codes, k)
    fx, fy = orc.find_hits(idxX, idxX, cfg, self_mode="f", y_len=len(codes))
    idxR = orc.build_index(codec.revcomp_codes(codes), k)
    rx, ry = orc.find_hits(idxX, idxR, cfg, self_mode="r", y_len=len(codes))
    hf, hr = _run(jnp.asarray(codes), k, 64, 1 << 10, len(codes))
    assert _hit_set(hf) == set(zip(fx.tolist(), fy.tolist()))
    assert _hit_set(hr) == set(zip(rx.tolist(), ry.tolist()))
    assert int(hf[3]) == 1                            # one forward pair
    assert int(hr[3]) == 3                            # 2 self-rc + 1 cross


def test_scan_broadcast_variant_bit_identical():
    """build_canonical_index(scan_broadcast=True) == the gather form on
    repeat-rich, palindrome-bearing and N-containing inputs."""
    import jax
    import numpy as np
    from repkiller_tpu.index.canonical import build_canonical_index
    from repkiller_tpu.utils import synth

    rng = np.random.default_rng(17)
    cases = []
    g = synth.plant(4000, [(120, 4, 0.02, 1), (60, 3, 0.0, 1)], seed=3)
    c = np.asarray(g.codes).copy()
    c[500:510] = 4
    cases.append(c)
    cases.append(rng.integers(0, 4, 997, np.uint8))
    cases.append(np.zeros(200, np.uint8))            # poly-A (one huge run)
    pal = np.array([0, 1, 2, 3] * 60, np.uint8)      # palindromic k-mers
    cases.append(pal)
    for k in (12, 16):
        for codes in cases:
            a = jax.jit(build_canonical_index,
                        static_argnums=(1, 2))(codes, k, False)
            b = jax.jit(build_canonical_index,
                        static_argnums=(1, 2))(codes, k, True)
            for f in a._fields:
                assert np.array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f))), (k, f)
