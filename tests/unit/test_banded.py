"""Banded affine-gap oracle tests (SURVEY.md §4.2: "banded DP vs a direct
O(n*m) Gotoh in numpy on hundreds of random pairs").

The brute force below is an INDEPENDENT per-cell implementation of the
semantics in oracle/banded.py's docstring (full matrix; band/x-drop are
applied explicitly) so the two can cross-check each other.
"""

import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.io import codec
from repkiller_tpu.oracle import banded
from repkiller_tpu.oracle import pipeline as orc
from repkiller_tpu.utils import synth

NEG = int(banded.NEG_INF)


def brute_gotoh(x, y, cfg: Config):
    """Full-matrix Gotoh with x-drop + band, per-cell loops, identity carry.

    Returns (ext_i, ext_j, gain, idents) for one direction, same endpoint
    rule as the oracle: max H, tie smaller i+j, then smaller i.
    """
    E = cfg.max_extend
    nx, ny = min(len(x), E), min(len(y), E)
    b = cfg.band
    op, ex = cfg.gap_open, cfg.gap_extend
    H = {}
    Eg = {}
    Fg = {}
    ID = {}
    H[(0, 0)] = 0
    ID[(0, 0)] = 0
    best = (0, 0, 0, 0)  # gain, d, i, idents  (compare by gain desc, d asc, i asc)
    for i in range(0, nx + 1):
        row_cells = []
        for j in range(max(0, i - b), min(ny, i + b) + 1):
            if i == 0 and j == 0:
                row_cells.append((0, 0))
                continue
            # M
            m_val, m_id = NEG, 0
            if i >= 1 and j >= 1 and H.get((i - 1, j - 1), NEG) > NEG:
                match = int(x[i - 1]) == int(y[j - 1]) and x[i - 1] < 4 and y[j - 1] < 4
                m_val = H[(i - 1, j - 1)] + (cfg.match if match else cfg.mismatch)
                m_id = ID[(i - 1, j - 1)] + (1 if match else 0)
            # E (gap in y, consume x)
            e_val, e_id = NEG, 0
            if i >= 1:
                c1 = H.get((i - 1, j), NEG)
                c1 = c1 - op - ex if c1 > NEG else NEG
                c2 = Eg.get((i - 1, j), NEG)
                c2 = c2 - ex if c2 > NEG else NEG
                if c1 >= c2:
                    e_val, e_id = c1, ID.get((i - 1, j), 0)
                else:
                    e_val, e_id = c2, Eg.get(("id", i - 1, j), 0)
            # F (gap in x, consume y) — classic recurrence on H
            f_val, f_id = NEG, 0
            if j >= 1:
                c1 = H.get((i, j - 1), NEG)
                c1 = c1 - op - ex if c1 > NEG else NEG
                c2 = Fg.get((i, j - 1), NEG)
                c2 = c2 - ex if c2 > NEG else NEG
                if c1 >= c2:
                    f_val, f_id = c1, ID.get((i, j - 1), 0)
                else:
                    f_val, f_id = c2, Fg.get(("id", i, j - 1), 0)
            # H with branch priority M > E > F
            h_val, h_id = m_val, m_id
            if e_val > h_val:
                h_val, h_id = e_val, e_id
            if f_val > h_val:
                h_val, h_id = f_val, f_id
            Eg[(i, j)] = e_val
            Eg[("id", i, j)] = e_id
            Fg[(i, j)] = f_val
            Fg[("id", i, j)] = f_id
            H[(i, j)] = h_val
            ID[(i, j)] = h_id
            if h_val > NEG:
                row_cells.append((i, j))
        # endpoint candidates + x-drop prune after the row
        for (i2, j2) in row_cells:
            g = H[(i2, j2)]
            cand = (g, i2 + j2, i2, ID[(i2, j2)])
            if cand[0] > best[0] or (cand[0] == best[0] and cand[1] < best[1]):
                best = cand
        alive = i == 0
        for (i2, j2) in row_cells:
            if H[(i2, j2)] < best[0] - cfg.x_drop:
                H[(i2, j2)] = NEG
                Eg[(i2, j2)] = NEG
            else:
                alive = True
        if not alive:
            break
    return best[2], best[1] - best[2], best[0], best[3]


def run_oracle_one(x, y, cfg):
    sx = np.asarray(x, np.uint8)[None, :]
    sy = np.asarray(y, np.uint8)[None, :]
    E = cfg.max_extend
    def pad(a):
        out = np.zeros((1, E), np.uint8)
        v = np.zeros((1, E), bool)
        m = min(a.shape[1], E)
        out[:, :m] = a[:, :m]
        v[:, :m] = True
        return out, v
    sxp, xv = pad(sx)
    syp, yv = pad(sy)
    ei, ej, g, idn = banded._extend_direction(sxp, syp, xv, yv, cfg)
    return int(ei[0]), int(ej[0]), int(g[0]), int(idn[0])


@pytest.mark.parametrize("seed", range(30))
def test_banded_vs_brute_random(seed):
    rng = np.random.default_rng(seed)
    nx, ny = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    x = rng.integers(0, 4, nx, dtype=np.uint8)
    y = x[:ny].copy() if seed % 2 else rng.integers(0, 4, ny, dtype=np.uint8)
    if seed % 3 == 0 and len(y) > 6:  # plant an indel to exercise gaps
        y = np.concatenate([y[:3], y[5:]])
    cfg = Config(band=4, x_drop=30, max_extend=64, gap_open=6, gap_extend=2)
    got = run_oracle_one(x, y, cfg)
    want = brute_gotoh(x, y, cfg)
    assert got == want, (seed, got, want)


@pytest.mark.parametrize("seed", range(10))
def test_banded_wide_band_no_xdrop_is_full_gotoh(seed):
    rng = np.random.default_rng(100 + seed)
    n = 24
    x = rng.integers(0, 4, n, dtype=np.uint8)
    y = rng.integers(0, 4, n, dtype=np.uint8)
    cfg = Config(band=32, x_drop=10**6, max_extend=32, gap_open=6, gap_extend=2)
    got = run_oracle_one(x, y, cfg)
    want = brute_gotoh(x, y, cfg)
    assert got == want


def test_banded_exact_match_full_gain():
    x = np.array([0, 1, 2, 3] * 8, np.uint8)
    cfg = Config(band=4, x_drop=40, max_extend=64)
    ei, ej, g, idn = run_oracle_one(x, x, cfg)
    assert (ei, ej) == (32, 32)
    assert g == 32 * cfg.match
    assert idn == 32


def test_banded_gap_bridged():
    # y = x with a 2-base deletion: DP should bridge it, ungapped cannot
    rng = np.random.default_rng(5)
    x = rng.integers(0, 4, 60, dtype=np.uint8)
    y = np.concatenate([x[:30], x[32:]])
    cfg = Config(band=4, x_drop=100, max_extend=80, gap_open=6, gap_extend=2)
    ei, ej, g, idn = run_oracle_one(x, y, cfg)
    assert ei == 60 and ej == 58
    assert idn == 58
    # 58 matches minus a length-2 affine gap
    assert g == 58 * cfg.match - (cfg.gap_open + 2 * cfg.gap_extend)
    assert (ei, ej, g, idn) == brute_gotoh(x, y, cfg)


def test_banded_respects_band():
    # deletion of 6 > band 2: cannot be bridged
    rng = np.random.default_rng(6)
    x = rng.integers(0, 4, 60, dtype=np.uint8)
    y = np.concatenate([x[:30], x[36:]])
    cfg = Config(band=2, x_drop=1000, max_extend=80, gap_open=6, gap_extend=2)
    got = run_oracle_one(x, y, cfg)
    want = brute_gotoh(x, y, cfg)
    assert got == want
    assert got[0] < 60  # could not reach the far end


def test_banded_end_to_end_finds_gapped_repeat():
    # two copies of a 200bp unit, second copy has a 3bp deletion in the middle
    g = synth.plant(6000, [(200, 2, 0.0, 0)], seed=41)
    a, b = sorted(g.repeats[0].positions)
    codes = np.concatenate([g.codes[: b + 100], g.codes[b + 103 :]])
    cfg = Config(k=12, extend_mode="banded", band=8, x_drop=60, min_len=40,
                 max_extend=512)
    frag = orc.compare(codes, None, cfg)
    hit = (frag["xStart"] <= a + 5) & (frag["xEnd"] >= a + 190)
    assert hit.any(), frag
    i = int(np.nonzero(hit)[0][0])
    # x-span covers the full first copy; y-span is 3 shorter (the deletion)
    xspan = frag["xEnd"][i] - frag["xStart"][i]
    yspan = frag["yEnd"][i] - frag["yStart"][i]
    assert abs((xspan - yspan)) == 3


def test_banded_ends_of_sequence():
    # seed near the end: extension must stop at the boundary, not read junk
    x = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    cfg = Config(band=3, x_drop=40, max_extend=32)
    ei, ej, g, idn = run_oracle_one(x, x, cfg)
    assert (ei, ej, g, idn) == (6, 6, 6 * cfg.match, 6)
