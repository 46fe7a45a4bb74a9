"""Ungapped x-drop extension — Pallas TPU kernel.

Semantics are DEFINED by oracle.pipeline._directional_gain (full-window
cumsum + running-max x-drop, first-argmax endpoint) and re-expressed as a
chunked XLA while_loop in extend/ungapped.py; this kernel must match both
bit-identically (tests/unit/test_ungapped_pallas.py).

Machine mapping mirrors extend/banded_pallas.py: 128 seeds per block on
VPU lanes, extension steps on sublanes in aligned 32-row chunks, per-seed
(score, running-max, identity, best) carries resident in VMEM across
chunks, per-block early exit once every seed has x-dropped. The same
pre-gathered (optionally 2-bit packed) base windows feed it.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_pallas import (NEG_INF, SB, _gather_window,
                            _gather_window_packed, _down)

G = 32            # steps per in-kernel chunk (i8 sublane alignment)


def _make_kernel(E: int, match: int, mismatch: int, x_drop: int):
    m32, mm32, xd = int(match), int(mismatch), int(x_drop)
    n_chunks = E // G

    def kernel(sx_ref, sy_ref, out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (G, SB), 0)

        def cond(state):
            c, stopped = state[0], state[1]
            return (c < n_chunks) & ~jnp.all(stopped == 1)

        def body(state):
            (c, stopped, s_carry, rm_carry, id_carry,
             best, bext, bid) = state
            xa = sx_ref[pl.ds(c * G, G), :].astype(jnp.int32)
            ya = sy_ref[pl.ds(c * G, G), :].astype(jnp.int32)
            valid = (xa < 5) & (ya < 5)
            # (a ^ b) < 1 is a == b for the 0..255 code values: a direct
            # eq on freshly widened i8 operands gets folded by Mosaic to
            # an i8 cmpi eq, which the v5e target rejects ("Target does
            # not support this comparison"); verified on-chip.
            eq = valid & ((xa ^ ya) < 1) & (xa < 4)
            delta = jnp.where(eq, m32, mm32)

            # inclusive scans along rows: sum(delta), sum(eq), cummax
            s = delta
            ids = eq.astype(jnp.int32)
            d = 1
            while d < G:
                s = s + _down(s, d, 0)
                ids = ids + _down(ids, d, 0)
                d *= 2
            s = s_carry + s
            ids = id_carry + ids
            rm = jnp.maximum(s, 0)
            d = 1
            while d < G:
                rm = jnp.maximum(rm, _down(rm, d, NEG_INF))
                d *= 2
            rm = jnp.maximum(rm_carry, rm)

            stop = (~valid) | (s <= rm - xd)
            t = jnp.min(jnp.where(stop, row, G), axis=0, keepdims=True)
            alive = row < t
            s_m = jnp.where(alive, s, NEG_INF)
            g = jnp.max(s_m, axis=0, keepdims=True)
            brow = jnp.min(jnp.where(s_m == g, row, G), axis=0,
                           keepdims=True)                  # first argmax
            gid = jnp.sum(jnp.where(row == brow, ids, 0), axis=0,
                          keepdims=True)

            better = (stopped == 0) & (g > best)           # ties keep earlier
            best = jnp.where(better, g, best)
            bext = jnp.where(better, c * G + brow + 1, bext)
            bid = jnp.where(better, gid, bid)

            cont = stopped == 0
            s_carry = jnp.where(cont, s[G - 1 :, :], s_carry)
            rm_carry = jnp.where(cont, rm[G - 1 :, :], rm_carry)
            id_carry = jnp.where(cont, ids[G - 1 :, :], id_carry)
            stopped = stopped | jnp.max(stop.astype(jnp.int32), axis=0,
                                        keepdims=True)
            return (c + 1, stopped, s_carry, rm_carry, id_carry,
                    best, bext, bid)

        z = jnp.zeros((1, SB), jnp.int32)
        state = (jnp.int32(0), z, z, z, z, z, z, z)
        state = jax.lax.while_loop(cond, body, state)
        _, _, _, _, _, best, bext, bid = state
        out_ref[:, :] = jnp.concatenate(
            [bext, best, bid, jnp.zeros((5, SB), jnp.int32)], axis=0)

    return kernel


def _direction(px, py, seed_valid, cx, cy, base_off: int, step: int,
               match, mismatch, x_drop, max_extend, seed_chunk: int,
               interpret: bool, n_live, packed_x, packed_y):
    n = px.shape[0]
    E = -(-max_extend // G) * G
    assert E == max_extend, "max_extend must be a multiple of 32"
    assert seed_chunk % SB == 0
    n_pad = -(-n // seed_chunk) * seed_chunk

    def pad(a, fill):
        return jnp.concatenate(
            [a, jnp.full((n_pad - n,), fill, a.dtype)]) if n_pad != n else a

    pxp = pad(px, jnp.int32(0))
    pyp = pad(py, jnp.int32(0))
    vp = pad(seed_valid, False)

    kern = _make_kernel(E, match, mismatch, x_drop)
    grid = seed_chunk // SB
    call = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((E, SB), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, SB), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, SB), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, seed_chunk), jnp.int32),
        interpret=interpret,
    )

    def one_chunk(cpx, cpy, cv):
        if packed_x is not None:
            wx, mx = packed_x
            sx = _gather_window_packed(wx, mx, cx.shape[0],
                                       cpx + jnp.int32(base_off), step, E,
                                       0, cv)
        else:
            sx = _gather_window(cx, cpx + jnp.int32(base_off), step, E, 0, cv)
        if packed_y is not None:
            wy, my = packed_y
            sy = _gather_window_packed(wy, my, cy.shape[0],
                                       cpy + jnp.int32(base_off), step, E,
                                       0, cv)
        else:
            sy = _gather_window(cy, cpy + jnp.int32(base_off), step, E, 0, cv)
        return call(sx, sy)

    n_chunks = n_pad // seed_chunk
    cpx = pxp.reshape(n_chunks, seed_chunk)
    cpy = pyp.reshape(n_chunks, seed_chunk)
    cv = vp.reshape(n_chunks, seed_chunk)
    live_chunks = (jnp.int32(n_chunks) if n_live is None else jnp.minimum(
        (n_live.astype(jnp.int32) + seed_chunk - 1) // seed_chunk, n_chunks))

    def body(state):
        c, out = state
        res = one_chunk(cpx[c], cpy[c], cv[c])
        out = jax.lax.dynamic_update_slice(out, res[None], (c, 0, 0))
        return c + 1, out

    init = (jnp.int32(0), jnp.zeros((n_chunks, 8, seed_chunk), jnp.int32))
    _, outs = jax.lax.while_loop(lambda s: s[0] < live_chunks, body, init)
    outs = jnp.moveaxis(outs, 1, 0).reshape(8, n_pad)[:, :n]
    return outs[0], outs[1], outs[2]


def extend_ungapped_pallas(
    px: jnp.ndarray, py: jnp.ndarray, seed_valid: jnp.ndarray,
    cx: jnp.ndarray, cy: jnp.ndarray,
    k: int, match: int, mismatch: int, x_drop: int, max_extend: int,
    seed_chunk: int = 8192, interpret: bool | None = None,
    n_live=None, packed: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Drop-in replacement for extend/ungapped.extend_ungapped."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if packed:
        from ..io.codec_device import pack_2bit_device
        px2 = pack_2bit_device(cx)
        py2 = px2 if cy is cx else pack_2bit_device(cy)
    else:
        px2 = py2 = None
    args = (match, mismatch, x_drop, max_extend, seed_chunk, interpret,
            n_live, px2, py2)
    rext, rgain, rid = _direction(px, py, seed_valid, cx, cy, k, +1, *args)
    lext, lgain, lid = _direction(px, py, seed_valid, cx, cy, -1, -1, *args)
    n = px.shape[0]
    seed_score = jnp.int32(k * match)
    frag = {
        "xStart": px - lext,
        "yStart": py - lext,
        "xEnd": px + jnp.int32(k - 1) + rext,
        "yEnd": py + jnp.int32(k - 1) + rext,
        "strand": jnp.zeros(n, jnp.int32),
        "score": seed_score + lgain + rgain,
        "idents": jnp.int32(k) + lid + rid,
    }
    frag["length"] = frag["xEnd"] - frag["xStart"] + 1
    frag = {f: jnp.where(seed_valid, v, 0) for f, v in frag.items()}
    return frag
