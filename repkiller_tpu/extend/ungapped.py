"""On-device ungapped x-drop seed extension (SURVEY.md §1 L3, §7 M1).

Semantics are defined by oracle.pipeline._directional_gain / extend_ungapped
(full-window cumsum + running-max x-drop, first-argmax endpoint) and must
match it bit-identically. Implementation is a chunked `lax.while_loop`:
each iteration gathers a CHUNK of bases for every live seed, advances the
(score, running-max, identity) carries with `cummax`/`cumsum` along the
chunk axis, and folds the chunk's best endpoint into the global best.
Most seeds die in the first chunk (random background drifts at
(match+3*mismatch)/4 per bp), so the loop usually runs 1-2 iterations
instead of max_extend scalar steps — XLA-friendly bulk passes, no
per-seed control flow (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.int32(-(1 << 30))
CHUNK = 128


def _direction(
    px: jnp.ndarray, py: jnp.ndarray, seed_valid: jnp.ndarray,
    cx: jnp.ndarray, cy: jnp.ndarray,
    base_off: int, step: int,
    match: int, mismatch: int, x_drop: int, max_extend: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One extension direction for all seeds -> (ext, gain, idents) int32[n].

    Positions visited at global step g (0-based): px + base_off + step*g
    (and likewise for y), i.e. base_off=k, step=+1 for right extension and
    base_off=-1, step=-1 for left extension.
    """
    assert max_extend % CHUNK == 0, "max_extend must be a multiple of CHUNK"
    n_chunks = max_extend // CHUNK
    n = px.shape[0]
    Lx, Ly = cx.shape[0], cy.shape[0]
    m32, mm32, xd32 = jnp.int32(match), jnp.int32(mismatch), jnp.int32(x_drop)

    u = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]          # (1, C)

    def body(state):
        c, stopped, s_carry, rm_carry, id_carry, best_g, best_ext, best_id = state
        g = c * CHUNK + u                                    # (1, C) global steps
        gx = px[:, None] + jnp.int32(base_off) + jnp.int32(step) * g
        gy = py[:, None] + jnp.int32(base_off) + jnp.int32(step) * g
        ok = (gx >= 0) & (gx < Lx) & (gy >= 0) & (gy < Ly)
        xa = cx[jnp.clip(gx, 0, Lx - 1)]
        ya = cy[jnp.clip(gy, 0, Ly - 1)]
        eq = ok & (xa == ya) & (xa < 4)

        delta = jnp.where(eq, m32, mm32)
        s = s_carry[:, None] + jnp.cumsum(delta, axis=1)
        rm = jnp.maximum(rm_carry[:, None],
                         jax.lax.cummax(jnp.maximum(s, 0), axis=1))
        stop = (~ok) | (s <= rm - xd32)
        any_stop = stop.any(axis=1)
        t = jnp.where(any_stop, jnp.argmax(stop, axis=1).astype(jnp.int32),
                      jnp.int32(CHUNK))
        alive = u < t[:, None]

        ids = id_carry[:, None] + jnp.cumsum(eq.astype(jnp.int32), axis=1)
        s_masked = jnp.where(alive, s, NEG_INF)
        bidx = jnp.argmax(s_masked, axis=1).astype(jnp.int32)  # first argmax
        bw = jnp.take_along_axis(s_masked, bidx[:, None], axis=1)[:, 0]
        bid = jnp.take_along_axis(ids, bidx[:, None], axis=1)[:, 0]

        better = (~stopped) & (bw > best_g)                   # strict: ties keep earlier
        best_g = jnp.where(better, bw, best_g)
        best_ext = jnp.where(better, c * CHUNK + bidx + 1, best_ext)
        best_id = jnp.where(better, bid, best_id)

        cont = ~stopped
        s_carry = jnp.where(cont, s[:, -1], s_carry)
        rm_carry = jnp.where(cont, rm[:, -1], rm_carry)
        id_carry = jnp.where(cont, ids[:, -1], id_carry)
        stopped = stopped | any_stop
        return c + 1, stopped, s_carry, rm_carry, id_carry, best_g, best_ext, best_id

    def cond(state):
        c, stopped = state[0], state[1]
        return (c < n_chunks) & (~jnp.all(stopped))

    z = jnp.zeros(n, jnp.int32)
    init = (jnp.int32(0), ~seed_valid, z, z, z, z, z, z)
    _, _, _, _, _, best_g, best_ext, best_id = jax.lax.while_loop(cond, body, init)
    return best_ext, best_g, best_id


def extend_ungapped(
    px: jnp.ndarray, py: jnp.ndarray, seed_valid: jnp.ndarray,
    cx: jnp.ndarray, cy: jnp.ndarray,
    k: int, match: int, mismatch: int, x_drop: int, max_extend: int,
) -> Dict[str, jnp.ndarray]:
    """Extend seeds into fragments; comparison-space coords, strand unset.

    Invalid seed slots start pre-stopped (zero cost) and keep zeroed
    fragment fields; callers carry `seed_valid` alongside.
    """
    rext, rgain, rid = _direction(px, py, seed_valid, cx, cy, k, +1,
                                  match, mismatch, x_drop, max_extend)
    lext, lgain, lid = _direction(px, py, seed_valid, cx, cy, -1, -1,
                                  match, mismatch, x_drop, max_extend)
    seed_score = jnp.int32(k * match)
    n = px.shape[0]
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
