"""Device-side 2-bit codec (BASELINE.json north star: "FASTA ingestion
packs sequences into 2-bit HBM-resident arrays").

jnp mirror of io/codec.pack_2bit — bit-for-bit the same words (16 bases
per uint32, base i at bits 2*(i%16)) and validity bitmap (bit i%32 of
word i//32 set iff base i is A/C/G/T). The packed pair is what the
extension window gather reads (extend/banded_pallas._gather_window_packed):
one word-pair gather covers 16 bases, cutting gather work ~5x and making
every gathered element word-aligned.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pack_2bit_device(codes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 codes[L] -> (words uint32[ceil(L/16)], nmask uint32[ceil(L/32)]).

    Matches io.codec.pack_2bit exactly (asserted by tests/unit/test_codec).
    """
    codes = codes.astype(jnp.uint32)
    L = codes.shape[0]
    valid = codes < 4
    b2 = jnp.where(valid, codes, 0)

    nwords = -(-L // 16)
    pad = jnp.zeros(nwords * 16 - L, jnp.uint32)
    bp = jnp.concatenate([b2, pad]).reshape(nwords, 16)
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, :]
    # disjoint bit fields: sum == bitwise OR
    words = (bp << shifts).sum(axis=1, dtype=jnp.uint32)

    mwords = -(-L // 32)
    vpad = jnp.concatenate([valid.astype(jnp.uint32),
                            jnp.zeros(mwords * 32 - L, jnp.uint32)])
    vb = vpad.reshape(mwords, 32)
    bshifts = jnp.arange(32, dtype=jnp.uint32)[None, :]
    nmask = (vb << bshifts).sum(axis=1, dtype=jnp.uint32)
    return words, nmask
