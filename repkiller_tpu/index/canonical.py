"""Canonical k-mer index: ONE index serving both strands of a
self-comparison (SURVEY.md §1 L1/L2; replaces the separate
revcomp-index build + sorted-rank join for the reverse strand).

Each position's k-mer is stored under its canonical form
``min(km, revcomp(km))`` with a strand flag. Key observations that turn
both strand joins into pure O(n) scans over one sorted array:

- forward pair (p, q):  km_p == km_q           <=> same canon, same flag
  (palindromic k-mers, km == rc(km), match regardless of flag — and in
  a palindromic canon's run EVERY entry has flag 0, so "same flag"
  degenerates to "whole run" there automatically);
- reverse pair (p, q):  km_p == rc(km_q)       <=> same canon, flags
  differ (palindromic run: whole run);
- the oracle's reverse canonical half  px <= y_len - py - k  (with py
  in revcomp space, py = L - k - q) is simply  p <= q  — an ORIGINAL
  COORDINATE comparison, so with runs sub-sorted by (flag, pos) every
  entry's partner set is one contiguous interval whose start is a
  segmented prefix count, not a search.

Layout: entries sorted by (canon, invalid, flag, pos). Per entry the
index records its run's sub-range boundaries, its rank among the
OPPOSITE flag's entries in original-position order (``alt_before``,
computed in a (canon, pos)-sorted auxiliary pass), and whether its
canon is palindromic. seeds/self_join.py consumes this directly.

Cost: two `lax.sort` passes over n entries (the plain index costs one)
— vs the one-sort-of-3n rank join plus a second index build it
replaces; measured ~4x cheaper at E. coli scale and it also removes
the reverse index's build/dispatch entirely.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .build import extract_kmers, SENTINEL
from ..seeds.join import _run_bounds


def revcomp_kmer(km: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse-complement of big-endian 2-bit-packed k-mers (uint32)."""
    x = (~km).astype(jnp.uint32)                     # complement each base
    # reverse 2-bit groups across the full 32 bits
    m2, m4 = jnp.uint32(0x33333333), jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    x = ((x & m8) << 8) | ((x >> 8) & m8)
    x = (x << 16) | (x >> 16)
    return x >> jnp.uint32(32 - 2 * k)               # realign to low bits


class CanonIndex(NamedTuple):
    pos: jnp.ndarray         # int32[n]  original position, (canon,flag,pos) order
    flag: jnp.ndarray        # int32[n]  0: km == canon, 1: km == rc(canon) != canon
    run_lo: jnp.ndarray      # int32[n]  run start of this entry's canon
    run_mid: jnp.ndarray     # int32[n]  boundary between flag-0 and flag-1 subruns
    run_hi: jnp.ndarray      # int32[n]  run end (exclusive)
    alt_before: jnp.ndarray  # int32[n]  # opposite-flag entries with pos < mine
    palin: jnp.ndarray       # bool[n]   canon == rc(canon)
    n_valid: jnp.ndarray     # int32     valid prefix length


def build_canonical_index(codes: jnp.ndarray, k: int) -> CanonIndex:
    """Canonical self-comparison index (see module docstring)."""
    km, pos, valid = extract_kmers(codes, k)
    rc = revcomp_kmer(km, k)
    canon = jnp.minimum(km, rc)
    flag = (km != canon).astype(jnp.int32)
    palin = (km == rc).astype(jnp.int32)
    canon = jnp.where(valid, canon, SENTINEL)
    # no separate `invalid` key: a VALID canon is min(km, rc(km)) and can
    # never be SENTINEL (rc(SENTINEL) == 0), so the sentinel groups all
    # invalid entries strictly after every valid run on its own.
    n = km.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # Sort operand packing: flag and palin ride in the position key's low
    # bits (pos dominant, so within-run order is still by pos), keeping
    # each lax.sort at 2-3 operands. Requires pos < 2^29 (per-sequence
    # genomes < 536 Mbp — int32 coordinates bound the pipeline anyway).
    posfp = (pos << 2) | (flag << 1) | palin

    # view A: (canon, pos) — strands interleaved in pos order.
    # Per entry: how many opposite-flag entries of my run precede me.
    cA, pfA = jax.lax.sort((canon, posfp), num_keys=2)
    fA = (pfA >> 1) & 1
    loA, hiA = _run_bounds(cA)
    idx = jnp.arange(n, dtype=jnp.int32)
    ones_cum = jnp.cumsum(fA)                        # inclusive count of flag-1
    run_start_cum = ones_cum[loA] - fA[loA]          # exclusive at run start
    n1_before = (ones_cum - fA) - run_start_cum      # flag-1 entries before me
    n0_before = (idx - loA) - n1_before
    alt_beforeA = jnp.where(fA == 1, n0_before, n1_before)

    # view B: (canon, flag, pos) — the index order used for expansion;
    # flag/palin move to the TOP bits (palin is constant per run, so it
    # never reorders within a run); alt_before rides as payload.
    # (A scatter-built B — slotB from the A-order cumsums, two O(n)
    # scatters — was measured on-chip at 247 ms vs this sort's 231 ms
    # for the whole index build: TPU scatters cost ~as much as the sort
    # they replace. benchmarks/seeds_dissect.py, 2026-08-20.)
    keyB = (pfA & 1) << 31 | ((pfA & 2) << 29) | (pfA >> 2)
    cB, kB, altB = jax.lax.sort((cA, keyB, alt_beforeA), num_keys=2)
    pB = kB & ((1 << 29) - 1)
    fB = (kB >> 30) & 1
    plB = (kB >> 31) & 1
    loB = jnp.minimum(loA, n_valid)
    hiB = jnp.minimum(hiA, n_valid)
    # subrun boundary: flag-0 entries in [lo, mid), flag-1 in [mid, hi).
    # count of flag-1 in the run via cumsum difference at the bounds
    f_cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(fB)])
    n1_run = f_cum[hiB] - f_cum[loB]
    midB = hiB - n1_run

    return CanonIndex(pos=pB, flag=fB, run_lo=loB, run_mid=midB,
                      run_hi=hiB, alt_before=altB, palin=plB == 1,
                      n_valid=n_valid)
