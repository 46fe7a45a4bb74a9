"""On-device seed-hit finding (SURVEY.md §1 L2, §2.2 "Hit finding").

The reference joins two disk dictionaries (`hits` + `sortHits`); here the
join is a vectorised binary-search merge over two HBM-resident sorted
k-mer arrays, followed by a static-capacity pair expansion:

  1. per X-entry, locate its k-mer's run [lo, hi) in the Y index
     (searchsorted against the valid, kmer-sorted prefix);
  2. hyper-repeat cap: entries whose k-mer occurs > max_occ times on
     either side contribute nothing (matches oracle.pipeline.find_hits);
  3. self-comparison bounds are EXACT, not post-filtered: the canonical
     half (px < py for "f", px <= y_anchor for "r") is carved out of
     [lo, hi) with a (kmer, pos) pair binary search, so the reported
     total is the true hit count and no capacity is wasted on hits that
     a validity filter would then drop;
  4. exclusive-scan the per-entry pair counts, then scatter-free gather:
     output slot t maps back to its source entry by searchsorted over the
     inclusive count scan (the standard capacity + two-pass XLA pattern,
     SURVEY.md §7 "Hard parts" #3).

Sharding hooks (SURVEY.md §2.3 / §3.4): `shard` restricts the join to
k-mers owned by one hash-prefix shard (ownership = high bits of the
k-mer, so each k-mer's whole Y-run lives in exactly one shard and the
per-shard hit sets partition the global hit set); `occ_idx` supplies the
FULL X index for occurrence counting when `kx` is only a window of X.

Output hits carry a validity mask plus the TRUE total pair count so the
host can detect capacity overflow (overflow is detected, never silent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def searchsorted_pair(
    ka: jnp.ndarray, pa: jnp.ndarray, n_valid: jnp.ndarray,
    kq: jnp.ndarray, pq: jnp.ndarray,
) -> jnp.ndarray:
    """Right-bisect the composite key (kmer, pos) without 64-bit keys.

    (ka, pa) is sorted lexicographically on the valid prefix [0, n_valid);
    returns, per query, the first i in [0, n_valid] such that
    (ka[i], pa[i]) > (kq, pq). TPU-friendly: a fori_loop of vectorised
    compares (jnp.searchsorted has no multi-key form, and uint64 packing
    is unavailable with jax_enable_x64 off).
    """
    n = ka.shape[0]
    steps = max(1, int(n - 1).bit_length()) if n > 0 else 0
    # derive the carries from kq (not fresh constants) so they inherit
    # kq's varying-manual-axes type under shard_map — a constant-typed
    # carry fails lax.fori_loop's carry-type check inside shard_map
    lo = (kq.astype(jnp.int32) & jnp.int32(0))
    hi = lo + n_valid.astype(jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        km = ka[jnp.clip(mid, 0, n - 1)]
        pm = pa[jnp.clip(mid, 0, n - 1)]
        le = (km < kq) | ((km == kq) & (pm <= pq))  # key[mid] <= query
        lo = jnp.where(le, mid + 1, lo)
        hi = jnp.where(le, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


def _run_bounds(k_sorted: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-entry [run_start, run_end) of equal-value runs in a sorted
    array — two O(n) scans, no searching."""
    n = k_sorted.shape[0]
    i_idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool),
                             k_sorted[1:] != k_sorted[:-1]])
    lo = jax.lax.cummax(jnp.where(first, i_idx, 0))
    last = jnp.concatenate([k_sorted[1:] != k_sorted[:-1],
                            jnp.ones(1, bool)])
    nxt = jnp.where(last, i_idx + 1, n)
    hi = jax.lax.cummin(nxt[::-1])[::-1]
    return lo, hi


def join_hits(
    kx: jnp.ndarray, px: jnp.ndarray, nx_valid: jnp.ndarray,
    ky: jnp.ndarray, py: jnp.ndarray, ny_valid: jnp.ndarray,
    k: int,
    max_occ: int,
    capacity: int,
    self_mode: Optional[str] = None,
    y_len: int = 0,
    occ_idx: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    shard: Optional[Tuple[jnp.ndarray, int]] = None,
    same_index: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Join sorted indices -> (hpx, hpy, hvalid, total) with static capacity.

    self_mode "f": keep px < py (canonical half of a self-comparison; kx
    may be a window of the same genome Y was built from).
    self_mode "r": keep px <= y_len - py - k (X vs revcomp(X), matching
    oracle.pipeline.find_hits).
    occ_idx (k_full, n_full_valid): count X-side occurrences against this
    full index instead of kx (required when kx is a window).
    shard (shard_id, n_shards): keep only k-mers whose top bits equal
    shard_id — n_shards must be a power of two dividing 4**k.
    same_index (STATIC): kx/px ARE ky/py (self-comparison forward with the
    whole-genome index on both sides). Run bounds then come from O(n)
    boundary scans instead of searchsorted (whose "sort" method re-sorts
    queries+targets — the dominant join cost at genome scale), and the
    canonical-half bound is simply xi+1 (each entry sits inside its own
    pos-sorted run).
    """
    nx = kx.shape[0]
    xi = jnp.arange(nx, dtype=jnp.int32)

    # run of each X k-mer in Y (clamped to the valid prefix)
    if same_index:
        lo, hi = _run_bounds(kx)
    else:
        lo = jnp.searchsorted(ky, kx, side="left", method="sort").astype(jnp.int32)
        hi = jnp.searchsorted(ky, kx, side="right", method="sort").astype(jnp.int32)
    lo = jnp.minimum(lo, ny_valid)
    hi = jnp.minimum(hi, ny_valid)
    occ_y = hi - lo

    # occurrence count of each X k-mer in X itself
    if same_index:
        occ_x = occ_y                 # X and Y are the same index
    elif occ_idx is not None:
        ko, no_valid = occ_idx
        xlo = jnp.searchsorted(ko, kx, side="left", method="sort").astype(jnp.int32)
        xhi = jnp.searchsorted(ko, kx, side="right", method="sort").astype(jnp.int32)
        occ_x = jnp.minimum(xhi, no_valid) - jnp.minimum(xlo, no_valid)
    else:
        # occurrences of kx in kx itself: boundary scans, never a search
        xlo, xhi = _run_bounds(kx)
        occ_x = jnp.minimum(xhi, nx_valid) - jnp.minimum(xlo, nx_valid)

    x_is_valid = xi < nx_valid
    keep = x_is_valid & (occ_x <= max_occ) & (occ_y <= max_occ)

    if shard is not None:
        shard_id, n_shards = shard
        shift = 2 * k - (int(n_shards) - 1).bit_length()
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
        if shift <= 0:
            owner = kx.astype(jnp.uint32) % jnp.uint32(n_shards)
        else:
            owner = (kx >> jnp.uint32(shift)).astype(jnp.uint32)
        keep = keep & (owner == jnp.uint32(shard_id))

    # exact canonical-half bounds via (kmer, pos) bisection
    if self_mode == "f" and same_index:
        lo = jnp.maximum(lo, xi + 1)  # entry xi is inside its own run
    elif self_mode == "f":
        lo = jnp.maximum(lo, searchsorted_pair(ky, py, ny_valid, kx, px))
    elif self_mode == "r":
        anchor = jnp.int32(y_len) - px - jnp.int32(k)   # keep py <= anchor
        hi = jnp.minimum(hi, searchsorted_pair(ky, py, ny_valid, kx, anchor))
        hi = jnp.maximum(hi, lo)
    counts = jnp.where(keep, jnp.maximum(hi - lo, 0), 0)

    csum = jnp.cumsum(counts)                      # inclusive
    total = csum[-1] if nx > 0 else jnp.int32(0)
    offs = csum - counts                           # exclusive

    t = jnp.arange(capacity, dtype=jnp.int32)
    src = jnp.searchsorted(csum, t, side="right", method="sort").astype(jnp.int32)
    srcc = jnp.minimum(src, nx - 1)
    hvalid = t < total
    hpx = px[srcc]
    y_idx = lo[srcc] + (t - offs[srcc])
    hpy = py[jnp.clip(y_idx, 0, ky.shape[0] - 1)]

    hpx = jnp.where(hvalid, hpx, 0)
    hpy = jnp.where(hvalid, hpy, 0)
    return hpx, hpy, hvalid, total
