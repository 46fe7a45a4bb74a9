"""Physically sharded k-mer index storage (SURVEY.md §3.4 "index sharded
by hash prefix"; round-1 verdict item 5: stop replicating the index).

Ownership: k-mer ``km`` belongs to shard ``km >> (2k - log2(n_shard))`` —
the hash-prefix function SURVEY.md §2.3 specifies, and the same one
seeds/join.py's ``shard`` filter uses, so a k-mer's entire run lives in
exactly one shard and per-shard hit sets partition the global hit set.

Storage: ``(n_shard, cap_shard)`` arrays with
``NamedSharding(mesh, P(SHARD_AXIS))`` — each shard column of the
(data, shard) mesh holds ONLY its shard's rows, replicated along the
data axis. Steady-state per-device index memory is
``cap_shard = slack * n / n_shard`` entries instead of ``n``: the
n_shard-fold reduction. Because ownership is a prefix of the sort key,
a shard's rows are a contiguous slice of the globally sorted index, so
sharding = one boundary search + one gather whose output is sharded
(XLA partitions the gather: each device materialises only its row).

The build still runs one global sort over replicated (kmer, pos)
arrays — transient n-sized arrays per device, freed after the slice.
A fully distributed build (per-window extraction + all-to-all shuffle
over ICI/DCN, no replicated transient) is the remaining step for
pod-scale genomes and is documented in dist/sharded.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .build import build_index, SENTINEL


def shard_capacity(n_pos: int, n_shard: int, slack: float) -> int:
    """Static per-shard row capacity: slack * n / n_shard, 8-aligned,
    never above n (the n_shard == 1 degenerate case)."""
    cap = -(-int(n_pos * slack) // n_shard)
    cap = -(-cap // 8) * 8
    return max(8, min(-(-n_pos // 8) * 8, cap))


def build_sharded_index(
    codes: jnp.ndarray, k: int, n_shard: int, cap_shard: int,
    mesh: Mesh = None, shard_axis: str = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (kS uint32[n_shard, cap_shard], pS int32[n_shard, cap_shard],
    cnt int32[n_shard]).

    Row s holds shard s's (kmer, pos) entries sorted by (kmer, pos),
    SENTINEL-padded to cap_shard; cnt[s] is the true count (the caller
    must raise when cnt > cap_shard — overflow is detected, never
    silent). With mesh/shard_axis given, the output arrays are
    sharded P(shard_axis) so each device stores only its shard.
    """
    assert n_shard & (n_shard - 1) == 0, "n_shard must be a power of two"
    shift = 2 * k - (n_shard - 1).bit_length()
    assert n_shard == 1 or shift > 0, (
        f"physical sharding needs n_shard < 4**k (k={k}, n_shard={n_shard})")

    km_s, pos_s, n_valid = build_index(codes, k)
    n = km_s.shape[0]

    # shard boundaries: rank of the first entry owned by shard s. The
    # sort key's prefix IS the owner, so shards are contiguous slices.
    if n_shard == 1:
        b_lo = jnp.zeros(1, jnp.int32)
    else:
        bounds = (jnp.arange(n_shard, dtype=jnp.uint32)
                  << jnp.uint32(shift))
        b_lo = jnp.searchsorted(km_s, bounds, side="left").astype(jnp.int32)
        b_lo = jnp.minimum(b_lo, n_valid)
    b = jnp.concatenate([b_lo, n_valid.astype(jnp.int32)[None]])
    cnt = b[1:] - b[:-1]

    rows = b[:-1, None] + jnp.arange(cap_shard, dtype=jnp.int32)[None, :]
    ok = rows < b[1:, None]
    idx = jnp.minimum(rows, n - 1)
    kS = jnp.where(ok, km_s[idx], SENTINEL)
    pS = jnp.where(ok, pos_s[idx], 0)
    if mesh is not None and shard_axis is not None:
        sh = NamedSharding(mesh, P(shard_axis))
        kS = jax.lax.with_sharding_constraint(kS, sh)
        pS = jax.lax.with_sharding_constraint(pS, sh)
    return kS, pS, cnt
