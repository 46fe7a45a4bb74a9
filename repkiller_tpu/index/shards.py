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

Two builders:

- :func:`build_sharded_index` — one global sort over replicated
  (kmer, pos) arrays, then boundary slicing. Peak per-device transient
  is O(n); right for single-device runs where there is nothing to
  distribute.
- :func:`build_sharded_index_dist` — the SURVEY.md §3.4 "DCN shuffle of
  (kmer, pos)" design (round-3 verdict item 4): the position space is
  split into n_device chunks, each device extracts + locally sorts only
  its chunk, entries shuffle to their owner shard over the mesh (XLA
  inserts the all-to-all/all-gather from sharding constraints), and each
  shard merges its received runs with one per-row sort. Peak per-device
  transient drops from O(n) to O(n / n_shard) (asserted by compiled
  memory accounting in tests/dist/test_index_shards.py), with the same
  bit-identical output.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .build import build_index, SENTINEL

MAXP = jnp.int32((1 << 31) - 1)   # pad position: sorts after any valid pos


def build_canonical_dist(
    codes: jnp.ndarray, k: int, n_shard: int, cap_shard: int,
    mesh: Mesh, data_axis: str, shard_axis: str, slack: float,
):
    """Distributed build of a hash-SHARDED canonical index (the
    canonical analog of :func:`build_sharded_index_dist`; round 5 —
    removes the replicated canonical build from the sharded self path).

    Ownership: shard of canon ``c`` = top log2(n_shard) bits of
    ``c * 2654435761`` (Knuth's multiplicative hash) — NOT the prefix
    the plain k-mer index uses, and not the raw low bits either:
    canonical values are biased toward small numbers (canon =
    min(km, rc), top bit set with probability ~1/4) so prefixes skew
    ~3:1 at n_shard=2, and the low bits are the canonical orientation's
    LAST BASE, measurably non-uniform too (1.7x skew on a random 3 kbp
    test genome). Any pure function of canon keeps every run in one
    shard, which is all the self-join needs; the multiplicative mix
    balances within the 1.5x default slack.

    Returns ``(ci2, cnt, blk_over)``: ``ci2`` is a CanonIndex whose
    per-entry fields are (n_shard, cap_shard) arrays sharded
    P(shard_axis) — row s is shard s's entries sorted by (canon,
    posfp) with shard-LOCAL B-slot indices, and ``ci2.n_valid`` is the
    (n_shard,) per-shard valid count; ``cnt`` is the same true
    per-shard entry count on the host side (caller raises when
    cnt > cap_shard) and ``blk_over`` = [max shuffle-block count,
    cap_blk] as in the k-mer builder.
    """
    from .canonical import canon_posfp, canon_scans, CanonIndex
    assert n_shard & (n_shard - 1) == 0, "n_shard must be a power of two"
    n_data = mesh.shape[data_axis]
    n_dev = n_data * n_shard
    L = codes.shape[0]
    n_pos = L - k + 1
    chunk = -(-n_pos // n_dev)
    pad_to = n_dev * chunk + k - 1
    codes_pad = jnp.concatenate(
        [codes, jnp.full(pad_to - L, 4, jnp.uint8)]) if pad_to > L else codes

    canon, posfp, valid = canon_posfp(codes_pad, k)
    # invalid entries: owner n_shard (sorts after every real shard, cut
    # by nv_row); valid canon can never be SENTINEL so no key conflict
    if n_shard == 1:
        own_hash = jnp.zeros_like(canon)
    else:
        bits = (n_shard - 1).bit_length()
        own_hash = ((canon * jnp.uint32(2654435761))
                    >> jnp.uint32(32 - bits))
    owner = jnp.where(valid, own_hash,
                      jnp.uint32(n_shard)).astype(jnp.int32)

    dsh = NamedSharding(mesh, P((data_axis, shard_axis)))
    ownR = jax.lax.with_sharding_constraint(owner.reshape(n_dev, chunk), dsh)
    canR = jax.lax.with_sharding_constraint(canon.reshape(n_dev, chunk), dsh)
    pfR = jax.lax.with_sharding_constraint(posfp.reshape(n_dev, chunk), dsh)

    # per-chunk row sort by (owner, canon, posfp): rows independent
    ownS, canS, pfS = jax.lax.sort((ownR, canR, pfR), dimension=1,
                                   num_keys=3)
    nv_row = jnp.sum(valid.reshape(n_dev, chunk).astype(jnp.int32), axis=1)

    cap_blk = shard_capacity(chunk, n_shard, slack)
    if n_shard == 1:
        b_lo = jnp.zeros((n_dev, 1), jnp.int32)
    else:
        bounds = jnp.arange(n_shard, dtype=jnp.int32)
        b_lo = jax.vmap(
            lambda row: jnp.searchsorted(row, bounds, side="left")
        )(ownS).astype(jnp.int32)
        b_lo = jnp.minimum(b_lo, nv_row[:, None])
    b = jnp.concatenate([b_lo, nv_row[:, None]], axis=1)
    c_cnt = b[:, 1:] - b[:, :-1]
    blk_max = jnp.max(c_cnt)

    rows = b[:, :-1, None] + jnp.arange(cap_blk, dtype=jnp.int32)[None, None, :]
    ok = rows < b[:, 1:, None]
    idx = jnp.minimum(rows, chunk - 1)
    kB = jnp.where(ok, jnp.take_along_axis(canS[:, None, :], idx, axis=2),
                   SENTINEL)
    pB = jnp.where(ok, jnp.take_along_axis(pfS[:, None, :], idx, axis=2),
                   MAXP)
    bsp = NamedSharding(mesh, P((data_axis, shard_axis), None, None))
    kB = jax.lax.with_sharding_constraint(kB, bsp)
    pB = jax.lax.with_sharding_constraint(pB, bsp)

    M = n_data * n_shard * cap_blk
    cnt = jnp.sum(c_cnt, axis=0, dtype=jnp.int32)          # (n_shard,)

    def _shuffle_scan(kb, pb, nv):         # local (1, n_shard, cap_blk)
        if n_shard > 1:
            kr = jax.lax.all_to_all(kb[0], shard_axis, 0, 0, tiled=True)
            pr = jax.lax.all_to_all(pb[0], shard_axis, 0, 0, tiled=True)
        else:
            kr, pr = kb[0], pb[0]
        if n_data > 1:
            kg = jax.lax.all_gather(kr, data_axis)
            pg = jax.lax.all_gather(pr, data_axis)
        else:
            kg, pg = kr[None], pr[None]
        kf = kg.reshape(M)
        pf = pg.reshape(M)
        if M < cap_shard:
            kf = jnp.pad(kf, (0, cap_shard - M), constant_values=SENTINEL)
            pf = jnp.pad(pf, (0, cap_shard - M), constant_values=int(MAXP))
        ks, ps = jax.lax.sort((kf, pf), num_keys=2)
        ks, ps = ks[:cap_shard], ps[:cap_shard]
        # shard-local canonical scans (run-local by construction:
        # ownership is a pure function of canon). nv arrives replicated.
        s = jax.lax.axis_index(shard_axis)
        ci = canon_scans(ks, ps, nv[jnp.minimum(s, n_shard - 1)])
        return tuple(f[None] if f.ndim else f.reshape(1)
                     for f in ci)

    ci_rows = jax.shard_map(
        _shuffle_scan, mesh=mesh,
        in_specs=(P((data_axis, shard_axis), None, None),) * 2 + (P(),),
        out_specs=(P(shard_axis),) * 10,
        check_vma=False,               # replicated along data (all_gather)
    )(kB, pB, cnt)
    ci2 = CanonIndex(*ci_rows)
    blk_over = jnp.stack([blk_max, jnp.int32(cap_blk)])
    return ci2, cnt, blk_over


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


def build_sharded_index_dist(
    codes: jnp.ndarray, k: int, n_shard: int, cap_shard: int,
    mesh: Mesh, data_axis: str, shard_axis: str, slack: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distributed build of the physically sharded index (SURVEY.md §3.4).

    -> (kS, pS, cnt) exactly as :func:`build_sharded_index`, plus
    ``blk_over`` — the maximum per-(chunk, destination-shard) entry count
    across the shuffle blocks; the caller must raise a ``shard_slack``
    overflow when ``blk_over > cap_blk`` (returned packed as
    ``[blk_max, cap_blk]``) because an overflowing block was truncated.

    Stages (all plain jnp + sharding constraints — XLA places the
    collectives, SURVEY.md §2.3 "no hand-written collectives"):

      1. extract k-mers globally (elementwise over the replicated codes;
         the sharding constraint on the chunked reshape makes SPMD
         materialise only chunk-sized slices per device);
      2. per-chunk row sort by (kmer, invalid, pos) — rows are
         independent, the sort dimension is unsharded;
      3. per-(chunk, shard) boundary search + static ``cap_blk`` send
         blocks;
      4. shard_map shuffle + merge: an explicit ``lax.all_to_all`` over
         the shard axis routes each block to its owner column
         (~8 bytes/entry over ICI/DCN), an ``all_gather`` over the data
         axis collects a shard's blocks from every chunk, and one local
         sort by (kmer, pos) merges them. Hand-placed collectives here
         because the equivalent sharded transpose makes the SPMD
         partitioner fall back to an "involuntary full
         rematerialization" (a replicated O(n) transient — exactly what
         this builder exists to avoid) on meshes with n_data > 1.

    Peak per-device transient: O(chunk) for stages 1-3 and
    O(slack * n / n_shard) for stage 4 — never the O(n) replicated
    transient of the global-sort build.
    """
    assert n_shard & (n_shard - 1) == 0, "n_shard must be a power of two"
    shift = 2 * k - (n_shard - 1).bit_length()
    assert n_shard == 1 or shift > 0, (
        f"physical sharding needs n_shard < 4**k (k={k}, n_shard={n_shard})")
    n_data = mesh.shape[data_axis]
    n_dev = n_data * n_shard
    L = codes.shape[0]
    n_pos = L - k + 1
    chunk = -(-n_pos // n_dev)
    # pad the tail chunk with N codes -> invalid k-mers, dropped in-row
    pad_to = n_dev * chunk + k - 1
    codes_pad = jnp.concatenate(
        [codes, jnp.full(pad_to - L, 4, jnp.uint8)]) if pad_to > L else codes

    from .build import extract_kmers
    km, pos, valid = extract_kmers(codes_pad, k)
    km = jnp.where(valid, km, SENTINEL)
    inval = (~valid).astype(jnp.int32)

    dsh = NamedSharding(mesh, P((data_axis, shard_axis)))
    kmR = jax.lax.with_sharding_constraint(km.reshape(n_dev, chunk), dsh)
    posR = jax.lax.with_sharding_constraint(pos.reshape(n_dev, chunk), dsh)
    invR = jax.lax.with_sharding_constraint(inval.reshape(n_dev, chunk), dsh)

    # stage 2: independent row sorts (sort dim is the unsharded axis)
    kmS, invS, posS = jax.lax.sort((kmR, invR, posR), dimension=1, num_keys=3)
    nv_row = jnp.sum(valid.reshape(n_dev, chunk).astype(jnp.int32), axis=1)

    # stage 3: per-row shard boundaries (vmapped bisect against the tiny
    # bounds vector), then static send blocks
    cap_blk = shard_capacity(chunk, n_shard, slack)
    if n_shard == 1:
        b_lo = jnp.zeros((n_dev, 1), jnp.int32)
    else:
        bounds = (jnp.arange(n_shard, dtype=jnp.uint32) << jnp.uint32(shift))
        b_lo = jax.vmap(
            lambda row: jnp.searchsorted(row, bounds, side="left")
        )(kmS).astype(jnp.int32)
        b_lo = jnp.minimum(b_lo, nv_row[:, None])
    b = jnp.concatenate([b_lo, nv_row[:, None]], axis=1)   # (n_dev, n_shard+1)
    c_cnt = b[:, 1:] - b[:, :-1]                           # (n_dev, n_shard)
    blk_max = jnp.max(c_cnt)

    rows = b[:, :-1, None] + jnp.arange(cap_blk, dtype=jnp.int32)[None, None, :]
    ok = rows < b[:, 1:, None]
    idx = jnp.minimum(rows, chunk - 1)
    kB = jnp.where(ok, jnp.take_along_axis(kmS[:, None, :], idx, axis=2),
                   SENTINEL)
    pB = jnp.where(ok, jnp.take_along_axis(posS[:, None, :], idx, axis=2),
                   MAXP)
    kB = jax.lax.with_sharding_constraint(kB, NamedSharding(
        mesh, P((data_axis, shard_axis), None, None)))
    pB = jax.lax.with_sharding_constraint(pB, NamedSharding(
        mesh, P((data_axis, shard_axis), None, None)))

    # stage 4: explicit shuffle + per-shard merge (see docstring). Pad
    # slots carry (SENTINEL, MAXP); every real entry has pos < MAXP, so
    # a (kmer, pos) 2-key sort puts pads strictly last even against
    # valid all-T k=16 k-mers.
    M = n_data * n_shard * cap_blk

    def _shuffle_merge(kb, pb):        # local (1, n_shard, cap_blk)
        if n_shard > 1:
            kr = jax.lax.all_to_all(kb[0], shard_axis, 0, 0, tiled=True)
            pr = jax.lax.all_to_all(pb[0], shard_axis, 0, 0, tiled=True)
        else:
            kr, pr = kb[0], pb[0]
        if n_data > 1:
            kg = jax.lax.all_gather(kr, data_axis)   # (n_data, n_shard, blk)
            pg = jax.lax.all_gather(pr, data_axis)
        else:
            kg, pg = kr[None], pr[None]
        kf = kg.reshape(M)
        pf = pg.reshape(M)
        if M < cap_shard:
            kf = jnp.pad(kf, (0, cap_shard - M), constant_values=SENTINEL)
            pf = jnp.pad(pf, (0, cap_shard - M),
                         constant_values=int(MAXP))
        ks, ps = jax.lax.sort((kf, pf), num_keys=2)
        return ks[None, :cap_shard], ps[None, :cap_shard]

    kS, pS_raw = jax.shard_map(
        _shuffle_merge, mesh=mesh,
        in_specs=(P((data_axis, shard_axis), None, None),) * 2,
        out_specs=(P(shard_axis, None),) * 2,
        check_vma=False,               # values ARE replicated along data
    )(kB, pB)                          # (the all_gather makes them so)
    cnt = jnp.sum(c_cnt, axis=0, dtype=jnp.int32)          # (n_shard,)
    okS = (jnp.arange(cap_shard, dtype=jnp.int32)[None, :]
           < jnp.minimum(cnt, cap_shard)[:, None])
    kS = jnp.where(okS, kS, SENTINEL)
    pS = jnp.where(okS, pS_raw, 0)
    ssh = NamedSharding(mesh, P(shard_axis))
    kS = jax.lax.with_sharding_constraint(kS, ssh)
    pS = jax.lax.with_sharding_constraint(pS, ssh)
    blk_over = jnp.stack([blk_max, jnp.int32(cap_blk)])
    return kS, pS, cnt, blk_over
