"""Physically sharded index storage (index/shards.py; SURVEY.md §3.4,
round-1 verdict item 5): per-device rows really are per-shard, the union
of shards is exactly the full index, and skew overflow raises."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.index.build import build_index
from repkiller_tpu.index.shards import build_sharded_index, shard_capacity
from repkiller_tpu.dist.mesh import make_mesh, SHARD_AXIS
from repkiller_tpu.utils import synth


K = 12


def _full_index(codes):
    km, pos, nv = jax.jit(build_index, static_argnums=1)(jnp.asarray(codes), K)
    nv = int(nv)
    return np.asarray(km)[:nv], np.asarray(pos)[:nv]


@pytest.mark.parametrize("n_shard", [1, 2, 4])
def test_shards_partition_full_index(n_shard):
    g = synth.plant(5000, [(120, 3, 0.02, 1)], seed=5)
    n_pos = g.codes.shape[0] - K + 1
    cap = shard_capacity(n_pos, n_shard, 1.5)
    kS, pS, cnt = jax.jit(build_sharded_index,
                          static_argnums=(1, 2, 3))(jnp.asarray(g.codes), K,
                                                    n_shard, cap)
    kS, pS, cnt = map(np.asarray, (kS, pS, cnt))
    km_full, pos_full = _full_index(g.codes)
    assert cnt.sum() == km_full.shape[0]
    shift = 2 * K - max((n_shard - 1).bit_length(), 0)
    got_k, got_p = [], []
    for s in range(n_shard):
        ks, ps = kS[s, : cnt[s]], pS[s, : cnt[s]]
        # every row owned by shard s, sorted by (kmer, pos)
        if n_shard > 1:
            assert ((ks >> shift) == s).all()
        key = ks.astype(np.uint64) << np.uint64(32) | ps.astype(np.uint64)
        assert (np.diff(key) > 0).all()
        got_k.append(ks), got_p.append(ps)
    assert np.array_equal(np.concatenate(got_k), km_full)
    assert np.array_equal(np.concatenate(got_p), pos_full)


def test_shard_storage_is_per_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    g = synth.plant(4000, [(100, 3, 0.0, 0)], seed=9)
    n_pos = g.codes.shape[0] - K + 1
    cap = shard_capacity(n_pos, 2, 1.5)

    @jax.jit
    def build(codes):
        return build_sharded_index(codes, K, 2, cap, mesh, SHARD_AXIS)

    kS, pS, cnt = build(jnp.asarray(g.codes))
    # each device holds exactly ONE shard row (n_shard-fold reduction)
    for arr in (kS, pS):
        shapes = {sh.data.shape for sh in arr.addressable_shards}
        assert shapes == {(1, cap)}, shapes


def test_shard_overflow_raises():
    from repkiller_tpu.dist.sharded import compare_sharded

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    # poly-A genome: every k-mer is 0 -> all rows land in shard 0
    codes = np.zeros(3000, np.uint8)
    cfg = Config(k=K, strands="f", hit_capacity=1 << 12, max_occ=1 << 30)
    with pytest.raises(ValueError, match="shard_slack"):
        compare_sharded(codes, None, cfg, make_mesh(2, 2))
