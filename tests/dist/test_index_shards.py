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
    # poly-A genomes: every k-mer is 0 -> all index rows land in shard 0.
    # A CROSS comparison exercises the sharded Y-index build (round 5:
    # self-comparisons use the canonical path, which has no per-k-mer
    # index shards to overflow).
    codes = np.zeros(3000, np.uint8)
    cfg = Config(k=K, strands="f", hit_capacity=1 << 12, max_occ=1 << 30)
    with pytest.raises(ValueError, match="shard_slack"):
        compare_sharded(codes, codes.copy(), cfg, make_mesh(2, 2))


class TestDistributedBuild:
    """build_sharded_index_dist (SURVEY.md §3.4 all-to-all shuffle build,
    round-3 verdict item 4): bit-identical to the global-sort build on
    every mesh shape, and the compiled program's per-device transient
    drops with n_shard (live-array/compiled-memory accounting)."""

    @pytest.mark.parametrize("shape", [(1, 2), (2, 2), (1, 4), (4, 2), (2, 4)])
    def test_bit_identical_to_global_build(self, shape):
        from repkiller_tpu.index.shards import build_sharded_index_dist
        n_data, n_shard = shape
        if jax.device_count() < n_data * n_shard:
            pytest.skip("needs more virtual devices")
        mesh = make_mesh(n_data, n_shard,
                         devices=jax.devices()[: n_data * n_shard])
        # multi-record-style genome with Ns and planted repeats
        g = synth.plant(6000, [(150, 3, 0.03, 1), (80, 4, 0.0, 0)], seed=11)
        codes = np.asarray(g.codes).copy()
        codes[777:790] = 4                       # N block -> invalid k-mers
        n_pos = codes.shape[0] - K + 1
        cap = shard_capacity(n_pos, n_shard, 1.5)

        @jax.jit
        def build_ref(c):
            return build_sharded_index(c, K, n_shard, cap, mesh, "shard")

        @jax.jit
        def build_dist(c):
            return build_sharded_index_dist(c, K, n_shard, cap, mesh,
                                            "data", "shard", 1.5)

        kR, pR, cR = map(np.asarray, build_ref(jnp.asarray(codes)))
        kD, pD, cD, blk = map(np.asarray, build_dist(jnp.asarray(codes)))
        assert blk[0] <= blk[1], "shuffle block overflow in test workload"
        assert np.array_equal(cR, cD)
        assert np.array_equal(kR, kD)
        assert np.array_equal(pR, pD)

    def test_all_T_k16_vs_pad_disambiguation(self):
        """Valid all-T k-mers share the SENTINEL bit pattern; the shuffle
        pads must still sort strictly after them (pos=MAXP trick)."""
        from repkiller_tpu.index.shards import build_sharded_index_dist
        if jax.device_count() < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(2, 2, devices=jax.devices()[:4])
        k = 16
        codes = np.full(200, 3, np.uint8)        # poly-T: all k-mers 0xFFFFFFFF
        n_pos = codes.shape[0] - k + 1
        cap = shard_capacity(n_pos, 2, 4.0)

        @jax.jit
        def build_dist(c):
            return build_sharded_index_dist(c, k, 2, cap, mesh,
                                            "data", "shard", 4.0)

        kD, pD, cD, blk = map(np.asarray, build_dist(jnp.asarray(codes)))
        assert blk[0] <= blk[1]
        assert cD.sum() == n_pos                 # every all-T k-mer kept
        s = 1                                    # 0xFF... prefix -> last shard
        assert np.array_equal(np.sort(pD[s, : cD[s]]),
                              np.arange(n_pos, dtype=np.int32))

    def test_per_device_transient_drops_with_shards(self):
        """Compiled memory accounting: the distributed build's per-device
        temp allocation at 8 shards is a small fraction of the global-sort
        build's O(n) transient (the round-3 verdict's acceptance test)."""
        from repkiller_tpu.index.shards import build_sharded_index_dist
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(1, 8, devices=jax.devices()[:8])
        L = 1 << 18
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 4, L, np.uint8)
        n_pos = L - K + 1
        cap = shard_capacity(n_pos, 8, 1.5)
        arg = jax.ShapeDtypeStruct((L,), jnp.uint8)

        def build_ref(c):
            return build_sharded_index(c, K, 8, cap, mesh, "shard")

        def build_dist(c):
            return build_sharded_index_dist(c, K, 8, cap, mesh,
                                            "data", "shard", 1.5)

        mem = {}
        for name, fn in (("ref", build_ref), ("dist", build_dist)):
            try:
                ana = jax.jit(fn).lower(arg).compile().memory_analysis()
                mem[name] = int(ana.temp_size_in_bytes)
            except (AttributeError, NotImplementedError, TypeError):
                pytest.skip("backend exposes no memory analysis")
        if min(mem.values()) == 0:
            pytest.skip("backend reports zero temp size")
        # global-sort build holds >= 3 n-sized operands; distributed holds
        # chunk- and shard-sized pieces. Require a >= 2x drop (the
        # asymptotic factor is ~n_shard; CPU fusion noise eats some of it)
        assert mem["dist"] * 2 <= mem["ref"], mem
