#!/usr/bin/env python
"""Dissect the extension stage on the headline workload (perf tool, not a
benchmark config): how much of the stage is XLA window gathers vs the
Pallas DP kernel, and how phase-1 depth changes the split.

Run on the real chip:  python benchmarks/extend_dissect.py [--size N]
"""

from __future__ import annotations

import argparse
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 22)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--hit-capacity", type=int, default=1 << 20)
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from repkiller_tpu.config import Config
    from repkiller_tpu.utils import synth
    from repkiller_tpu import device
    from repkiller_tpu.extend.banded_pallas import (
        extend_banded_pallas, _gather_window_packed)
    from repkiller_tpu.io.codec_device import pack_2bit_device

    cfg = Config(k=12, strands="fr", extend_mode="banded",
                 hit_capacity=args.hit_capacity, max_extend=2048)
    fams = [(1024, 6, 0.02, 2), (768, 5, 0.05, 1), (512, 7, 0.0, 0),
            (1536, 3, 0.03, 1), (256, 8, 0.08, 2)]
    g = synth.plant(args.size, fams, seed=1234)
    codes = jax.device_put(jnp.asarray(g.codes), jax.devices()[0])

    # seeds for the forward strand (cached stage programs from bench.py)
    idxX = device._stage_index(codes, cfg.k)
    hpx, hpy, hv, total = device._stage_join(
        idxX, idxX, jnp.int32(codes.shape[0]), cfg, "f", same_index=True)
    spx, spy, sv, n_seeds = device._stage_filter(hpx, hpy, hv,
                                                 cfg.min_hit_dist)
    jax.block_until_ready(n_seeds)
    print(f"# seeds: {int(n_seeds)} / capacity {args.hit_capacity}",
          file=sys.stderr)

    def timeit(name, fn, *a, **kw):
        jfn = fn if callable(fn) else None
        t0 = time.perf_counter()
        out = jfn(*a, **kw)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            out = jfn(*a, **kw)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} {statistics.median(ts)*1e3:9.1f} ms  "
              f"(compile+1st {compile_s:.1f}s)")
        return out

    # pure gather cost at phase-1 shape: all live chunks' windows, summed
    E1 = 192
    WP = -(-(2 * cfg.band + 1) // 8) * 8
    ex_rows = -(-E1 // 32) * 32
    sy_rows = ex_rows + (-(-(32 + WP) // 32) * 32)
    seed_chunk = 8192

    @jax.jit
    def gathers_only(spx, spy, sv, codes, n_seeds):
        w2, m2 = pack_2bit_device(codes)
        n = spx.shape[0]
        n_pad = -(-n // seed_chunk) * seed_chunk
        pxp = jnp.pad(spx, (0, n_pad - n))
        pyp = jnp.pad(spy, (0, n_pad - n))
        vp = jnp.pad(sv, (0, n_pad - n))
        n_chunks = n_pad // seed_chunk
        live = jnp.minimum((n_seeds + seed_chunk - 1) // seed_chunk, n_chunks)

        def body(state):
            c, acc = state
            s = c * seed_chunk
            cpx = jax.lax.dynamic_slice(pxp, (s,), (seed_chunk,))
            cpy = jax.lax.dynamic_slice(pyp, (s,), (seed_chunk,))
            cv = jax.lax.dynamic_slice(vp, (s,), (seed_chunk,))
            sx = _gather_window_packed(w2, m2, codes.shape[0],
                                       cpx + cfg.k, 1, ex_rows, 0, cv)
            sy = _gather_window_packed(w2, m2, codes.shape[0],
                                       cpy + cfg.k, 1, sy_rows, cfg.band, cv)
            acc = acc + jnp.sum(sx.astype(jnp.int32)) \
                + jnp.sum(sy.astype(jnp.int32))
            return c + 1, acc

        _, acc = jax.lax.while_loop(lambda st: st[0] < live, body,
                                    (jnp.int32(0), jnp.int32(0)))
        return acc

    timeit("gathers only (1 dir, E=192)", gathers_only,
           spx, spy, sv, codes, n_seeds)

    def ext(phase1, pre=0, two_phase=True):
        @jax.jit
        def f(spx, spy, sv, codes, n_seeds):
            return extend_banded_pallas(
                spx, spy, sv, codes, codes, cfg.k, cfg.match, cfg.mismatch,
                cfg.x_drop, cfg.max_extend, cfg.band, cfg.gap_open,
                cfg.gap_extend, n_live=n_seeds, two_phase=two_phase,
                phase1_rows=phase1, phase1_pre=pre)
        return f

    a = timeit("extend fwd (two-phase, p1=192)", ext(192),
               spx, spy, sv, codes, n_seeds)
    b = timeit("extend fwd (cascade 96->192)", ext(192, pre=96),
               spx, spy, sv, codes, n_seeds)
    import numpy as np
    for f in a:
        assert np.array_equal(np.asarray(a[f]), np.asarray(b[f])), f
    print("# cascade == two-phase: bit-identical")

    # --- fine probes: _direction alone at several row caps. Fitting
    # t(cap) = a*blocks + b*block_rows separates per-block overhead from
    # per-row cost; cap=192 alone is the phase-1 share of the two-phase
    # number above (the rest = compaction wrapper + full-depth re-run).
    from repkiller_tpu.extend.banded_pallas import _direction
    w2m2 = pack_2bit_device(codes)

    def probe(cap):
        @jax.jit
        def f(spx, spy, sv, codes, n_seeds):
            return _direction(
                spx, spy, sv, codes, codes, cfg.k, 1, cfg.match,
                cfg.mismatch, cfg.x_drop, cap, cfg.band, cfg.gap_open,
                cfg.gap_extend, 8192, False, n_live=n_seeds,
                packed_x=w2m2, packed_y=w2m2, jcap_override=cap + cfg.band)
        return f

    for cap in (32, 64, 96, 192):
        timeit(f"_direction fwd cap={cap}", probe(cap),
               spx, spy, sv, codes, n_seeds)

    # seed_chunk sweep at the phase-1 shape: fewer chunk-loop iterations
    # batch the window gathers better (the 43 ms gather share above)
    def probe_chunk(chunk):
        @jax.jit
        def f(spx, spy, sv, codes, n_seeds):
            return _direction(
                spx, spy, sv, codes, codes, cfg.k, 1, cfg.match,
                cfg.mismatch, cfg.x_drop, 192, cfg.band, cfg.gap_open,
                cfg.gap_extend, chunk, False, n_live=n_seeds,
                packed_x=w2m2, packed_y=w2m2, jcap_override=192 + cfg.band)
        return f

    for chunk in (16384, 32768):
        timeit(f"_direction fwd cap=192 chunk={chunk}", probe_chunk(chunk),
               spx, spy, sv, codes, n_seeds)

    # phase-2 in isolation: exact gated-path compacted full-depth re-run
    # on the seeds still alive at the row cap
    from repkiller_tpu.extend.banded_pallas import (_compact_rerun,
                                                    _result_packer)
    common = (cfg.match, cfg.mismatch, cfg.x_drop)
    tail = (cfg.band, cfg.gap_open, cfg.gap_extend, 8192, False)
    packer = _result_packer(cfg.max_extend, cfg.match)

    @jax.jit
    def alive_mask(spx, spy, sv, codes, n_seeds):
        _, _, _, _, alive = _direction(
            spx, spy, sv, codes, codes, cfg.k, 1, *common, 192, *tail,
            n_live=n_seeds, packed_x=w2m2, packed_y=w2m2,
            jcap_override=192 + cfg.band)
        return sv & (alive == 1)

    need = alive_mask(spx, spy, sv, codes, n_seeds)
    jax.block_until_ready(need)
    import numpy as _np
    print(f"# phase-1 survivors: {int(_np.asarray(need).sum())}",
          file=sys.stderr)

    @jax.jit
    def phase2_only(spx, spy, need, codes):
        return _compact_rerun(spx, spy, need, codes, codes, cfg.k, 1,
                              common, cfg.max_extend, tail, w2m2, w2m2,
                              packer)[:4]

    timeit("phase-2 only (compact+full depth)", phase2_only,
           spx, spy, need, codes)

    from repkiller_tpu.utils.scan import partition_live

    @jax.jit
    def partition_only(need):
        return partition_live(need)

    timeit("partition_live only", partition_only, need)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
