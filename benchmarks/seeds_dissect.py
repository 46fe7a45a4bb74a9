#!/usr/bin/env python
"""Dissect the seeds stage on the real chip (perf tool, SURVEY.md §7 M6):
times each sub-stage of _stage_self_seeds as its own program — canonical
index build, canonical self-join expansion, per-strand thinning — via
dispatch-slope timing ((t_N - t_M)/(N - M)) with the measured per-dispatch
relay cost subtracted (docs/PERF_NOTES.md "Measurement rules")."""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 22)
    ap.add_argument("--hit-capacity", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=12)
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
    from repkiller_tpu.index.canonical import build_canonical_index
    from repkiller_tpu.seeds.self_join import join_self_canonical
    from repkiller_tpu.seeds.filter import filter_hits

    cfg = Config(k=12, strands="fr", extend_mode="banded",
                 hit_capacity=args.hit_capacity, max_extend=2048)
    fams = [(1024, 6, 0.02, 2), (768, 5, 0.05, 1), (512, 7, 0.0, 0),
            (1536, 3, 0.03, 1), (256, 8, 0.08, 2)]
    g = synth.plant(args.size, fams, seed=1234)
    codes = jax.device_put(jnp.asarray(g.codes), jax.devices()[0])

    # warm the relay into the dirty regime with a real program
    seeds = device._stage_self_seeds(codes, cfg)
    jax.block_until_ready(seeds)

    def slope(name, fn, *a, **kw):
        # warm/compile
        jax.block_until_ready(fn(*a, **kw))
        n_lo, n_hi = max(2, args.iters // 4), args.iters
        t0 = time.perf_counter()
        for _ in range(n_lo):
            out = fn(*a, **kw)
        jax.block_until_ready(out)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_hi):
            out = fn(*a, **kw)
        jax.block_until_ready(out)
        t_hi = time.perf_counter() - t0
        per = (t_hi - t_lo) / (n_hi - n_lo)
        print(f"# {name}: {per * 1e3:.1f} ms/dispatch "
              f"(lo {t_lo:.3f}s/{n_lo}, hi {t_hi:.3f}s/{n_hi})",
              file=sys.stderr)
        return per

    noop = jax.jit(lambda a: a + 1)
    base = slope("noop dispatch", noop, jnp.zeros(8, jnp.int32))

    j_index = functools.partial(jax.jit, static_argnames=("k",))(
        build_canonical_index)
    t_index = slope("canonical index", j_index, codes, cfg.k)

    j_index_sb = functools.partial(
        jax.jit, static_argnames=("k", "scan_broadcast"))(
        build_canonical_index)
    slope("canonical index (scan_broadcast)", j_index_sb, codes, cfg.k,
          scan_broadcast=True)

    ci = j_index(codes, cfg.k)
    jax.block_until_ready(ci)
    j_join = functools.partial(jax.jit,
                               static_argnames=("k", "max_occ", "capacity",
                                                "y_len"))(join_self_canonical)
    t_join = slope("self join", j_join, ci, k=cfg.k, max_occ=cfg.max_occ,
                   capacity=cfg.hit_capacity, y_len=int(codes.shape[0]))

    hits_f, hits_r = j_join(ci, k=cfg.k, max_occ=cfg.max_occ,
                            capacity=cfg.hit_capacity,
                            y_len=int(codes.shape[0]))
    jax.block_until_ready((hits_f, hits_r))
    t_filt = slope("filter (1 strand)", device._stage_filter,
                   hits_f[0], hits_f[1], hits_f[2], cfg.min_hit_dist)

    t_all = slope("fused seeds stage", device._stage_self_seeds, codes, cfg)

    print(f"# net of dispatch: index {1e3 * (t_index - base):.1f} ms, "
          f"join {1e3 * (t_join - base):.1f} ms, "
          f"filter {1e3 * (t_filt - base):.1f} ms/strand, "
          f"fused stage {1e3 * (t_all - base):.1f} ms "
          f"(sum of parts {1e3 * (t_index + t_join + 2 * t_filt - 4 * base):.1f} ms)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
