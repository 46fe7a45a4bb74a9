#!/usr/bin/env python
"""Fetch-forced per-stage timing on the headline workload (the reliable
harness for this relay — see docs/PERF_NOTES.md round-4 "measurement
rule": the axon relay acks work it never executes, so every rep must
(a) perturb its input and (b) host-fetch a scalar that data-depends on
the whole computation; slope over two in-loop depths cancels the rest.

Prints one JSON line per stage: canonical index, self-join, thinning,
gated banded extension (per strand), merge — and the fused pipeline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 22)
    ap.add_argument("--hit-capacity", type=int, default=1 << 20)
    ap.add_argument("--seed-capacity", type=int, default=1 << 19)
    ap.add_argument("--k-lo", type=int, default=2)
    ap.add_argument("--k-hi", type=int, default=6)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from repkiller_tpu.config import Config
    from repkiller_tpu.utils import synth
    from repkiller_tpu import device

    cfg = Config(k=12, strands="fr", extend_mode="banded",
                 hit_capacity=args.hit_capacity,
                 seed_capacity=args.seed_capacity, max_extend=2048)
    fams = [(1024, 6, 0.02, 2), (768, 5, 0.05, 1), (512, 7, 0.0, 0),
            (1536, 3, 0.03, 1), (256, 8, 0.08, 2)]
    g = synth.plant(args.size, fams, seed=1234)
    codes = jax.device_put(jnp.asarray(g.codes))

    def slope(name, stage_fn):
        """stage_fn(codes_rolled) -> int32 scalar summarising its output.
        Each fori_loop iteration rolls the genome by one more base, so
        no two iterations compute the same thing; the scalar carry is
        fetched, forcing execution of everything."""

        def prog(iters):
            @jax.jit
            def f(codes, r):
                def body(i, acc):
                    return acc + stage_fn(jnp.roll(codes, i + r))
                return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
            return f

        f_lo, f_hi = prog(args.k_lo), prog(args.k_hi)

        def chain(f):
            t0 = time.perf_counter()
            for r in range(args.reps):
                int(f(codes, jnp.int32(1000 + r)))
            return time.perf_counter() - t0

        chain(f_lo)
        chain(f_hi)
        t_lo, t_hi = chain(f_lo), chain(f_hi)
        ms = (t_hi - t_lo) / ((args.k_hi - args.k_lo) * args.reps) * 1e3
        print(json.dumps({"stage": name, "ms_per_call": round(ms, 1)}))
        return ms

    from repkiller_tpu.index.canonical import build_canonical_index
    from repkiller_tpu.seeds.self_join import join_self_canonical
    from repkiller_tpu.seeds.filter import filter_hits
    from repkiller_tpu.chain.diagonal import extend_gated

    def s_index(c):
        ci = build_canonical_index(c, cfg.k)
        return (ci.pos[0] + ci.pos_b[0] + ci.run_lo[-1] + ci.run_mid[0]
                + ci.run_hi[0] + ci.own_rank[-1] + ci.alt_before[-1]
                + ci.n_valid)

    def s_index_gather(c):
        ci = build_canonical_index(c, cfg.k, scan_broadcast=False)
        return (ci.pos[0] + ci.pos_b[0] + ci.run_lo[-1] + ci.run_mid[0]
                + ci.run_hi[0] + ci.own_rank[-1] + ci.alt_before[-1]
                + ci.n_valid)

    def s_seeds_all(c):
        out = device._stage_self_seeds(c, cfg)
        acc = jnp.int32(0)
        for s, (spx, spy, sv, ns, th) in out.items():
            acc = (acc + spx[0] + spy[0] + ns.astype(jnp.int32)
                   + th.astype(jnp.int32))
        return acc

    def mk_join():
        def f(c):
            ci = build_canonical_index(c, cfg.k)
            (hx, hy, hv, tf), (rx, ry, rv, tr) = join_self_canonical(
                ci, cfg.k, cfg.max_occ, cfg.hit_capacity, int(c.shape[0]))
            return (hx[0] + hy[0] + tf.astype(jnp.int32)
                    + rx[0] + ry[0] + tr.astype(jnp.int32))
        return f

    def s_extend_f(c):
        out = device._stage_self_seeds(c, cfg)
        spx, spy, sv, ns, _ = out[0]
        frag, fv = extend_gated(spx, spy, sv, c, c, cfg, n_live=ns)
        return (frag["xStart"][0] + frag["score"][-1]
                + jnp.sum(fv.astype(jnp.int32)))

    def s_pipeline(c):
        out, n_frags, totals, nseeds = device.compare_fn(c, c, cfg, True)
        return (out["xStart"][0] + out["score"][-1]
                + n_frags.astype(jnp.int32))

    slope("canonical_index(scan_broadcast)", s_index)
    slope("canonical_index(gather form)", s_index_gather)
    slope("index+self_join", mk_join())
    slope("seeds_stage(index+join+thin both strands)", s_seeds_all)
    slope("seeds+thin+extend_gated (1 strand)", s_extend_f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
