#!/usr/bin/env python
"""Fetch-forced extension dissect (replaces extend_dissect's per-dispatch
timing, which the relay can serve without executing — docs/PERF_NOTES.md
round-4 measurement rule). Every probe perturbs the SEEDS each iteration
(roll of the thinned seed arrays keeps counts/validity structure intact)
and fetches a scalar depending on every output.

Probes: window gathers alone, _direction at several row caps, the
two-phase gated path, phase-2 compact re-run, partition_live.
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
    from repkiller_tpu.seeds.filter import filter_hits
    from repkiller_tpu.extend.banded_pallas import (
        _direction, _compact_rerun, _result_packer, _gather_window_packed,
        extend_banded_pallas)
    from repkiller_tpu.chain.diagonal import extend_gated
    from repkiller_tpu.io.codec_device import pack_2bit_device
    from repkiller_tpu.utils.scan import partition_live

    cfg = Config(k=12, strands="fr", extend_mode="banded",
                 hit_capacity=args.hit_capacity,
                 seed_capacity=args.seed_capacity, max_extend=2048)
    fams = [(1024, 6, 0.02, 2), (768, 5, 0.05, 1), (512, 7, 0.0, 0),
            (1536, 3, 0.03, 1), (256, 8, 0.08, 2)]
    g = synth.plant(args.size, fams, seed=1234)
    codes = jax.device_put(jnp.asarray(g.codes))

    @jax.jit
    def seeds_once(codes):
        out = device._stage_self_seeds(codes, cfg)
        return out[0]
    spx, spy, sv, n_seeds, _th = seeds_once(codes)
    jax.block_until_ready(n_seeds)
    print(f"# seeds: {int(n_seeds)}", file=sys.stderr)
    w2m2 = pack_2bit_device(codes)
    jax.block_until_ready(w2m2)

    def slope(name, body_fn):
        """body_fn(px, py, v) -> scalar. Each iteration offsets every
        seed by (i + r) & 7 bases along its diagonal — front-density of
        live seeds and the work profile are preserved, but no two
        iterations compute the same thing (the relay cannot serve a
        cached ack) and the final scalar fetch forces execution."""

        def prog(iters):
            @jax.jit
            def f(spx, spy, sv, r):
                def body(i, acc):
                    s = (i + r) & 7
                    return acc + body_fn(spx + s, spy + s, sv)
                return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
            return f

        f_lo, f_hi = prog(args.k_lo), prog(args.k_hi)

        def chain(f):
            t0 = time.perf_counter()
            for r in range(args.reps):
                int(f(spx, spy, sv, jnp.int32(500 + r)))
            return time.perf_counter() - t0

        chain(f_lo)
        chain(f_hi)
        t_lo, t_hi = chain(f_lo), chain(f_hi)
        ms = (t_hi - t_lo) / ((args.k_hi - args.k_lo) * args.reps) * 1e3
        print(json.dumps({"probe": name, "ms_per_call": round(ms, 1)}))
        return ms

    common = (cfg.match, cfg.mismatch, cfg.x_drop)
    tail = (cfg.band, cfg.gap_open, cfg.gap_extend, 8192, False)

    E1 = 192
    WP = -(-(2 * cfg.band + 1) // 8) * 8
    ex_rows = -(-E1 // 32) * 32
    sy_rows = ex_rows + (-(-(32 + WP) // 32) * 32)

    def gathers_only(px, py, v):
        n = px.shape[0]
        n_chunks = n // 8192
        live = jnp.minimum((n_seeds + 8191) // 8192, n_chunks)

        def body(state):
            c, acc = state
            s = c * 8192
            cpx = jax.lax.dynamic_slice(px, (s,), (8192,))
            cpy = jax.lax.dynamic_slice(py, (s,), (8192,))
            cv = jax.lax.dynamic_slice(v, (s,), (8192,))
            sx = _gather_window_packed(*w2m2, codes.shape[0],
                                       cpx + cfg.k, 1, ex_rows, 0, cv)
            sy = _gather_window_packed(*w2m2, codes.shape[0],
                                       cpy + cfg.k, 1, sy_rows, cfg.band, cv)
            acc = acc + sx[0, 0].astype(jnp.int32) \
                + sy[0, 0].astype(jnp.int32) \
                + sx[-1, -1].astype(jnp.int32) + sy[-1, -1].astype(jnp.int32)
            return c + 1, acc

        _, acc = jax.lax.while_loop(lambda st: st[0] < live, body,
                                    (jnp.int32(0), jnp.int32(0)))
        return acc

    def direction_at(cap):
        def f(px, py, v):
            ei, ej, gn, idn, alive = _direction(
                px, py, v, codes, codes, cfg.k, 1, *common, cap, *tail,
                n_live=n_seeds, packed_x=w2m2, packed_y=w2m2,
                jcap_override=cap + cfg.band)
            return ei[0] + ej[-1] + gn[0] + idn[-1] + jnp.sum(alive)
        return f

    def two_phase_1dir(px, py, v):
        packer = _result_packer(cfg.max_extend, cfg.match)
        ei, ej, gn, idn, alive = _direction(
            px, py, v, codes, codes, cfg.k, 1, *common, 192, *tail,
            n_live=n_seeds, packed_x=w2m2, packed_y=w2m2,
            jcap_override=192 + cfg.band)
        need = v & (alive == 1)
        ei2, ej2, g2, id2, _ = _compact_rerun(
            px, py, need, codes, codes, cfg.k, 1, common, cfg.max_extend,
            tail, w2m2, w2m2, packer)
        ei = jnp.where(need, ei2, ei)
        return ei[0] + ei[-1] + jnp.sum(need.astype(jnp.int32))

    def gated_full(px, py, v):
        frag, fv = extend_gated(px, py, v, codes, codes, cfg,
                                n_live=n_seeds)
        return (frag["xStart"][0] + frag["score"][-1]
                + jnp.sum(fv.astype(jnp.int32)))

    def part_only(px, py, v):
        order, dest, nl = partition_live(v & (px > py))
        return order[0] + dest[-1] + nl

    slope("window gathers only (1 dir, E=192)", gathers_only)
    for cap in (32, 192):
        slope(f"_direction cap={cap}", direction_at(cap))
    slope("two-phase 1 dir (p1+compact+full)", two_phase_1dir)
    slope("gated extension (2 dirs, full wrapper)", gated_full)
    slope("partition_live", part_only)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
