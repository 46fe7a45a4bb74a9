#!/usr/bin/env python
"""Headline benchmark (BASELINE.json metric): seed-extend Gbp/s per chip on
an E. coli-scale self-comparison (config #1: k=12, banded extend, 1 chip).

No genome data ships in this environment (zero egress), so the input is a
seeded synthetic genome of the same scale with planted repeat families
(IS-element-like: ~1 kb copies, some diverged, some inverted) — the same
workload shape as E. coli K-12 self-comparison. The timed region is the
full on-device pipeline (index build -> join -> thinning -> extension ->
merge/accept) with device-resident inputs/outputs; host clustering and
writers are excluded (they are output-size-bound, not genome-size-bound).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "Gbp/s", "vs_baseline": N}

vs_baseline is against the self-established first-working-build number
recorded in BASELINE.md (the reference records no published numbers —
BASELINE.json "published": {}).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Self-established baseline (BASELINE.md): first working build, axon TPU v5e,
# 1 chip, default bench config. None until first measured on the real chip.
BASELINE_GBPS = 0.000228


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 22,
                    help="genome length (bp); default 4.19 Mbp (E. coli scale)")
    ap.add_argument("--mode", choices=("banded", "ungapped"), default="banded")
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--strands", default="fr")
    ap.add_argument("--hit-capacity", type=int, default=1 << 20)
    ap.add_argument("--seed-capacity", type=int, default=1 << 19,
                    help="static thinned-seed bound (headline workload keeps "
                         "~398k of 543k hits; a tight bound halves the "
                         "capacity-sized extension overhead)")
    ap.add_argument("--max-extend", type=int, default=2048)
    ap.add_argument("--platform", default=None,
                    help="override jax platform (e.g. cpu for a smoke run)")
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from repkiller_tpu.config import Config
    from repkiller_tpu.utils import synth
    from repkiller_tpu import device

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    cfg = Config(k=args.k, strands=args.strands, extend_mode=args.mode,
                 hit_capacity=args.hit_capacity,
                 seed_capacity=args.seed_capacity,
                 max_extend=args.max_extend)
    # E.-coli-like repeat content: a handful of IS-element-scale families
    fams = [(1024, 6, 0.02, 2), (768, 5, 0.05, 1), (512, 7, 0.0, 0),
            (1536, 3, 0.03, 1), (256, 8, 0.08, 2)]
    g = synth.plant(args.size, fams, seed=1234)
    codes = jax.device_put(jnp.asarray(g.codes), dev)

    # staged execution: per-stage programs compile in minutes on the axon
    # remote compiler where the fused whole-pipeline program takes ~an
    # hour, failures are attributable, and stage walls are reported.
    # Warmup self-tunes capacities (utils/capacity.py) so a non-default
    # --size doesn't kill an unattended campaign on the first overflow.
    from repkiller_tpu.utils.capacity import grow_capacity
    for _attempt in range(5):
        t0 = time.perf_counter()
        out, n_frags, totals, nseeds = device.compare_staged(
            codes, codes, cfg, True)
        jax.block_until_ready((out, n_frags, totals))
        compile_s = time.perf_counter() - t0
        print(f"# warmup (compile+run): {compile_s:.1f}s; "
              f"fragments={int(n_frags)} "
              f"hit totals={list(map(int, totals))}", file=sys.stderr)
        if max(map(int, totals)) > cfg.hit_capacity:
            msg = "hit_capacity overflow"
        elif max(map(int, nseeds)) > cfg.seed_cap:
            msg = "seed_capacity overflow"
        else:
            break
        grown = grow_capacity(cfg, msg)
        assert grown is not None
        print(f"# {msg} -> retrying with {grown[1]}", file=sys.stderr)
        cfg = grown[0]
    else:
        raise SystemExit("capacity still overflowing after 5 doublings")
    assert int(n_frags) > 0, "bench produced no fragments — not a valid run"

    # MEASUREMENT RULE (docs/PERF_NOTES.md round 4): the axon relay acks
    # repeated identical dispatches without necessarily executing them,
    # so every timed run gets a DISTINCT input (device-side roll) and
    # ends with a host fetch of a scalar that data-depends on the whole
    # pipeline. Headline = the fused single-program pipeline (what a
    # production driver runs steady-state); staged walls below are the
    # per-stage diagnostic.
    def check_caps(totals, nseeds):
        # a rolled input could overflow where the unrolled warmup did not,
        # silently truncating the timed workload (round-4 advisor): fetch
        # the true counts of every timed run and fail loudly instead
        assert max(map(int, totals)) <= cfg.hit_capacity, \
            f"hit_capacity overflow on rolled input: {list(map(int, totals))}"
        assert max(map(int, nseeds)) <= cfg.seed_cap, \
            f"seed_capacity overflow on rolled input: {list(map(int, nseeds))}"

    roll = jax.jit(lambda c, r: jnp.roll(c, r))
    fused = jax.jit(lambda c: device.compare_fn(c, c, cfg, True))
    c1 = roll(codes, jnp.int32(1))
    t0 = time.perf_counter()
    out, n_frags, totals, nseeds = fused(c1)
    probe = int(n_frags) + int(out["xStart"][0])
    check_caps(totals, nseeds)
    print(f"# fused compile+1st: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    times = []
    for r in range(args.runs):
        c = roll(codes, jnp.int32(2 + r))
        t0 = time.perf_counter()
        out, n_frags, totals, nseeds = fused(c)
        probe = int(n_frags) + int(out["xStart"][0])   # forces execution
        times.append(time.perf_counter() - t0)
        check_caps(totals, nseeds)                     # fetch outside the clock
    med = statistics.median(times)
    gbps = args.size / med / 1e9
    print(f"# fused times={['%.3f' % t for t in times]} median={med:.3f}s",
          file=sys.stderr)

    stage = {}
    stage_times = []
    for r in range(2):
        c = roll(codes, jnp.int32(100 + r))
        t0 = time.perf_counter()
        out, n_frags, totals, nseeds = device.compare_staged(
            c, c, cfg, True, timings=stage)
        probe = int(n_frags)
        stage_times.append(time.perf_counter() - t0)
    print(f"# staged walls={['%.3f' % t for t in stage_times]} "
          "(per-stage seconds, 2 runs): " + json.dumps(
              {k: round(v, 3) for k, v in sorted(stage.items())}),
          file=sys.stderr)

    vs = gbps / BASELINE_GBPS if BASELINE_GBPS else 1.0
    print(json.dumps({
        "metric": "seed_extend_gbps_per_chip",
        "value": round(gbps, 6),
        "unit": "Gbp/s",
        "vs_baseline": round(vs, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
