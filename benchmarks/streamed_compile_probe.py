#!/usr/bin/env python
"""Name the streamed window program that stalls the axon remote
compiler (config #3 shapes). Each invocation lowers and compiles ONE
program (--program seeds|extend) so a wrapper can bound each with its
own `timeout` and the stall becomes attributable to a specific
program, ending round 4's "silent hour" failure mode for good.

Prints {"program": ..., "compile_s": ...} on success; a timeout kill
from the wrapper names the stalling program by omission.
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
    ap.add_argument("--program", choices=("seeds", "extend"), required=True)
    ap.add_argument("--size", type=int, default=4_600_000)
    ap.add_argument("--window", type=int, default=1 << 20)
    ap.add_argument("--hit-capacity", type=int, default=1 << 21)
    ap.add_argument("--seed-capacity", type=int, default=1 << 19)
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools
    import jax.numpy as jnp
    import numpy as np
    from repkiller_tpu.config import Config
    from repkiller_tpu.dist import windows as W

    cfg = Config(k=12, strands="fr", extend_mode="banded",
                 hit_capacity=args.hit_capacity,
                 seed_capacity=args.seed_capacity,
                 max_extend=2048, window=args.window)
    quantum = int(np.lcm(cfg.min_hit_dist, max(cfg.gate_stride, 1)))
    win = max(quantum, args.window - args.window % quantum)
    L = args.size
    n_pos = L - cfg.k + 1
    n_win = -(-n_pos // win)
    pad_to = n_win * win + cfg.k - 1
    n_idx = L - cfg.k + 1

    def sh(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype)

    t0 = time.perf_counter()
    if args.program == "seeds":
        fn = jax.jit(functools.partial(W._window_seeds, cfg=cfg,
                                       self_mode=None, win=win))
        lowered = fn.lower(
            sh((pad_to,), jnp.uint8), sh((), jnp.int32),
            (sh((n_idx,), jnp.uint32), sh((n_idx,), jnp.int32),
             sh((), jnp.int32)),
            (sh((n_idx,), jnp.uint32), sh((), jnp.int32)),
            sh((), jnp.int32))
    else:
        fn = jax.jit(functools.partial(W._window_extend, cfg=cfg, strand=0))
        cap = cfg.seed_cap
        lowered = fn.lower(
            sh((cap,), jnp.int32), sh((cap,), jnp.int32),
            sh((cap,), jnp.bool_), sh((), jnp.int32),
            sh((L,), jnp.uint8), sh((L,), jnp.uint8))
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    print(json.dumps({"program": args.program,
                      "lower_s": round(lower_s, 1),
                      "compile_s": round(time.perf_counter() - t0, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
