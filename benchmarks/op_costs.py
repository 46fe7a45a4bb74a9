#!/usr/bin/env python
"""Primitive op-cost microbenchmark at seeds-stage scale (perf tool,
SURVEY.md §7 M6): dispatch-slope-times sort/cumsum/cummax/gather/scatter/
reverse at n rows on the real chip so canonical-index / self-join design
choices (scan-vs-gather, scatter count) are driven by measured numbers
rather than the 7-cycles/element folk model (docs/PERF_NOTES.md)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=(1 << 22) - 11)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    n = args.n
    rng = np.random.default_rng(7)
    keys = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 24, n, np.uint32)))
    vals = jax.device_put(jnp.asarray(np.arange(n, dtype=np.int32)))
    perm = jax.device_put(jnp.asarray(
        rng.permutation(n).astype(np.int32)))
    flags = jax.device_put(jnp.asarray(
        (rng.random(n) < 0.1).astype(np.int32)))

    # warm the relay into the dirty regime
    jax.block_until_ready(jax.jit(lambda k: jnp.sort(k))(keys))

    def slope(name, fn, *a):
        f = jax.jit(fn)
        jax.block_until_ready(f(*a))
        n_lo, n_hi = max(2, args.iters // 4), args.iters
        t0 = time.perf_counter()
        for _ in range(n_lo):
            out = f(*a)
        jax.block_until_ready(out)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_hi):
            out = f(*a)
        jax.block_until_ready(out)
        t_hi = time.perf_counter() - t0
        ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
        print(json.dumps({"op": name, "ms": round(ms, 3),
                          "cyc_per_elem": round(ms * 1e-3 * 940e6 / n, 2)}))
        return ms

    slope("sort 1op", lambda k: jax.lax.sort((k,), num_keys=1)[0], keys)
    slope("sort 2op", lambda k, v: jax.lax.sort((k, v), num_keys=2)[0],
          keys, vals)
    slope("sort 3op",
          lambda k, v, f: jax.lax.sort((k, v, f), num_keys=3)[0],
          keys, vals, flags)
    slope("cumsum", lambda f: jnp.cumsum(f), flags)
    slope("cummax", lambda v: jax.lax.cummax(v), vals)
    slope("reverse", lambda v: v[::-1], vals)
    slope("gather n<-n", lambda v, p: v[p], vals, perm)
    vals8 = jax.device_put(jnp.asarray(
        np.tile(np.arange(n, dtype=np.int32)[:, None], (1, 8))))
    slope("gather rows (n,8)<-n", lambda v8, p: v8[p], vals8, perm)
    slope("scatter n->n",
          lambda v, p: jnp.zeros(n, jnp.int32).at[p].set(v), vals, perm)
    slope("scatter-max n->n",
          lambda v, p: jnp.zeros(n, jnp.int32).at[p].max(v), vals, perm)
    slope("where+add (5 elementwise)",
          lambda v, f: jnp.where(f > 0, v + 1, v - 1) + v * 2, vals, flags)
    slope("segbcast fwd (where+cummax)",
          lambda v, f: jax.lax.cummax(jnp.where(f > 0, v, 0)), vals, flags)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
