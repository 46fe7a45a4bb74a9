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

    # Warm the relay into the dirty regime: one genuinely heavy program
    # (a big matmul power loop), repeated until its wall time becomes
    # non-trivial — a single small sort is absorbed by the relay's
    # async ack and every later timing reads as ~0 (measured).
    # MEASUREMENT RULE (hard-won): the axon relay acknowledges work it
    # never executes — block_until_ready on a repeated identical
    # dispatch returns in ~0 even for an 8-sort @ 8M-row program, and
    # per-call wall times are fiction. The only dependable clock is a
    # HOST FETCH of a result that data-depends on everything measured.
    # So each op runs K times inside one program (fori_loop, +i
    # perturbation defeats CSE), the program is chained across reps
    # (output feeds input, rep index as an argument defeats result
    # caching), and one element of the final carry is fetched. Slope
    # over two K depths cancels dispatch + fetch + chain overheads.
    K_LO, K_HI = 4, 24

    def slope(name, mk, *a):
        def prog(iters):
            def f(x, r, *rest):
                def body(i, x):
                    return mk(x, i + r, *rest)
                return jax.lax.fori_loop(0, iters, body, x)
            return jax.jit(f)
        reps = 4

        def chain(f, iters):
            x = a[0]
            t0 = time.perf_counter()
            for r in range(reps):
                x = f(x, jnp.int32(r * iters), *a[1:])
            np.asarray(x[:1] if x.ndim == 1 else x[:1, :1])  # force chain
            return time.perf_counter() - t0

        f_lo, f_hi = prog(K_LO), prog(K_HI)
        chain(f_lo, K_LO)                        # compile + warm
        chain(f_hi, K_HI)
        t_lo = chain(f_lo, K_LO)
        t_hi = chain(f_hi, K_HI)
        ms = (t_hi - t_lo) / ((K_HI - K_LO) * reps) * 1e3
        print(json.dumps({"op": name, "ms": round(ms, 3),
                          "cyc_per_elem": round(ms * 1e-3 * 940e6 / n, 2)}))
        return ms

    # mk(x, i, *rest) must depend on x so iterations chain
    slope("sort 1key(u32)",
          lambda x, i: jax.lax.sort((x ^ i.astype(jnp.uint32),),
                                    num_keys=1)[0], keys)
    slope("sort 2op",
          lambda x, i, v: jax.lax.sort((x ^ i.astype(jnp.uint32), v),
                                       num_keys=2)[0], keys, vals)
    slope("sort 3op",
          lambda x, i, v, f: jax.lax.sort(
              (x ^ i.astype(jnp.uint32), v, f), num_keys=3)[0],
          keys, vals, flags)
    slope("cumsum", lambda x, i: jnp.cumsum(x + i), flags)
    slope("cummax", lambda x, i: jax.lax.cummax(x + i), vals)
    slope("reverse+add", lambda x, i: (x + i)[::-1], vals)
    slope("gather n<-n", lambda x, i, p: x[(p + i) % n], vals, perm)
    vals8 = jax.device_put(jnp.asarray(
        np.tile(np.arange(n, dtype=np.int32)[:, None], (1, 8))))
    slope("gather rows (n,8)<-n",
          lambda x, i, p: x[(p + i) % n], vals8, perm)
    vals24 = jax.device_put(jnp.asarray(
        np.tile(np.arange(n, dtype=np.int32)[:, None], (1, 24))))
    slope("gather rows (n,24)<-n",
          lambda x, i, p: x[(p + i) % n], vals24, perm)
    slope("scatter n->n",
          lambda x, i, p: jnp.zeros(n, jnp.int32).at[(p + i) % n].set(x),
          vals, perm)
    slope("scatter-max n->n",
          lambda x, i, p: jnp.zeros(n, jnp.int32).at[(p + i) % n].max(x),
          vals, perm)
    slope("where+add (4 elementwise)",
          lambda x, i, f: jnp.where(f > i, x + 1, x - 1) + x * 2,
          vals, flags)
    slope("segbcast fwd (where+cummax)",
          lambda x, i, f: jax.lax.cummax(jnp.where(f > 0, x + i, 0)),
          vals, flags)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
