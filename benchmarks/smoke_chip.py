#!/usr/bin/env python
"""Real-chip smoke parity check (round-1 verdict item #10).

Runs the staged device pipeline on the ACTUAL axon TPU (the real Mosaic
compile path, not the interpreted-Pallas CPU mode the unit tests use) at
tiny shapes and asserts the output is bit-identical to the numpy oracle.
Fails loudly if a Mosaic regression lands (the i8-eq class of pitfalls in
docs/PERF_NOTES.md has bitten before). Runs in minutes; first invocation
pays the remote compile, re-runs hit the persistent cache.

Usage:  python benchmarks/smoke_chip.py           # axon TPU
        python benchmarks/smoke_chip.py --platform cpu   # harness check
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--size", type=int, default=60_000)
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    from repkiller_tpu import device
    from repkiller_tpu.config import Config
    from repkiller_tpu.oracle import pipeline as orc
    from repkiller_tpu.utils import synth

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    failures = 0
    # Both extension kernels, both comparison shapes, both strands: the
    # four Mosaic programs the real pipeline dispatches.
    cases = []
    for mode in ("banded", "ungapped"):
        cfg = Config(k=12, strands="fr", extend_mode=mode,
                     hit_capacity=1 << 16, max_extend=512)
        g = synth.plant(args.size, [(400, 4, 0.03, 1), (250, 3, 0.0, 1)],
                        seed=99)
        cases.append((f"self/{mode}", g.codes, None, cfg))
        if args.size < 6000:
            raise SystemExit(f"--size must be >= 6000 (cross-case plants "
                             f"g.codes[5000:7000]); got {args.size}")
        rng = np.random.default_rng(7)
        cy = rng.integers(0, 4, args.size // 2, dtype=np.uint8)
        cy[1000:3000] = g.codes[5000:7000]
        cases.append((f"cross/{mode}", g.codes, cy, cfg))

    for name, cx, cy, cfg in cases:
        t0 = time.perf_counter()
        got = device.compare(cx, cy, cfg)
        dt = time.perf_counter() - t0
        want = orc.compare(cx, cy, cfg)
        keys = list(orc.FRAG_FIELDS) + ["group"]
        bad = [k for k in keys if not np.array_equal(got[k], want[k])]
        n = got["xStart"].shape[0]
        if bad or n == 0:
            failures += 1
            print(f"FAIL {name}: frags={n} mismatched_fields={bad}")
        else:
            print(f"ok {name}: {n} fragments bit-identical to oracle "
                  f"({dt:.1f}s)")
    if failures:
        print(f"SMOKE FAILED: {failures}/{len(cases)} cases diverge")
        return 1
    print("SMOKE OK: device == oracle on the real compile path")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
