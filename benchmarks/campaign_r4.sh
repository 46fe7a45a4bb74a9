#!/bin/sh
# Round-4 on-chip measurement campaign (round-3 verdict items 1, 5, 8):
# 1. smoke_chip FIRST — real-Mosaic parity gate; abort loudly on kernel
#    regression so no numbers are recorded against a broken compile path.
# 2. headline bench (config #1) + configs #2-#5 at single-v5e-feasible
#    scales, sequentially (one axon chip).
# 3. weak-scaling CPU/gloo proxy (virtual mesh — NOT hardware; the only
#    measurable stand-in for the >=2-host north star in this 1-chip env).
# Each step under `timeout` so a hang cannot eat the round.
set -x
cd "$(dirname "$0")/.."
echo "=== smoke_chip (Mosaic parity gate) ==="
timeout 3600 python benchmarks/smoke_chip.py 2>&1 || {
  echo "SMOKE FAILED rc=$? - aborting campaign"; exit 1; }
echo "=== headline bench (config1: E. coli-scale self, k=12) ==="
timeout 3600 python bench.py 2>&1
echo "=== config2 (yeast-scale self, k=16, families; clustering in timed region) ==="
timeout 3600 python benchmarks/run_config2.py --runs 3 2>&1
echo "=== config3 (strain pair, streamed) ==="
timeout 3600 python benchmarks/run_config3.py --backend streamed --runs 3 2>&1
echo "=== config4 (dmel 2L+2R masking, sharded index) ==="
timeout 3600 python benchmarks/run_config4.py --runs 3 2>&1
echo "=== config5 (chr1-scale streamed DP, reduced 0.25x) ==="
timeout 5400 python benchmarks/run_config5.py --scale 0.25 --runs 2 2>&1
echo "=== weak-scaling proxy (CPU gloo virtual mesh, not hardware) ==="
timeout 5400 python benchmarks/weak_scaling_proxy.py 2>&1
echo "=== campaign complete ==="
