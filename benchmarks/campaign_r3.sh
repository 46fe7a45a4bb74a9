#!/bin/sh
# Round-3 on-chip measurement campaign: headline bench, extension dissect,
# and BASELINE configs #2-#5 at single-v5e-feasible scales, run
# sequentially (one axon chip). Output: one section per step on stdout.
set -x
cd "$(dirname "$0")/.."
python bench.py 2>&1
echo "=== extend_dissect ==="
python benchmarks/extend_dissect.py 2>&1
echo "=== config2 (yeast-scale self, k=16, families) ==="
python benchmarks/run_config2.py --runs 2 2>&1
echo "=== config3 (strain pair, streamed) ==="
python benchmarks/run_config3.py --backend streamed --runs 2 2>&1
echo "=== config4 (dmel 2L+2R masking, sharded index) ==="
python benchmarks/run_config4.py --runs 2 2>&1
echo "=== config5 (chr1-scale streamed DP, reduced 0.25x) ==="
python benchmarks/run_config5.py --scale 0.25 --runs 2 2>&1
