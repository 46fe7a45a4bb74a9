#!/bin/bash
# Round-5 on-chip measurement campaign (round-4 verdict items 1, 3, 7):
# every step runs TWICE — a "warm" pass (compile, generous timeout) then
# a "measure" pass (cache-hot, tight timeout) — with a background
# heartbeat logging wall clock + persistent-compile-cache entry count
# every 60 s, so a remote-compiler stall yields a diagnosable log (cache
# count frozen) instead of a silent hour, and a warm-phase timeout never
# costs the measured pass of the NEXT config. smoke_chip gates first:
# no numbers are recorded against a broken compile path.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/out/campaign_r5.log
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

heartbeat() {
  while :; do
    echo "[hb $(date +%H:%M:%S)] jax_cache entries: $(ls .jax_cache 2>/dev/null | wc -l)" >> "$LOG"
    sleep 60
  done
}
heartbeat & HB=$!
trap 'kill $HB 2>/dev/null' EXIT

step() {  # step NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  say "=== $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  if [ $rc -eq 124 ]; then say "!!! $name TIMED OUT after $((SECONDS-t0))s";
  elif [ $rc -ne 0 ]; then say "!!! $name FAILED rc=$rc after $((SECONDS-t0))s";
  else say "ok  $name in $((SECONDS-t0))s"; fi
  return $rc
}

step smoke_chip 5400 python benchmarks/smoke_chip.py || {
  say "SMOKE FAILED - aborting campaign"; exit 1; }

# headline (config #1)
step bench_warm 5400 python bench.py --runs 1
step bench 1200 python bench.py

# config #2 (device clustering now in the timed region by default)
step config2_warm 3600 python benchmarks/run_config2.py --runs 1
step config2 1200 python benchmarks/run_config2.py --runs 3

# config #3: device backend (the recorded row); streamed attempted after,
# never blocking the device number
step config3_warm 5400 python benchmarks/run_config3.py --backend device --runs 1
step config3 1800 python benchmarks/run_config3.py --backend device --runs 3

# config #4
step config4_warm 5400 python benchmarks/run_config4.py --runs 1
step config4 1800 python benchmarks/run_config4.py --runs 3

# config #5 (reduced 0.25x: 62 Mbp on the one reachable chip)
step config5_warm 7200 python benchmarks/run_config5.py --scale 0.25 --runs 1
step config5 1800 python benchmarks/run_config5.py --scale 0.25 --runs 2

# config #3 streamed (windowed driver) — warm first, measured only if warm
# completes; a remote-compiler stall here is named, not silent
step config3_streamed_warm 5400 python benchmarks/run_config3.py --backend streamed --runs 1 \
  && step config3_streamed 1800 python benchmarks/run_config3.py --backend streamed --runs 3

# on-chip clustering paths at config scales (cache hot from above)
step cluster_bench_c2 3600 python benchmarks/cluster_chip_bench.py --config 2
step cluster_bench_c4 3600 python benchmarks/cluster_chip_bench.py --config 4

# weak-scaling CPU/gloo proxy (virtual mesh — NOT hardware)
step weak_proxy 3600 python benchmarks/weak_scaling_proxy.py

say "=== campaign complete ==="
