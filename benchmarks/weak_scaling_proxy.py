#!/usr/bin/env python
"""Weak-scaling PROXY on the virtual CPU mesh (round-3 verdict item 5).

Only ONE physical TPU chip is reachable in this environment, so the
BASELINE.json north star (>=90% weak-scaling efficiency to 2 hosts) cannot
be measured on hardware. This script records the closest measurable proxy:
config #5's sharded program run as 1 process vs 2 REAL OS processes with
gloo CPU collectives (1 device each), sizes scaled weakly (constant bp per
device). The number is NOT hardware efficiency — CPU "devices" are host
threads and gloo is loopback TCP, both slower relative to compute than
ICI — but it exercises the exact dispatch structure (jax.distributed
init, global mesh, XLA collectives, rank-0 merge) that would ride ICI on
a pod, and regressions in collective volume show up in it.

Prints one JSONL record:
  {"config": "weak_scaling_proxy_cpu", "per_device_bp": N,
   "bp_per_s_1dev": ..., "bp_per_s_2dev": ..., "efficiency": ...,
   "caveat": "virtual CPU mesh + gloo loopback, not TPU hardware"}
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(cmd, timeout):
    env = os.environ.copy()
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.Popen(cmd, cwd=REPO, env=env, text=True,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def _bp_per_s(stdout: str) -> float:
    for line in stdout.splitlines():
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if "bp_per_s" in rec:
            return float(rec["bp_per_s"])
    raise SystemExit(f"no bp_per_s record in worker output:\n{stdout}")


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-bp", type=int, default=1_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=2400)
    args = ap.parse_args()

    script = os.path.join(HERE, "run_config5.py")
    base = [sys.executable, script, "--platform", "cpu",
            "--runs", str(args.runs)]

    # 1 process, 1 CPU device, size = per_device_bp
    t0 = time.perf_counter()
    p = _run(base + ["--size", str(args.per_device_bp)], args.timeout)
    try:
        out, err = p.communicate(timeout=args.timeout)
    except subprocess.TimeoutExpired:
        p.kill()                      # no orphaned CPU burners
        p.communicate()
        raise SystemExit("1-proc run timed out")
    if p.returncode != 0:
        raise SystemExit(f"1-proc run failed rc={p.returncode}\n{err}")
    bp1 = _bp_per_s(out)
    print(f"# 1-proc done in {time.perf_counter()-t0:.0f}s: {bp1:.0f} bp/s",
          file=sys.stderr)

    # 2 processes, 1 CPU device each, size = 2 * per_device_bp (weak)
    port = _free_port()
    mp = base + ["--size", str(2 * args.per_device_bp),
                 "--coordinator", f"127.0.0.1:{port}",
                 "--num-processes", "2"]
    t0 = time.perf_counter()
    procs = [_run(mp + ["--process-id", str(i)], args.timeout)
             for i in range(2)]
    try:
        outs = [p.communicate(timeout=args.timeout) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        raise SystemExit("2-proc run timed out")
    for p, (out, err) in zip(procs, outs):
        if p.returncode != 0:
            raise SystemExit(f"2-proc rank failed rc={p.returncode}\n{err}")
    bp2 = _bp_per_s(outs[0][0])
    print(f"# 2-proc done in {time.perf_counter()-t0:.0f}s: {bp2:.0f} bp/s",
          file=sys.stderr)

    eff = bp2 / (2 * bp1)
    print(json.dumps({
        "config": "weak_scaling_proxy_cpu",
        "per_device_bp": args.per_device_bp,
        "bp_per_s_1dev": round(bp1, 1),
        "bp_per_s_2dev": round(bp2, 1),
        "efficiency": round(eff, 3),
        "caveat": "virtual CPU mesh + gloo loopback, not TPU hardware",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
