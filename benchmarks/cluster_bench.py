#!/usr/bin/env python
"""Host-clustering cost curve (round-1 verdict weak item 5): time
cluster_families on synthetic fragment tables up to >=10^6 rows,
including a dense pileup (max_occ-bound 64-copy family -> ~2k mutually
overlapping intervals per locus). Pure numpy, no device."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np                                           # noqa: E402

from repkiller_tpu.config import Config                      # noqa: E402
from repkiller_tpu.families.cluster import cluster_families  # noqa: E402
from repkiller_tpu.oracle import pipeline as orc             # noqa: E402


def synth_frags(n: int, genome: int, pile_copies: int, seed: int):
    """n fragments: 90% scattered repeat pairs, 10% from a dense pileup
    (every pair of `pile_copies` copies of one locus, repeated until the
    quota is filled) — the worst realistic shape, since max_occ bounds
    copies-with-seeds at ~64."""
    rng = np.random.default_rng(seed)
    n_pile = n // 10 if pile_copies >= 2 else 0
    n_scat = n - n_pile
    ln = rng.integers(60, 2000, n_scat).astype(np.int64)
    xs = rng.integers(0, genome - 2100, n_scat).astype(np.int64)
    ys = rng.integers(0, genome - 2100, n_scat).astype(np.int64)

    # pileup: copy loci spaced widely; fragments pair copies (xi, xj)
    if n_pile:
        locs = (np.arange(pile_copies, dtype=np.int64)
                * (genome // pile_copies) + 500)
        ii, jj = np.triu_indices(pile_copies, k=1)
        reps = -(-n_pile // ii.shape[0])
        ii = np.tile(ii, reps)[:n_pile]
        jj = np.tile(jj, reps)[:n_pile]
    else:
        ii = jj = np.zeros(0, np.int64)
        locs = np.zeros(1, np.int64)
    pl = rng.integers(280, 330, n_pile).astype(np.int64)   # Alu-ish lengths

    frag = {
        "xStart": np.concatenate([xs, locs[ii]]),
        "yStart": np.concatenate([ys, locs[jj]]),
        "strand": np.zeros(n, np.int64),
        "length": np.concatenate([ln, pl]),
    }
    frag["xEnd"] = frag["xStart"] + frag["length"] - 1
    frag["yEnd"] = frag["yStart"] + frag["length"] - 1
    frag = {k: v.astype(np.int32) for k, v in frag.items()}
    frag["score"] = frag["length"] * 4
    frag["idents"] = frag["length"]
    return orc.canonical_sort(frag)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,300000,1000000")
    ap.add_argument("--pile-copies", type=int, default=64)
    args = ap.parse_args()
    cfg = Config()
    genome = 250_000_000
    for n in map(int, args.sizes.split(",")):
        frag = synth_frags(n, genome, args.pile_copies, seed=n)
        t0 = time.perf_counter()
        lab = cluster_families(frag, cfg, self_cmp=True)
        dt = time.perf_counter() - t0
        fams = int(np.unique(lab).shape[0])
        print(json.dumps({"n_fragments": n, "wall_s": round(dt, 3),
                          "frags_per_s": round(n / dt, 1),
                          "families": fams,
                          "pile_copies": args.pile_copies}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
