"""Vectorized repeat-family clustering (repkiller proper — SURVEY.md §2.1
"Grouping heuristics", §7 M3).

Semantics are DEFINED by oracle.pipeline.cluster_families (sweep + union-
find); this is the production implementation: numpy-vectorized edge
construction (sorted intervals + searchsorted neighbor ranges, the
capacity-free two-pass expansion) and min-label propagation with pointer
jumping — O(E) memory, O((E+n) log n) work, no Python per-fragment loop.
Matches the oracle bit-identically (tests/unit/test_families.py): the
oracle's union-by-smaller-index makes every union-find root the minimum
member index, which is exactly the fixpoint of min-label propagation.

Edge rule (same as oracle): intervals sorted by (space, start, end,
frag_idx); i links to every later j in the same space with
start_j <= end_i + proximity, provided the two fragments' lengths are
ratio-compatible: min(la,lb)*100 >= round(len_ratio*100)*max(la,lb).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import Config
from ..oracle import pipeline as orc


def cluster_families(frag: Dict[str, np.ndarray], cfg: Config,
                     self_cmp: bool) -> np.ndarray:
    """Family id per fragment = smallest member index (canonical order).

    Fragments MUST already be canonical_sort'ed (same contract as the
    oracle implementation this replaces on the hot path).
    """
    n = frag["xStart"].shape[0]
    if n == 0:
        return np.zeros(0, np.int32)
    space, start, end, fidx = orc._intervals_of(frag, self_cmp)
    order = np.lexsort((fidx, end, start, space))
    space, start, end, fidx = (space[order], start[order], end[order],
                               fidx[order])
    m = space.shape[0]
    lens = frag["length"].astype(np.int64)

    # neighbor ranges: i links to j in (i, hi_i): same space and
    # start_j <= end_i + proximity. `start` is only sorted WITHIN a
    # space, so bisect on the composite (space, start) key.
    big = np.int64(max(int(end.max()) + cfg.proximity, int(start.max())) + 2)
    key = space.astype(np.int64) * big + start
    q = space.astype(np.int64) * big + np.minimum(
        end + np.int64(cfg.proximity), big - 1)
    reach = np.searchsorted(key, q, side="right")
    lo = np.arange(m, dtype=np.int64) + 1
    counts = np.maximum(reach - lo, 0)

    csum = np.cumsum(counts)
    total = int(csum[-1]) if m else 0
    if total:
        offs = csum - counts
        t = np.arange(total, dtype=np.int64)
        src = np.searchsorted(csum, t, side="right")
        ea_i = src                                  # sorted-interval index i
        eb_i = lo[src] + (t - offs[src])            # sorted-interval index j
        ea, eb = fidx[ea_i], fidx[eb_i]
        keep = ea != eb
        la, lb = lens[ea], lens[eb]
        pct = np.int64(round(cfg.len_ratio * 100))
        keep &= np.minimum(la, lb) * 100 >= pct * np.maximum(la, lb)
        ea, eb = ea[keep], eb[keep]
    else:
        ea = eb = np.zeros(0, np.int64)

    # min-label propagation with pointer jumping to the fixpoint
    lab = np.arange(n, dtype=np.int64)
    while True:
        m2 = np.minimum(lab[ea], lab[eb])
        new = lab.copy()
        np.minimum.at(new, ea, m2)
        np.minimum.at(new, eb, m2)
        new = np.minimum(new, new[new])             # pointer jumping
        if np.array_equal(new, lab):
            break
        lab = new
    return lab.astype(np.int32)
