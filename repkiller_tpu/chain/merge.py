"""On-device fragment dedup/merge + acceptance + canonical ordering
(SURVEY.md §2.2 "Fragment dedup/merge" — `combineFrags` equivalent).

Matches oracle.pipeline.merge_fragments / accept_fragments / to_original_y /
canonical_sort bit-identically. The host oracle's sequential "running max
xEnd" run walk is replaced by the parallel identity proven in the oracle's
docstring: within a (strand, diagonal) group sorted by xStart, a fragment
starts a new overlap run iff its xStart exceeds the EXCLUSIVE segmented
running max of xEnd (earlier runs always end before later runs start, so
the group-wide prefix max equals the current run's max). Everything is
expressed as `lax.sort` passes with total-order keys plus segmented
`associative_scan`s — no data-dependent control flow (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..utils.scan import segmented_cummax, prefix_in_segment

NEG_INF = jnp.int32(-(1 << 30))

# total-order field list used for every fragment sort (determinism:
# SURVEY.md §7 "Hard parts" #1 — never rely on sort stability)
_FIELDS = ("strand", "xStart", "yStart", "xEnd", "yEnd", "length", "score", "idents")


def _sort_frags(frag: Dict[str, jnp.ndarray], lead_keys) -> Tuple:
    """Sort fragment columns by lead_keys + every field (a total order)."""
    ops = tuple(lead_keys) + tuple(frag[f] for f in _FIELDS)
    out = jax.lax.sort(ops, num_keys=len(ops))
    lead = out[: len(lead_keys)]
    cols = dict(zip(_FIELDS, out[len(lead_keys):]))
    return lead, cols


def merge_accept(
    frag: Dict[str, jnp.ndarray], valid: jnp.ndarray,
    min_len: int, min_identity: float, y_len: int,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Merge overlapping same-diagonal fragments (best survives), apply
    length/identity acceptance, map reverse-strand y to original coords,
    canonical-sort, compact. Returns (frag, valid, n_frags)."""
    n = frag["xStart"].shape[0]
    inv = (~valid).astype(jnp.int32)
    diag = frag["xStart"] - frag["yStart"]

    # pass 1: (strand, diag, xStart, yStart) order -> overlap runs
    (inv_s, diag_s), f = _sort_frags(frag, (inv, diag))
    valid_s = inv_s == 0
    first = jnp.zeros(n, bool).at[0].set(True)
    group = first | (diag_s != jnp.roll(diag_s, 1)) \
        | (f["strand"] != jnp.roll(f["strand"], 1)) | (valid_s != jnp.roll(valid_s, 1))
    run_end_incl = segmented_cummax(f["xEnd"], group)
    run_end_excl = prefix_in_segment(run_end_incl, group, NEG_INF)
    run_start = group | (f["xStart"] > run_end_excl)
    run_id = jnp.cumsum(run_start.astype(jnp.int32))

    # pass 2: winner per run maximises (score, length, -xStart, -yStart)
    (inv2, rid2, _, _), f2 = _sort_frags(
        f, (inv_s.astype(jnp.int32), run_id, -f["score"], -f["length"])
    )
    win = (inv2 == 0) & (rid2 != jnp.roll(rid2, 1)).at[0].set(True)

    # acceptance thresholds (integer identity test, oracle.accept_fragments)
    pct = int(round(min_identity * 100))
    win = win & (f2["length"] >= min_len) \
        & (f2["idents"] * 100 >= jnp.int32(pct) * f2["length"])

    # reverse-strand y back to original coordinates (oracle.to_original_y)
    r = f2["strand"] == 1
    f2 = dict(f2)
    f2["yStart"] = jnp.where(r, jnp.int32(y_len) - 1 - f2["yStart"], f2["yStart"])
    f2["yEnd"] = jnp.where(r, jnp.int32(y_len) - 1 - f2["yEnd"], f2["yEnd"])

    # canonical order + compaction (oracle.canonical_sort)
    f2 = {k: jnp.where(win, v, 0) for k, v in f2.items()}
    (inv3,), f3 = _sort_frags(f2, ((~win).astype(jnp.int32),))
    n_frags = jnp.sum(win.astype(jnp.int32))
    valid_out = jnp.arange(n, dtype=jnp.int32) < n_frags
    return f3, valid_out, n_frags
