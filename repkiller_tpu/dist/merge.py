"""Cross-host result assembly (SURVEY.md §3.4 final step: "host 0 writes
outputs (multihost_utils.process_allgather)").

In the sharded pipeline every fragment-table column comes out of the jit
replicated across the mesh, so single-host runs need nothing here. With
multiple processes (one per host), each host holds the full replicated
table too — XLA's collectives already merged it over ICI/DCN — but only
process 0 should touch the filesystem. These helpers make that explicit
and give a fallback gather for arrays that are NOT replicated (e.g.
per-host window blocks in a future physically-sharded index build).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def is_output_host() -> bool:
    """True on the process that writes files (process 0)."""
    return jax.process_index() == 0


def gather_fragments(frag: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Gather per-process fragment blocks to every host.

    No-op single-process. Multi-process: concatenates each column across
    processes (jax.experimental.multihost_utils.process_allgather), then
    re-sorts into the canonical total order so the result is identical on
    every host regardless of process count — the §4.5 determinism rule.
    """
    if jax.process_count() == 1:
        return frag
    from jax.experimental import multihost_utils
    from ..oracle import pipeline as orc

    gathered = {
        k: np.concatenate(
            list(multihost_utils.process_allgather(v, tiled=False)))
        for k, v in frag.items()
    }
    return orc.canonical_sort(gathered)


def write_on_host0(write_fn, *args, **kw):
    """Run a writer callable only on process 0; barrier afterwards so no
    process races ahead of the files being complete."""
    if is_output_host():
        write_fn(*args, **kw)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("repkiller_tpu_write_barrier")
