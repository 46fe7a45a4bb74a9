"""Per-stage instrumentation (SURVEY.md §5 "Metrics/logging": structured
JSONL with stage, wall time, bp processed, hits, frags, families).

`profile_stages` runs the single-device pipeline stage by stage — each
stage its own jitted call with a device sync between — so the wall times
are attributable. Stage boundaries match SURVEY.md §3.3; the end-to-end
fused number (what bench.py reports) is faster than the sum because XLA
fuses across stages in the one-program path.
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..index.build import build_index_jit
from ..seeds.join import join_hits
from ..seeds.filter import filter_hits
from ..extend import extend_dispatch
from ..chain.merge import merge_accept
from ..oracle import pipeline as orc


def _sync(x):
    jax.block_until_ready(x)
    return x


def profile_stages(codesX: np.ndarray, codesY: Optional[np.ndarray],
                   cfg: Config, emit=None) -> List[Dict]:
    """Run the pipeline with per-stage timing; returns JSONL-ready records.

    Forward strand only (timing-representative); emit is an optional
    callable for each record (e.g. print, or a file's write).
    """
    self_cmp = codesY is None
    records: List[Dict] = []

    def rec(stage, t0, **kw):
        r = {"stage": stage, "wall_s": round(time.perf_counter() - t0, 4), **kw}
        records.append(r)
        if emit:
            emit(json.dumps(r))
        return r

    t0 = time.perf_counter()
    cx = _sync(jnp.asarray(np.asarray(codesX, np.uint8)))
    cy = cx if self_cmp else _sync(jnp.asarray(np.asarray(codesY, np.uint8)))
    rec("h2d", t0, bp=int(cx.shape[0]) + (0 if self_cmp else int(cy.shape[0])))

    t0 = time.perf_counter()
    idxX = _sync(build_index_jit(cx, cfg.k))
    idxY = idxX if self_cmp else _sync(build_index_jit(cy, cfg.k))
    rec("index_build", t0, kmers=int(idxX[2]) + (0 if self_cmp else int(idxY[2])))

    join = jax.jit(lambda a, b: join_hits(
        a[0], a[1], a[2], b[0], b[1], b[2], k=cfg.k, max_occ=cfg.max_occ,
        capacity=cfg.hit_capacity, self_mode="f" if self_cmp else None,
        y_len=int(cy.shape[0])))
    t0 = time.perf_counter()
    hpx, hpy, hvalid, total = _sync(join(idxX, idxY))
    rec("seed_join", t0, hits=int(total))

    filt = jax.jit(lambda a, b, v: filter_hits(
        a, b, v, cfg.min_hit_dist, out_capacity=cfg.seed_cap))
    t0 = time.perf_counter()
    spx, spy, svalid, n_seeds = _sync(filt(hpx, hpy, hvalid))
    rec("hit_filter", t0, seeds=int(n_seeds))

    ext = jax.jit(lambda a, b, v, x, y: extend_dispatch(a, b, v, x, y, cfg))
    t0 = time.perf_counter()
    frag = _sync(ext(spx, spy, svalid, cx, cy))
    rec("extension", t0, seeds=int(n_seeds),
        cells=int(n_seeds) * 2 * cfg.max_extend * (2 * cfg.band + 1)
        if cfg.extend_mode == "banded" else None)

    mrg = jax.jit(lambda f, v: merge_accept(f, v, cfg.min_len,
                                            cfg.min_identity,
                                            y_len=int(cy.shape[0])))
    t0 = time.perf_counter()
    out, vout, n_frags = _sync(mrg(frag, svalid))
    rec("merge_accept", t0, fragments=int(n_frags))

    t0 = time.perf_counter()
    host = {k: np.asarray(v[: int(n_frags)]) for k, v in out.items()}
    group = orc.cluster_families(host, cfg, self_cmp)
    rec("families_host", t0, families=int(np.unique(group).shape[0])
        if group.size else 0)
    return records
