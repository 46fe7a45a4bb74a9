"""Seed extension kernels (SURVEY.md §1 L3): ungapped x-drop (chunked
lax.while_loop), banded affine-gap Gotoh (XLA wavefront and Pallas TPU
kernel — bit-identical, selected by Config.banded_impl)."""

from __future__ import annotations

import jax

from ..config import Config


def extend_dispatch(spx, spy, svalid, cx, cy, cfg: Config):
    """Extend seeds -> fragment dict; picks the configured kernel."""
    if cfg.extend_mode == "ungapped":
        from .ungapped import extend_ungapped
        return extend_ungapped(
            spx, spy, svalid, cx, cy,
            k=cfg.k, match=cfg.match, mismatch=cfg.mismatch,
            x_drop=cfg.x_drop, max_extend=cfg.max_extend,
        )
    impl = cfg.banded_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    kw = dict(k=cfg.k, match=cfg.match, mismatch=cfg.mismatch,
              x_drop=cfg.x_drop, max_extend=cfg.max_extend,
              band=cfg.band, gap_open=cfg.gap_open, gap_extend=cfg.gap_extend)
    if impl == "pallas":
        from .banded_pallas import extend_banded_pallas
        return extend_banded_pallas(spx, spy, svalid, cx, cy, **kw)
    from .banded_xla import extend_banded
    return extend_banded(spx, spy, svalid, cx, cy, **kw)
