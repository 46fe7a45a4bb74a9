#!/usr/bin/env python
"""BASELINE config #2: S. cerevisiae genome self-comparison with repeat-
family clustering, k=16. ~12.1 Mbp, Ty-retrotransposon-like families +
tandem arrays."""

import json

from common import jax_setup, std_args, run_timed


def main():
    ap = std_args(__doc__, default_size=12_100_000)
    args = ap.parse_args()
    jax_setup(args.platform)
    import numpy as np
    from repkiller_tpu.config import Config
    from repkiller_tpu.utils import synth
    from repkiller_tpu import device
    from repkiller_tpu.oracle import pipeline as orc

    size = int(args.size * args.scale)
    cfg = Config(k=16, strands="fr", extend_mode="banded",
                 hit_capacity=1 << 20, seed_capacity=1 << 19,
                 max_extend=2048)
    fams = [(5900, 4, 0.03, 1),          # Ty1-like LTR element
            (332, 12, 0.05, 3),          # LTR solo copies
            (137, 20, 0.08, 0),          # tRNA-adjacent repeats
            (1024, 6, 0.01, 2)]
    g = synth.plant(size, fams, seed=4242)
    out, _ = run_timed("yeast_self_k16_families",
                       lambda c: device.compare(g.codes, None, c),
                       args.runs, size, cfg=cfg)
    fams_found = np.unique(out["group"]).shape[0] if out["group"].size else 0
    stats = orc.family_stats(out, out["group"])
    print(json.dumps({"config": "yeast_self_k16_families",
                      "families": int(fams_found),
                      "max_family_size": int(stats["n_frags"].max())
                      if stats["n_frags"].size else 0}))


if __name__ == "__main__":
    main()
