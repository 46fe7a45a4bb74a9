#!/usr/bin/env python
"""BASELINE config #4: D. melanogaster chr2L+2R repeat masking with the
hash-prefix-sharded k-mer index across 1 host (every visible device).
Two chromosome records in one SeqSet (N-spacer joined), transposon-scale
repeat families; output is the masked-interval BED + hard-masked FASTA
capability check."""

import json

from common import jax_setup, std_args, run_timed


def main():
    ap = std_args(__doc__, default_size=48_000_000)
    args = ap.parse_args()
    jax = jax_setup(args.platform)
    import numpy as np
    from repkiller_tpu.config import Config
    from repkiller_tpu.utils import synth
    from repkiller_tpu.io import fasta
    from repkiller_tpu.dist.sharded import compare_sharded
    from repkiller_tpu.oracle import pipeline as orc
    from repkiller_tpu.report import intervals as report_iv

    size = int(args.size * args.scale)
    half = size // 2
    fams = [(7000, 5, 0.05, 2),          # roo/jockey-like transposons
            (4100, 4, 0.08, 1),
            (359, 30, 0.06, 5),          # satellite-adjacent tandem
            (1024, 8, 0.02, 2)]
    g2l = synth.plant(half, fams, seed=21)
    g2r = synth.plant(size - half, fams, seed=22)
    codes = np.concatenate([g2l.codes, np.array([4], np.uint8), g2r.codes])
    # k=16: at 48 Mbp, k=14 alone yields ~n^2/4^14 = 8.6M random
    # background hits; k=16 keeps the expected background near 0.5M so
    # the per-device hit block fits 2^20 (true counts still checked)
    cfg = Config(k=16, strands="fr", extend_mode="banded",
                 hit_capacity=1 << 20, seed_capacity=1 << 19,
                 max_extend=2048)

    out, _ = run_timed("dmel_2l2r_masking_sharded",
                       lambda c: compare_sharded(codes, None, c),
                       args.runs, size, cfg=cfg)
    iv = orc.repeat_intervals(out, out["group"], cfg, self_cmp=True)
    masked = report_iv.mask_codes(codes, iv.get(0))
    masked_bp = int((masked == 4).sum() - (codes == 4).sum())
    print(json.dumps({"config": "dmel_2l2r_masking_sharded",
                      "repeat_intervals": int(iv.get(0, np.zeros((0, 2))).shape[0]),
                      "masked_bp": masked_bp,
                      "devices": jax.device_count()}))


if __name__ == "__main__":
    main()
