#!/usr/bin/env python
"""BASELINE config #1: E. coli K-12 self-comparison, k=12 seeds, banded
extend, single chip (CPU-runnable). ~4.6 Mbp, IS-element-like repeat
families."""

from common import jax_setup, std_args, run_timed


def main():
    ap = std_args(__doc__, default_size=4_600_000)
    args = ap.parse_args()
    jax_setup(args.platform)
    from repkiller_tpu.config import Config
    from repkiller_tpu.utils import synth
    from repkiller_tpu import device

    size = int(args.size * args.scale)
    cfg = Config(k=12, strands="fr", extend_mode="banded",
                 hit_capacity=1 << 20, max_extend=2048)
    fams = [(1024, 6, 0.02, 2), (768, 5, 0.05, 1), (512, 7, 0.0, 0),
            (1536, 3, 0.03, 1), (256, 8, 0.08, 2)]
    g = synth.plant(size, fams, seed=1234)
    run_timed("ecoli_self_k12_banded",
              lambda: device.compare(g.codes, None, cfg), args.runs, size)


if __name__ == "__main__":
    main()
