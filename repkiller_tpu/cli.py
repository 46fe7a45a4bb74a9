"""Command-line driver (SURVEY.md §1 L6, §5 "Config/flag system").

Subcommands:

  run    full pipeline: FASTA (self or pair) -> fragments CSV, family
         summary, repeat intervals BED, optional masked FASTA
  group  repkiller proper: fragments CSV in -> family-annotated CSV +
         summary + intervals (the reference tool's own entry point)

Flags map 1:1 onto Config fields; `--profile DIR` wraps the run in a
jax.profiler trace (SURVEY.md §5 tracing row).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
import time

import numpy as np

from .config import Config, DEFAULT
from . import api

log = logging.getLogger("repkiller_tpu")


def _add_config_flags(p: argparse.ArgumentParser) -> None:
    for f in dataclasses.fields(Config):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "str" or isinstance(f.default, str):
            p.add_argument(flag, type=str, default=f.default)
        elif isinstance(f.default, bool):
            p.add_argument(flag, type=int, default=int(f.default))
        elif isinstance(f.default, float):
            p.add_argument(flag, type=float, default=f.default)
        else:
            p.add_argument(flag, type=int, default=f.default)


def _config_from_args(args: argparse.Namespace) -> Config:
    kw = {}
    for f in dataclasses.fields(Config):
        kw[f.name] = getattr(args, f.name)
    return Config(**kw)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="repkiller-tpu",
        description="TPU-native repeat detection (capabilities of estebanpw/repkiller)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="full comparison pipeline")
    pr.add_argument("fasta_x", help="query FASTA (or '-' for stdin)")
    pr.add_argument("fasta_y", nargs="?", default=None,
                    help="optional second FASTA; omitted = self-comparison")
    pr.add_argument("-o", "--out-prefix", default="out",
                    help="output file prefix")
    pr.add_argument("--backend", choices=("device", "sharded", "oracle"),
                    default="device")
    pr.add_argument("--mask", action="store_true",
                    help="also write <prefix>.masked.fasta")
    pr.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace to DIR")
    pr.add_argument("--metrics-json", default=None,
                    help="append a JSONL metrics record here")
    pr.add_argument("--stage-timing", action="store_true",
                    help="also run the pipeline stage-by-stage and print "
                         "per-stage JSONL timings (forward strand)")
    _add_config_flags(pr)

    pg = sub.add_parser("group", help="cluster an existing fragments CSV")
    pg.add_argument("frags_csv")
    pg.add_argument("-o", "--out-prefix", default="grouped")
    pg.add_argument("--cross", action="store_true",
                    help="fragments come from a two-genome comparison")
    _add_config_flags(pg)
    return p


def cmd_run(args: argparse.Namespace) -> int:
    cfg = _config_from_args(args)
    src_x = sys.stdin.read() if args.fasta_x == "-" else args.fasta_x
    t0 = time.perf_counter()

    profile_ctx = None
    if args.profile:
        import jax
        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()
    try:
        res = api.compare(src_x, args.fasta_y, cfg, backend=args.backend)
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
    dt = time.perf_counter() - t0

    prefix = args.out_prefix
    res.write_csv(prefix + ".frags.csv")
    res.write_family_summary(prefix + ".families.csv")
    res.write_intervals(prefix + ".repeats.bed")
    if args.mask:
        with open(prefix + ".masked.fasta", "w") as f:
            f.write(res.masked_fasta())

    if args.stage_timing:
        from .utils.metrics import profile_stages
        profile_stages(res.x.codes,
                       None if res.self_cmp else res.y.codes, cfg,
                       emit=print)

    bp = res.x.total_length + (0 if res.self_cmp else res.y.total_length)
    metrics = {
        "stage": "run", "wall_s": round(dt, 4), "bp": bp,
        "bp_per_s": round(bp / dt, 1),
        "fragments": res.n_fragments, "families": res.n_families,
        "backend": args.backend,
    }
    log.info("run: %s", metrics)
    print(json.dumps(metrics))
    if args.metrics_json:
        with open(args.metrics_json, "a") as f:
            f.write(json.dumps(metrics) + "\n")
    return 0


def cmd_group(args: argparse.Namespace) -> int:
    cfg = _config_from_args(args)
    frag = api.group_fragments(args.frags_csv, cfg, self_cmp=not args.cross)
    from .report import csv_writer, intervals as report_iv

    prefix = args.out_prefix
    csv_writer.write_frags_csv(frag, prefix + ".frags.csv")
    report_iv.write_family_summary(frag, prefix + ".families.csv")
    report_iv.write_intervals_bed(frag, cfg, prefix + ".repeats.bed",
                                  self_cmp=not args.cross)
    n_fam = int(np.unique(frag["group"]).shape[0]) if frag["xStart"].shape[0] else 0
    print(json.dumps({"stage": "group", "fragments": int(frag["xStart"].shape[0]),
                      "families": n_fam}))
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(levelname)s %(name)s: %(message)s")
    args = build_parser().parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    if args.cmd == "group":
        return cmd_group(args)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
