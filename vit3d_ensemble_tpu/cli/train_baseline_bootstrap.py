"""Bootstrap baseline trainer — mirrors `train_baseline_bootstrap.py`.

Reference flow: for boot in range(num_rep=100): resample training.csv with
seed=boot (`train_baseline_bootstrap.py:163,274` + `tools.py:137-147`),
train with the CV hyperparameters, validate on the fixed validation split,
checkpoint per replicate.

TPU-native: the replicate axis IS a batch axis — the same vmapped engine
that trains CV folds trains all `num_rep` replicates simultaneously from
one shared volume pool (`data/pool.py`); `--all_configs` adds the
18-config axis on top (18 x 100 = 1800 models in 3 compiled programs).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Dict

from vit3d_ensemble_tpu.cli._common import (
    apply_runtime_flags,
    add_baseline_flags,
    add_common_flags,
    setup_logging,
)
from vit3d_ensemble_tpu.data.pool import build_pooled_bootstrap
from vit3d_ensemble_tpu.reporting import write_sweep_report

logger = logging.getLogger("train_baseline_bootstrap")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    add_common_flags(parser, csv_subdir="fixed_split")
    add_baseline_flags(parser, eval_every=24, num_steps=100)
    parser.add_argument("--num_rep", type=int, default=100,
                        help="Number of bootstrap replicates.")
    parser.add_argument("--boot_chunk", type=int, default=25,
                        help="Replicates per vmapped program.  At the "
                             "reference's num_rep=100, one program per "
                             "shape class would hold 600 models x "
                             "(params + momentum + best) and exceed HBM "
                             "— the observed failure mode is a worker "
                             "KILL, not a catchable OOM — so replicates "
                             "train in chunks; every chunk shares the "
                             "same 3 compiled programs (identical "
                             "shapes).")
    return parser


def main(argv=None) -> Dict:
    setup_logging()
    args = build_parser().parse_args(argv)
    apply_runtime_flags(args)

    from vit3d_ensemble_tpu.sweep.engine import (
        run_grouped_baselines,
        stack_folds,
        sweep_aug_mode,
        sweep_hyper_from_args,
    )

    hyper = sweep_hyper_from_args(args)
    confs = list(range(1, 19)) if args.all_configs else [args.config]
    chunk = args.boot_chunk if args.boot_chunk > 0 else args.num_rep

    results: Dict[str, Dict] = {}
    for s in range(0, args.num_rep, chunk):
        w = min(chunk, args.num_rep - s)
        # replicate k resamples with seed k globally (seed0=s keeps the
        # chunked run seed-identical to one unchunked num_rep pass)
        pool, reps = build_pooled_bootstrap(
            os.path.join(args.csv_path, "training.csv"),
            os.path.join(args.csv_path, "validation.csv"),
            args.data_root, w, size=args.img_size,
            aug_mode=sweep_aug_mode(args), seed0=s)
        data = stack_folds(pool, reps, hyper)
        logger.info("pool: %d unique volumes for replicates %d..%d",
                    len(pool), s, s + w - 1)
        raw = run_grouped_baselines(
            args, data, hyper, ckpt_kind="boot_baseline",
            fold_label=lambda r, s=s: f"boot{s + r}",
            fold_tag=lambda conf, r, s=s: f"boot{s + r}",
            marker_prefix=f"boot_s{s}", confs=confs,
            # global replicate ids: per-cell dropout keys come from the
            # full (config, num_rep) grid, so metrics are invariant to
            # --boot_chunk (verified chunk-1 == chunk-3 == one-shot)
            fold_ids=range(s, s + w), n_folds_total=args.num_rep)
        for c, per_rep in raw.items():
            results.setdefault(f"conf{c}", {}).update(per_rep)

    report = os.path.join(args.output_dir, "Baseline_Bootstrap")
    write_sweep_report(report, results)
    logger.info("report written to %s.xlsx / .csv", report)
    return results


def cli() -> int:
    """Console-script entry: mains return result dicts for programmatic
    use; setuptools wraps the entry point in sys.exit(), so return 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
