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
    pool, reps = build_pooled_bootstrap(
        os.path.join(args.csv_path, "training.csv"),
        os.path.join(args.csv_path, "validation.csv"),
        args.data_root, args.num_rep, size=args.img_size,
        aug_mode=sweep_aug_mode(args))
    data = stack_folds(pool, reps, hyper)
    logger.info("pool: %d unique volumes for %d replicates", len(pool),
                args.num_rep)

    confs = list(range(1, 19)) if args.all_configs else [args.config]
    raw = run_grouped_baselines(
        args, data, hyper, ckpt_kind="boot_baseline",
        fold_label=lambda r: f"boot{r}",
        fold_tag=lambda conf, r: f"boot{r}",
        marker_prefix="boot", confs=confs)
    results = {f"conf{c}": per_rep for c, per_rep in raw.items()}

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
