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

import jax
import numpy as np

from vit3d_ensemble_tpu.checkpoint import baseline_ckpt_path, save_pytree
from vit3d_ensemble_tpu.cli._common import (
    apply_runtime_flags,
    add_baseline_flags,
    add_common_flags,
    setup_logging,
)
from vit3d_ensemble_tpu.data.pool import build_pooled_bootstrap
from vit3d_ensemble_tpu.reporting import write_sweep_report
from vit3d_ensemble_tpu.sweep.engine import (
    SweepHyper,
    run_group,
    stack_folds,
)
from vit3d_ensemble_tpu.sweep.stack import group_configs

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

    hyper = SweepHyper(
        num_steps=args.num_steps, eval_every=args.eval_every,
        train_batch_size=args.train_batch_size,
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, decay_type=args.decay_type,
        seed=args.seed)

    pool, reps = build_pooled_bootstrap(
        os.path.join(args.csv_path, "training.csv"),
        os.path.join(args.csv_path, "validation.csv"),
        args.data_root, args.num_rep, size=args.img_size,
        aug_mode=("disk" if args.aug_mode == "disk" else "none"))
    data = stack_folds(pool, reps, hyper)
    logger.info("pool: %d unique volumes for %d replicates", len(pool),
                args.num_rep)

    confs = list(range(1, 19)) if args.all_configs else [args.config]
    results: Dict = {}
    for group in group_configs(confs):
        logger.info("training group (D=%d, k=%d): confs %s",
                    group.hidden_size, group.num_heads, group.confs)
        res = run_group(group, data, hyper, args.img_size)
        from vit3d_ensemble_tpu.sweep.stack import unpad_group_params

        members = unpad_group_params(res.best_params, group, args.img_size)
        for g, conf in enumerate(group.confs):
            results[f"conf{conf}"] = {}
            for r in range(args.num_rep):
                results[f"conf{conf}"][f"boot{r}"] = res.metrics_dict(g, r)
                ckpt = baseline_ckpt_path(args.output_dir, "boot_baseline",
                                          conf, f"boot{r}")
                save_pytree(ckpt, jax.tree.map(lambda x: x[r], members[g]))
            med = float(np.median(res.best_metrics[g, :, 3]))
            logger.info("conf %d median AUROC over %d replicates: %.4f",
                        conf, args.num_rep, med)

    report = os.path.join(args.output_dir, "Baseline_Bootstrap")
    write_sweep_report(report, results)
    logger.info("report written to %s.xlsx / .csv", report)
    return results


if __name__ == "__main__":
    main()
