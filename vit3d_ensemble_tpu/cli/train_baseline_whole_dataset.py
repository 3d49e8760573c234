"""Fixed-split baseline trainer — mirrors `train_baseline_whole_dataset.py`.

Reference specifics preserved: fixed_split CSVs, num_steps=1000,
eval_every=31, UNWEIGHTED BCE loss (`train_baseline_whole_dataset.py:186`),
checkpoints to `output/baseline_models/conf{c}/conf{c}` — the files the
ensemble drivers consume (`train_ensemble_cv.py:60,80-81`).

(The reference script itself is non-runnable: its loader returns None under
the inverted rank guard (defect D3) and it references undefined args
(defect D7); this driver implements the intended behavior.)
"""

from __future__ import annotations

import argparse
import logging
import os

from vit3d_ensemble_tpu.checkpoint import baseline_ckpt_path
from vit3d_ensemble_tpu.cli._common import (
    apply_runtime_flags,
    add_baseline_flags,
    add_common_flags,
    setup_logging,
)
from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import build_train_val
from vit3d_ensemble_tpu.train.trainer import train_baseline
from vit3d_ensemble_tpu.utils.metrics_log import default_logger

logger = logging.getLogger("train_baseline_whole_dataset")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    add_common_flags(parser, csv_subdir="fixed_split")
    add_baseline_flags(parser, eval_every=31, num_steps=1000)
    parser.add_argument("--max_grad_norm", type=float, default=1.0,
                        help="Accepted for reference CLI parity and "
                             "ignored, matching upstream: the reference "
                             "declares it (train_baseline_whole_dataset"
                             ".py:274) but never clips gradients.")
    return parser


def run_all_configs(args):
    """All 18 baselines on the fixed split as one vmapped batch (3 compiled
    programs; the sequential path would compile 18 distinct architectures).
    The fixed split is a 1-fold sweep with unweighted loss
    (`train_baseline_whole_dataset.py:186`)."""
    from vit3d_ensemble_tpu.data.pool import build_pooled_fixed
    from vit3d_ensemble_tpu.sweep.engine import (
        run_grouped_baselines,
        stack_folds,
        sweep_aug_mode,
        sweep_hyper_from_args,
    )

    hyper = sweep_hyper_from_args(args, balanced_weights=False)
    pool, folds = build_pooled_fixed(
        os.path.join(args.csv_path, "training.csv"),
        os.path.join(args.csv_path, "validation.csv"),
        args.data_root, size=args.img_size, aug_mode=sweep_aug_mode(args))
    data = stack_folds(pool, folds, hyper)
    results = run_grouped_baselines(
        args, data, hyper, ckpt_kind="baseline",
        fold_label=lambda f: "fixed",
        fold_tag=lambda conf, f: f"conf{conf}",
        marker_prefix="whole")
    return {conf: per_fold["fixed"] for conf, per_fold in results.items()}


def main(argv=None):
    setup_logging()
    args = build_parser().parse_args(argv)
    apply_runtime_flags(args)

    if args.all_configs:
        return run_all_configs(args)

    configs = [args.config]
    train_split, val_split, _ = build_train_val(
        os.path.join(args.csv_path, "training.csv"),
        os.path.join(args.csv_path, "validation.csv"),
        args.data_root, aug_mode=args.aug_mode, size=args.img_size,
    )
    all_results = {}
    for conf in configs:
        config = ViTConfig.from_conf(conf, img_size=args.img_size)
        save_path = baseline_ckpt_path(args.output_dir, "baseline", conf,
                                       f"conf{conf}")
        res = train_baseline(
            config, train_split, val_split,
            num_steps=args.num_steps, eval_every=args.eval_every,
            train_batch_size=args.train_batch_size,
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            warmup_steps=args.warmup_steps, decay_type=args.decay_type,
            seed=args.seed, save_path=save_path, keep_best_params=False,
            balanced_weights=False,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            metrics_logger=default_logger(args.output_dir),
        )
        logger.info("conf %d (%.3fM params) best metrics:", conf,
                    res.num_params_m)
        for k, v in res.metrics.items():
            logger.info("  %s: %s", k, v)
        all_results[conf] = res.metrics
    return all_results


def cli() -> int:
    """Console-script entry: mains return result dicts for programmatic
    use; setuptools wraps the entry point in sys.exit(), so return 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
