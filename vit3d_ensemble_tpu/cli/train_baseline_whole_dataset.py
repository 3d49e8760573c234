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
    return parser


def run_all_configs(args):
    """All 18 baselines on the fixed split as one vmapped batch (3 compiled
    programs; the sequential path would compile 18 distinct architectures).
    The fixed split is a 1-fold sweep with unweighted loss
    (`train_baseline_whole_dataset.py:186`)."""
    import jax
    import numpy as np

    from vit3d_ensemble_tpu.data.pool import (
        PoolBuilder,
        PooledSplit,
        finalize_mean,
        manifest_labels,
        pooled_train_split,
    )
    from vit3d_ensemble_tpu.data.volumes import load_manifest
    from vit3d_ensemble_tpu.sweep.engine import (
        SweepHyper,
        run_group,
        stack_folds,
    )
    from vit3d_ensemble_tpu.sweep.stack import (
        group_configs,
        unpad_group_params,
    )
    from vit3d_ensemble_tpu.checkpoint import save_pytree

    builder = PoolBuilder(args.data_root, args.img_size)
    tdf = load_manifest(os.path.join(args.csv_path, "training.csv"))
    vdf = load_manifest(os.path.join(args.csv_path, "validation.csv"))
    train, mean_rows = pooled_train_split(
        builder, tdf, "disk" if args.aug_mode == "disk" else "none")
    val = PooledSplit(builder.manifest_rows(vdf), manifest_labels(vdf),
                      float("nan"))
    pool = builder.build()
    mean = finalize_mean(pool, mean_rows)
    import dataclasses

    folds = [(dataclasses.replace(train, mean=mean),
              dataclasses.replace(val, mean=mean))]

    hyper = SweepHyper(
        num_steps=args.num_steps, eval_every=args.eval_every,
        train_batch_size=args.train_batch_size,
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, decay_type=args.decay_type,
        balanced_weights=False, seed=args.seed)
    data = stack_folds(pool, folds, hyper)

    all_results = {}
    for group in group_configs(range(1, 19)):
        logger.info("training group (D=%d, k=%d): confs %s",
                    group.hidden_size, group.num_heads, group.confs)
        res = run_group(group, data, hyper, args.img_size)
        members = unpad_group_params(res.best_params, group, args.img_size)
        for g, conf in enumerate(group.confs):
            ckpt = baseline_ckpt_path(args.output_dir, "baseline", conf,
                                      f"conf{conf}")
            save_pytree(ckpt, jax.tree.map(lambda x: x[0], members[g]))
            all_results[conf] = res.metrics_dict(g, 0)
            logger.info("conf %d best AUROC: %.4f", conf,
                        all_results[conf]["AUROC"])
    return all_results


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


if __name__ == "__main__":
    main()
