"""Test/statistics driver — mirrors `test_cv.py` (reference).

    python -m vit3d_ensemble_tpu.cli.test_cv --baseline --ensemble \
        --conf 5 --ensemble_conf_list 5,9,11 ...

Per CV fold: load the fold's trained checkpoint, evaluate on the held-out
test split (normalized with that fold's training mean, `test_cv.py:46-52`),
compute the 11 metrics, aggregate median/mean/percentile CIs, then run the
cross-model statistics (Shapiro-Wilk, Mood's median test, Mann-Whitney U)
and save plots (`test_cv.py:82-103,193-243`).

Reference defects fixed (documented, SURVEY.md D8): the reference uses an
undefined `testset`, returns from inside its combination loop (only the
first ensemble is ever evaluated), and logs statistics even when only one
of --baseline/--ensemble is given.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
from typing import Dict

import numpy as np

from vit3d_ensemble_tpu.checkpoint import (
    baseline_ckpt_path,
    ensemble_ckpt_path,
    load_baseline_params,
    restore_pytree,
)
from vit3d_ensemble_tpu.cli._common import (
    apply_runtime_flags,
    add_common_flags,
    parse_conf_list,
    setup_logging,
)
from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import load_split
from vit3d_ensemble_tpu.metrics.host import eleven_metrics
from vit3d_ensemble_tpu.metrics.stats import aggregate_folds, compute_statistics

logger = logging.getLogger("test_cv")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    add_common_flags(parser, csv_subdir="cross_validation")
    parser.add_argument("--cv", type=int, default=5,
                        help="Number of folds in cross validation.")
    parser.add_argument("--conf", type=int, default=5,
                        help="Baseline configuration to test.")
    parser.add_argument("--ensemble_conf_list", default="5,9,11",
                        help="Ensemble combination to test.")
    parser.add_argument("--baseline", action="store_true",
                        help="Test the baseline model.")
    parser.add_argument("--ensemble", action="store_true",
                        help="Test the ensemble model.")
    parser.add_argument("--test_batch_size", type=int, default=1,
                        help="(kept for CLI parity; eval is one forward)")
    parser.add_argument("--output_path", default=None,
                        help="Where to write plots (defaults to "
                             "--output_dir).")
    return parser


def _fold_test_split(args, cv: int):
    """Test split normalized by fold cv's training mean (`test_cv.py:46-52`)."""
    train = load_split(os.path.join(args.csv_path,
                                    f"training_cv{cv + 1}.csv"),
                       args.data_root, size=args.img_size)
    mean = float(np.mean(train.volumes, dtype=np.float64))
    test = load_split(os.path.join(args.csv_path, "test.csv"),
                      args.data_root, size=args.img_size)
    return dataclasses.replace(test,
                               volumes=test.volumes - np.float32(mean))


def _log_aggregate(tag: str, res: Dict[str, Dict[str, float]]):
    agg = aggregate_folds(res)
    logger.info("---%s results (median and 95%% CI)---", tag)
    for k, s in agg.items():
        logger.info("%s: %.3f [%.3f-%.3f]", k, s["median"], s["p2.5"],
                    s["p97.5"])
    return agg


def test_baseline(args) -> Dict[str, Dict[str, float]]:
    import jax
    import jax.numpy as jnp

    from vit3d_ensemble_tpu.models import VisionTransformer3D
    from vit3d_ensemble_tpu.train.steps import make_baseline_eval_step

    cfg = ViTConfig.from_conf(args.conf, img_size=args.img_size)
    model = VisionTransformer3D(cfg, zero_head=False, vis=False)
    eval_step = make_baseline_eval_step(model)

    res: Dict[str, Dict[str, float]] = {}
    for cv in range(args.cv):
        path = baseline_ckpt_path(args.output_dir, "cv_baseline", args.conf,
                                  f"cv{cv + 1}")
        params = load_baseline_params(path, cfg)
        test = _fold_test_split(args, cv)
        probs, _ = eval_step(params, jnp.asarray(test.volumes))
        probs = np.asarray(probs)
        preds = (probs > 0.5).astype(np.int32)
        res[f"CV {cv + 1}"] = eleven_metrics(test.labels, preds, probs)
    _log_aggregate("Base ViT", res)
    return res


def test_ensemble(args) -> Dict[str, Dict[str, float]]:
    import jax
    import jax.numpy as jnp

    from vit3d_ensemble_tpu.models import TransformerEnsemble
    from vit3d_ensemble_tpu.train.ensemble_trainer import init_ensemble
    from vit3d_ensemble_tpu.train.steps import make_ensemble_eval_step

    confs = parse_conf_list(args.ensemble_conf_list)
    name = "_".join(str(c) for c in confs)
    configs = [ViTConfig.from_conf(c, img_size=args.img_size)
               for c in confs]
    model = TransformerEnsemble(tuple(configs))
    eval_step = make_ensemble_eval_step(model)

    res: Dict[str, Dict[str, float]] = {}
    meta_path = ensemble_ckpt_path(args.output_dir, "cv_ensemble", name,
                                   "meta_heads")
    for cv in range(args.cv):
        test = _fold_test_split(args, cv)
        e2e_path = ensemble_ckpt_path(args.output_dir, "cv_ensemble", name,
                                      f"cv{cv + 1}")
        if os.path.exists(e2e_path):
            # end-to-end checkpoint: full ensemble params
            _, target = init_ensemble(configs, [], seed=0)
            params = restore_pytree(e2e_path, jax.device_get(target))
            probs = np.asarray(eval_step(params,
                                         jnp.asarray(test.volumes)))
        elif os.path.exists(meta_path):
            # frozen meta head: member logits + Linear(3,1)
            from vit3d_ensemble_tpu.sweep.ensemble_sweep import (
                compute_member_logits,
            )

            members = {}
            for c, cfg in zip(confs, configs):
                members[c] = load_baseline_params(
                    baseline_ckpt_path(args.output_dir, "baseline", c,
                                       f"conf{c}"), cfg)
            blob = restore_pytree(meta_path,
                                  {"combo": np.zeros(len(confs), np.int32),
                                   "meta_wb": np.zeros((args.cv, 4),
                                                       np.float32)})
            logits = compute_member_logits(members, test.volumes,
                                           args.img_size)
            stack = np.stack([logits[c] for c in confs])       # (3, T)
            wb = blob["meta_wb"][cv]
            probs = 1.0 / (1.0 + np.exp(-(stack.T @ wb[:3] + wb[3])))
        else:
            raise FileNotFoundError(
                f"no ensemble checkpoint for {name}: looked for {e2e_path} "
                f"and {meta_path}")
        preds = (probs > 0.5).astype(np.int32)
        res[f"CV {cv + 1}"] = eleven_metrics(test.labels, preds, probs)
    _log_aggregate("Ensemble ViT", res)
    return res


def main(argv=None):
    setup_logging()
    args = build_parser().parse_args(argv)
    apply_runtime_flags(args)
    out_path = args.output_path or args.output_dir
    res_base = test_baseline(args) if args.baseline else None
    res_ens = test_ensemble(args) if args.ensemble else None
    stats = None
    if res_base and res_ens:
        stats = compute_statistics(res_base, res_ens, out_path)
        for k, v in stats.items():
            logger.info("%s: %s", k, v)
    return res_base, res_ens, stats


def cli() -> int:
    """Console-script entry: mains return result dicts for programmatic
    use; setuptools wraps the entry point in sys.exit(), so return 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
