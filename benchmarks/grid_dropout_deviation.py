"""Quantify the e2e grid's dropout-stream deviation (VERDICT round-2 #5).

The vmapped grid canonically slot-sorts ensemble members by shape class,
which renames their flax module paths (conf 2 may run as transformer_0);
flax folds dropout rngs by module path, so each member's dropout DRAWS
differ from the sequential/reference ordering (`sweep/e2e_grid.py` module
docstring).  Grid == sequential exactness is proven with dropout OFF
(tests/test_e2e_grid.py); every real config trains with dropout 0.1
(`/root/reference/tools.py:93-94`).  This script measures whether the
stream-level deviation shifts metric DISTRIBUTIONS:

  * takes N combinations whose grid markers already exist (the real
    dropout-ON sweep, e.g. /root/outputs/full_e2e),
  * retrains each sequentially (exact shapes, reference module ordering,
    same seed/members/data),
  * reports per-metric per-cell deltas and the rank agreement (Spearman
    over median AUROC) between the two modes.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/grid_dropout_deviation.py --n_combos 10

Run on a quiet chip; ~70 s per combination (sequential is the slow mode —
that is why the grid is the default).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from vit3d_ensemble_tpu.cli._common import setup_jax_cache
from vit3d_ensemble_tpu.data import build_train_val
from vit3d_ensemble_tpu.sweep.engine import METRIC_KEYS


def default_deviation_combos(n: int, max_configs: int = 19,
                             k: int = 3) -> list:
    """The n combos the benchmark compares by default: spread evenly over
    the FULL sorted combination list (marker-filename order), independent
    of how many markers exist yet — so `tools/precompile_endgame.py` can
    warm exactly these sequential training programs while the sweep is
    still running."""
    from itertools import combinations as it_combinations

    names = sorted("_".join(str(c) for c in comb) for comb in
                   it_combinations(range(1, max_configs), k))
    return [names[i] for i in
            np.linspace(0, len(names) - 1, n).astype(int)]


def load_markers(output_dir: str):
    """{combo_name: {fold: {metric: value}}} for every e2e marker (both
    schemas), in marker-name order."""
    out = {}
    for path in sorted(glob.glob(
            os.path.join(output_dir, "sweep_state", "e2e_*.json"))):
        try:
            with open(path) as f:
                blob = json.load(f)
        except ValueError:
            continue        # markers are written atomically; skip junk
        val = blob.get("val", blob) if isinstance(blob, dict) else None
        if not val or "CV 1" not in val:
            continue
        name = os.path.basename(path)[len("e2e_"):].split("_5cv")[0]
        out[name] = val
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default="/root/outputs/full_e2e")
    ap.add_argument("--csv_path",
                    default="/root/reference/csv_files/cross_validation")
    ap.add_argument("--data_root", default="/root/reference/dataset")
    ap.add_argument("--n_combos", type=int, default=10)
    ap.add_argument("--combos", default="",
                    help="comma list of combo names (e.g. 1_2_3,5_9_11) "
                         "to compare instead of the spread sample — for "
                         "reproducing a reported run exactly")
    ap.add_argument("--num_cv", type=int, default=5)
    ap.add_argument("--num_epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out_json",
                    default="/root/outputs/grid_dropout_deviation.json")
    args = ap.parse_args()
    setup_jax_cache()

    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.checkpoint import (
        baseline_ckpt_path,
        load_baseline_params,
    )
    from vit3d_ensemble_tpu.train.ensemble_trainer import train_ensemble

    markers = load_markers(args.output_dir)
    if not markers:
        raise SystemExit(f"no e2e markers under {args.output_dir}")
    if args.combos:
        take = args.combos.split(",")
        missing = [n for n in take if n not in markers]
        if missing:
            raise SystemExit(f"no grid marker for: {missing}")
    else:
        # deterministic spread over the FULL sorted combination list
        # (diverse signatures; precompile_endgame warms exactly these);
        # with an incomplete sweep, fall back to the available markers
        take = [n for n in default_deviation_combos(args.n_combos)
                if n in markers]
        if len(take) < args.n_combos:
            names = list(markers)
            take = [names[i] for i in
                    np.linspace(0, len(names) - 1,
                                min(args.n_combos, len(names))).astype(int)]
    print(f"{len(markers)} grid markers; comparing {len(take)}: {take}")

    folds = [build_train_val(
        os.path.join(args.csv_path, f"training_cv{cv + 1}.csv"),
        os.path.join(args.csv_path, f"validation_cv{cv + 1}.csv"),
        args.data_root, aug_mode="none") for cv in range(args.num_cv)]

    def member(conf: int):
        cfg = ViTConfig.from_conf(conf)
        path = baseline_ckpt_path(args.output_dir, "baseline", conf,
                                  f"conf{conf}")
        return cfg, load_baseline_params(path, cfg)

    # ~70 s/combination: flush a partial file after EVERY combo and
    # resume from it, so a timeout/outage mid-run costs one combo, not
    # the whole ~hour (advisor round-3 medium finding).
    partial_path = args.out_json + ".partial"
    run_tag = dict(num_epochs=args.num_epochs, seed=args.seed,
                   num_cv=args.num_cv)
    seq = {}
    if os.path.exists(partial_path):
        try:
            with open(partial_path) as f:
                prev = json.load(f)
            if prev.get("run_tag") == run_tag:
                seq = {n: r for n, r in prev.get("sequential", {}).items()
                       if n in take}
                if seq:
                    print(f"resuming: {len(seq)} combo(s) already "
                          f"measured in {partial_path}")
        except ValueError:
            pass
    for name in take:
        if name in seq:
            continue
        confs = [int(c) for c in name.split("_")]
        loaded = [member(c) for c in confs]
        seq[name] = {}
        for cv, (t, v, _) in enumerate(folds):
            res = train_ensemble([c for c, _ in loaded],
                                 [p for _, p in loaded], t, v,
                                 num_epochs=args.num_epochs,
                                 seed=args.seed, keep_best_params=False)
            seq[name][f"CV {cv + 1}"] = dict(res.metrics)
            print(f"  {name} cv{cv + 1} AUROC "
                  f"{res.metrics['AUROC']:.4f} (grid "
                  f"{markers[name][f'CV {cv + 1}']['AUROC']:.4f})",
                  flush=True)
        os.makedirs(os.path.dirname(partial_path) or ".", exist_ok=True)
        tmp = partial_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dict(run_tag=run_tag, sequential=seq), f)
        os.replace(tmp, partial_path)

    # per-metric per-cell deltas
    deltas = {k: [] for k in METRIC_KEYS}
    for name in take:
        for fold in seq[name]:
            for k in METRIC_KEYS:
                deltas[k].append(seq[name][fold][k]
                                 - markers[name][fold][k])
    summary = {k: dict(mean=float(np.mean(v)),
                       mean_abs=float(np.mean(np.abs(v))),
                       max_abs=float(np.max(np.abs(v))))
               for k, v in deltas.items()}

    med = lambda r, n: float(np.median(  # noqa: E731
        [r[n][f]["AUROC"] for f in r[n]]))
    grid_rank = [med(markers, n) for n in take]
    seq_rank = [med(seq, n) for n in take]
    from scipy.stats import spearmanr

    rho = float(spearmanr(grid_rank, seq_rank).statistic)

    out = dict(combos=take, summary=summary, spearman_median_auroc=rho,
               grid_median_auroc=grid_rank, seq_median_auroc=seq_rank,
               sequential=seq,
               grid={n: markers[n] for n in take})
    os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(dict(spearman=rho,
                          auroc_mean_abs=summary["AUROC"]["mean_abs"],
                          auroc_max_abs=summary["AUROC"]["max_abs"])))
    print(f"full results -> {args.out_json}")


if __name__ == "__main__":
    main()
