"""Validate the frozen-backbone ensemble-sweep default against the
reference-faithful end-to-end mode (VERDICT round-1 #6).

The reference retrains FULL ensembles per combination
(`train_ensemble_cv.py:83` — backbones receive gradients); our default CLI
mode trains only meta-heads on cached member logits.  The scientific claim
riding on the fast sweep is that the two modes RANK combinations alike.
This experiment measures that: 20 combinations x num_cv folds on the real
dataset, both modes, Spearman rank correlation of per-combo median AUROCs.

The 20 combos are C(6,3) over the (D=32, heads=8) family {2,5,8,11,14,17} —
a full factor of the grid (both mlp widths x all three depths) while every
end-to-end program shares one backbone shape class.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/frozen_vs_e2e.py \
          [--output_dir /tmp/fve_out] [--num_cv 5] [--num_epochs 100]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os

import numpy as np

FAMILY = (2, 5, 8, 11, 14, 17)     # the (32, 8) shape class


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default="/tmp/fve_out")
    ap.add_argument("--csv_root", default="/root/reference/csv_files")
    ap.add_argument("--data_root", default="/root/reference/dataset")
    ap.add_argument("--num_cv", type=int, default=5)
    ap.add_argument("--num_epochs", type=int, default=100)
    ap.add_argument("--img_size", type=int, default=128)
    args = ap.parse_args()

    from vit3d_ensemble_tpu.checkpoint import (
        baseline_ckpt_path,
        load_baseline_params,
    )
    from vit3d_ensemble_tpu.cli import train_baseline_whole_dataset
    from vit3d_ensemble_tpu.cli._common import setup_jax_cache
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.data import build_train_val
    from vit3d_ensemble_tpu.sweep.ensemble_sweep import (
        MetaHyper,
        compute_member_logits,
        train_meta_sweep,
    )
    from vit3d_ensemble_tpu.train.ensemble_trainer import train_ensemble

    setup_jax_cache()
    os.makedirs(args.output_dir, exist_ok=True)

    # --- 1. member checkpoints (fixed-split baselines, reference defaults)
    missing = [c for c in FAMILY if not os.path.exists(
        baseline_ckpt_path(args.output_dir, "baseline", c, f"conf{c}"))]
    if missing:
        print(f"training baselines (whole dataset): all 18 configs")
        train_baseline_whole_dataset.main([
            "--all_configs",
            "--csv_path", os.path.join(args.csv_root, "fixed_split"),
            "--data_root", args.data_root,
            "--output_dir", args.output_dir,
        ])
    members = {}
    configs = {}
    for c in FAMILY:
        configs[c] = ViTConfig.from_conf(c, img_size=args.img_size)
        members[c] = load_baseline_params(
            baseline_ckpt_path(args.output_dir, "baseline", c, f"conf{c}"),
            configs[c])

    # --- 2. fold data (ensemble drivers use un-augmented splits) ----------
    folds = []
    for cv in range(args.num_cv):
        t, v, _ = build_train_val(
            os.path.join(args.csv_root, "cross_validation",
                         f"training_cv{cv + 1}.csv"),
            os.path.join(args.csv_root, "cross_validation",
                         f"validation_cv{cv + 1}.csv"),
            args.data_root, aug_mode="none", size=args.img_size)
        folds.append((t, v))

    combos = np.array(list(itertools.combinations(FAMILY, 3)), np.int32)

    # --- 3. frozen mode: cached member logits + vmapped meta sweep --------
    F = args.num_cv
    n_max = max(len(t) for t, _ in folds)
    v_max = max(len(v) for _, v in folds)
    M = len(FAMILY)
    TL = np.zeros((F, M, n_max), np.float32)
    TY = np.zeros((F, n_max), np.float32)
    TM = np.zeros((F, n_max), np.float32)
    VL = np.zeros((F, M, v_max), np.float32)
    VY = np.zeros((F, v_max), np.float32)
    VM = np.zeros((F, v_max), np.float32)
    for f, (t, v) in enumerate(folds):
        tl = compute_member_logits(members, t.volumes, args.img_size)
        vl = compute_member_logits(members, v.volumes, args.img_size)
        for i, c in enumerate(FAMILY):
            TL[f, i, :len(t)] = tl[c]
            VL[f, i, :len(v)] = vl[c]
        TY[f, :len(t)], TM[f, :len(t)] = t.labels, 1.0
        VY[f, :len(v)], VM[f, :len(v)] = v.labels, 1.0
    conf_index = {c: i for i, c in enumerate(FAMILY)}
    metrics_frozen, _ = train_meta_sweep(
        combos, TL, TY, TM, VL, VY, VM, conf_index,
        MetaHyper(num_epochs=args.num_epochs))
    frozen_auc = np.median(metrics_frozen[:, :, 3], axis=1)   # (20,)
    print("frozen median AUROCs:", np.round(frozen_auc, 4).tolist())

    # --- 4. end-to-end mode (reference-faithful) ---------------------------
    e2e_auc = np.zeros(len(combos))
    for ci, comb in enumerate(combos):
        aucs = []
        for f, (t, v) in enumerate(folds):
            res = train_ensemble([configs[c] for c in comb],
                                 [members[c] for c in comb], t, v,
                                 num_epochs=args.num_epochs,
                                 keep_best_params=False)
            aucs.append(res.metrics["AUROC"])
        e2e_auc[ci] = float(np.median(aucs))
        print(f"e2e {list(map(int, comb))}: median AUROC {e2e_auc[ci]:.4f}",
              flush=True)

    # --- 5. rank agreement -------------------------------------------------
    from scipy import stats

    rho, pval = stats.spearmanr(frozen_auc, e2e_auc)
    order_f = np.argsort(-frozen_auc)
    order_e = np.argsort(-e2e_auc)
    top5 = len(set(order_f[:5].tolist()) & set(order_e[:5].tolist()))
    out = {
        "n_combos": int(len(combos)),
        "num_cv": args.num_cv,
        "num_epochs": args.num_epochs,
        "spearman_rho": round(float(rho), 4),
        "p_value": round(float(pval), 6),
        "top5_overlap": top5,
        "frozen_median_auc": [round(float(a), 4) for a in frozen_auc],
        "e2e_median_auc": [round(float(a), 4) for a in e2e_auc],
        "combos": combos.tolist(),
    }
    with open(os.path.join(args.output_dir, "frozen_vs_e2e.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("spearman_rho", "p_value", "top5_overlap")}))


if __name__ == "__main__":
    main()
