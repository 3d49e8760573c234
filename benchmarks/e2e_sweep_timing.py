"""End-to-end ensemble sweep timing: sequential padded loop vs the vmapped
grid (`sweep/e2e_grid.py`), on the real dataset with trained members.

Usage (members first: train_baseline_whole_dataset --all_configs):

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/e2e_sweep_timing.py \
      --output_dir /root/outputs/full_e2e [--n_combos 6] [--epochs 100]

Prints one JSON line per mode with per-combination wall seconds (steady
state — the shared compiled programs are warmed on the first combination
of each class signature).
"""

from __future__ import annotations

import argparse
import json
import time
from itertools import combinations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default="/root/outputs/full_e2e")
    ap.add_argument("--csv_path",
                    default="/root/reference/csv_files/cross_validation")
    ap.add_argument("--data_root", default="/root/reference/dataset")
    ap.add_argument("--n_combos", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--num_cv", type=int, default=5)
    ap.add_argument("--modes", default="seq,grid")
    ap.add_argument("--attention_impl", default="auto",
                    help="A/B the training path's attention impl (e.g. "
                         "'layer' = the fused sublayer kernel with its "
                         "recompute-through-XLA VJP) against the einsum "
                         "default, in both modes")
    args = ap.parse_args()

    from vit3d_ensemble_tpu.cli._common import setup_jax_cache

    setup_jax_cache()

    from vit3d_ensemble_tpu.ops.attention import set_default_attention_impl

    set_default_attention_impl(args.attention_impl)

    import os

    from vit3d_ensemble_tpu.cli.train_ensemble_cv import _load_member
    from vit3d_ensemble_tpu.data import build_train_val

    class A:  # what _load_member needs
        output_dir = args.output_dir
        img_size = 128
        random_init_members = False
        seed = 42

    combos = list(combinations(range(1, 19), 3))[:args.n_combos]
    folds = [build_train_val(
        os.path.join(args.csv_path, f"training_cv{cv + 1}.csv"),
        os.path.join(args.csv_path, f"validation_cv{cv + 1}.csv"),
        args.data_root, aug_mode="none", size=128)
        for cv in range(args.num_cv)]

    if "seq" in args.modes:
        from vit3d_ensemble_tpu.train.ensemble_trainer import (
            pad_members_to_templates,
            train_ensemble,
        )

        per_combo = []
        for comb in combos:
            t0 = time.perf_counter()
            loaded = [_load_member(A, c) for c in comb]
            t_cfgs, members, masks = pad_members_to_templates(
                [cfg for cfg, _ in loaded], [p for _, p in loaded])
            for t, v, _ in folds:
                train_ensemble(t_cfgs, members, t, v,
                               num_epochs=args.epochs,
                               train_batch_size=4, learning_rate=1e-4,
                               seed=42, keep_best_params=False,
                               member_masks=masks)
            per_combo.append(time.perf_counter() - t0)
        steady = per_combo[1:] or per_combo
        print(json.dumps({
            "mode": "sequential-padded", "attn": args.attention_impl,
            "per_combo_s": per_combo,
            "steady_s_per_combo": round(sum(steady) / len(steady), 2),
            "extrapolated_816_min":
                round(sum(steady) / len(steady) * 816 / 60, 1)}))

    if "grid" in args.modes:
        from vit3d_ensemble_tpu.sweep.e2e_grid import (
            run_e2e_grid,
            stack_e2e_folds,
        )

        data = stack_e2e_folds([(t, v) for t, v, _ in folds],
                               args.epochs, 4, 42)
        t0 = time.perf_counter()
        run_e2e_grid(combos, lambda c: _load_member(A, c), data,
                     num_epochs=args.epochs, learning_rate=1e-4, seed=42)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": "grid", "attn": args.attention_impl,
            "combos": len(combos),
            "total_s": round(dt, 2),
            "s_per_combo": round(dt / len(combos), 2)}))


if __name__ == "__main__":
    main()
