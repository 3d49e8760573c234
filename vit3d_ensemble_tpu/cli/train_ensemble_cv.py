"""Ensemble CV sweep over all C(18,3)=816 combinations — mirrors
`train_ensemble_cv.py` (reference).

Two modes:
  * default (reference-faithful): full backbones fine-tuned per
    combination x fold via `train/ensemble_trainer.py`
    (`train_ensemble_cv.py:82-83` — the reference does NOT freeze
    backbones).  With --padded_compile (on by default) all combinations
    of a shape-class multiset share one compiled program.
  * --frozen (TPU-native fast screening): the 18 baselines' logits are
    computed ONCE per fold in a grouped batched forward, then every
    (combination, fold) meta-head trains as one vmapped program
    (`sweep/ensemble_sweep.py`) — seconds instead of hours.  NOTE
    (measured, docs/RESULTS.md): frozen-mode combination rankings do NOT
    track end-to-end rankings on the real dataset (Spearman rho ~ 0 over
    20 combos x 5 folds), which is why the faithful mode is the default —
    use --frozen for throughput screening, not for model selection.

Output: workbook + CSV with 'mean (std)' cells per metric over folds
(`train_ensemble_cv.py:36-49,221-230`).  The reference names its CV
workbook 'Ensemble_Bootstrap.xlsx' (defect D12); ours is 'Ensemble_CV'
unless overridden with --workbook.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Dict

import numpy as np

from vit3d_ensemble_tpu.checkpoint import (
    baseline_ckpt_path,
    ensemble_ckpt_path,
    load_baseline_params,
    save_pytree,
)
from vit3d_ensemble_tpu.cli._common import (
    add_common_flags,
    apply_runtime_flags,
    parse_conf_list,
    setup_logging,
)
from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import build_train_val
from vit3d_ensemble_tpu.reporting import write_sweep_report
from vit3d_ensemble_tpu.sweep.engine import METRIC_KEYS
from vit3d_ensemble_tpu.train.trainer import init_baseline

logger = logging.getLogger("train_ensemble_cv")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    add_common_flags(parser, csv_subdir="cross_validation")
    parser.add_argument("--num_epochs", type=int, default=100,
                        help="Training epochs per combination.")
    parser.add_argument("--num_cv", type=int, default=5,
                        help="Number of folds in cross validation.")
    parser.add_argument("--conf", type=int, default=5,
                        help="(kept for reference CLI parity)")
    parser.add_argument("--max_configs", type=int, default=19,
                        help="Max baseline configuration number + 1.")
    parser.add_argument("--combinations", type=int, default=3,
                        help="Baselines per ensemble.")
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--frozen", action="store_true",
                        help="Fast screening mode: train only meta-heads "
                             "on cached member logits (seconds for all 816 "
                             "combos).  WARNING: measured combination "
                             "rankings do NOT track the faithful "
                             "end-to-end mode's (Spearman rho ~ 0, "
                             "docs/RESULTS.md).")
    parser.add_argument("--end_to_end", action="store_true",
                        help="(default) reference-faithful mode: fine-tune "
                             "backbones per combination "
                             "(train_ensemble_cv.py:82-83).  Kept as an "
                             "explicit flag for compatibility.")
    parser.add_argument("--padded_compile",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="(end-to-end) pad members to shape-class "
                             "templates with runtime masks and train the "
                             "whole (combination, fold) grid as vmapped "
                             "chunks sharing <=10 compiled programs "
                             "(sweep/e2e_grid.py); exact math, different "
                             "dropout stream.  --no-padded_compile "
                             "restores sequential per-combination "
                             "exact-shape compiles (and always writes "
                             "per-ensemble checkpoints).")
    parser.add_argument("--save_ensembles",
                        action=argparse.BooleanOptionalAction, default=False,
                        help="(grid mode) fetch and write every "
                             "(combination, fold) best-ensemble checkpoint "
                             "like the reference does — for the full 816x5 "
                             "sweep that is ~4080 files / tens of GB, so "
                             "the default keeps metrics+reports only.  "
                             "The sequential mode always saves.")
    parser.add_argument("--e2e_chunk", type=int, default=0,
                        help="(grid mode) combinations per vmapped chunk; "
                             "0 sizes chunks from the device-memory "
                             "budget.")
    parser.add_argument("--backfill_test",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="(grid mode, --resume) re-queue combinations "
                             "whose resume markers predate held-out-test "
                             "evaluation (val-only legacy schema) AFTER all "
                             "fresh combinations, retraining them to derive "
                             "their test metrics; --no-backfill_test keeps "
                             "legacy markers as-is (no test metrics for "
                             "those combos).")
    parser.add_argument("--state_mirror", default=None, metavar="PATH",
                        help="(grid mode) durable JSONL mirror of the "
                             "resume markers: every completed combination "
                             "is appended to PATH, and --resume rehydrates "
                             "missing markers from it first.  Point it "
                             "inside the git worktree so a container reset "
                             "(which destroys --output_dir) can no longer "
                             "zero a multi-hour sweep "
                             "(sweep/state_mirror.py).")
    parser.add_argument("--ensemble_conf_list", default=None,
                        help="Train ONLY this combination (e.g. 5,9,11) "
                             "instead of the full C(max_configs-1, k) grid "
                             "— the whole-dataset driver's flag "
                             "(train_ensemble_whole_dataset.py:191-200) "
                             "honored here for single-combination CV "
                             "retrains (pairs with --save_ensembles to "
                             "produce the per-fold checkpoints test_cv "
                             "--ensemble/--ood consume).")
    parser.add_argument("--random_init_members", action="store_true",
                        help="Use fresh inits for missing baseline ckpts.")
    parser.add_argument("--workbook", default="Ensemble_CV",
                        help="Report file base name.")
    parser.add_argument("--output_path", default=None,
                        help="Alias of --output_dir.")
    return parser


def _selected_combos(args, default_combos):
    """--ensemble_conf_list restricts any sweep mode to one combination.

    Passes `default_combos` through UNTOUCHED otherwise: the frozen path
    hands it an (N, k) ndarray whose .shape train_meta_sweep needs."""
    if getattr(args, "ensemble_conf_list", None):
        return [tuple(parse_conf_list(args.ensemble_conf_list))]
    return default_combos


def _load_member(args, conf: int):
    cfg = ViTConfig.from_conf(conf, img_size=args.img_size)
    path = baseline_ckpt_path(args.output_dir, "baseline", conf,
                              f"conf{conf}")
    if os.path.exists(path):
        return cfg, load_baseline_params(path, cfg)
    if os.path.exists(path[:-len(".msgpack")] + ".bin"):
        return cfg, load_baseline_params(path[:-len(".msgpack")] + ".bin",
                                         cfg)
    if args.random_init_members:
        return cfg, init_baseline(cfg, args.seed)[1]
    raise FileNotFoundError(f"baseline checkpoint missing: {path}")


def run_frozen(args) -> Dict[str, Dict[str, Dict[str, float]]]:
    from vit3d_ensemble_tpu.sweep.ensemble_sweep import (
        MetaHyper,
        all_combinations,
        compute_member_logits,
        train_meta_sweep,
    )

    confs = list(range(1, args.max_configs))
    members = {}
    for c in confs:
        _, members[c] = _load_member(args, c)

    F = args.num_cv
    train_logits, train_labels, train_mask = [], [], []
    val_logits, val_labels, val_mask = [], [], []
    n_max = v_max = 0
    per_fold = []
    for cv in range(F):
        t, v, _ = build_train_val(
            os.path.join(args.csv_path, f"training_cv{cv + 1}.csv"),
            os.path.join(args.csv_path, f"validation_cv{cv + 1}.csv"),
            args.data_root, aug_mode="none", size=args.img_size)
        tl = compute_member_logits(members, t.volumes, args.img_size)
        vl = compute_member_logits(members, v.volumes, args.img_size)
        per_fold.append((tl, t.labels, vl, v.labels))
        n_max = max(n_max, len(t))
        v_max = max(v_max, len(v))

    C18 = len(confs)
    TL = np.zeros((F, C18, n_max), np.float32)
    TY = np.zeros((F, n_max), np.float32)
    TM = np.zeros((F, n_max), np.float32)
    VL = np.zeros((F, C18, v_max), np.float32)
    VY = np.zeros((F, v_max), np.float32)
    VM = np.zeros((F, v_max), np.float32)
    for f, (tl, ty, vl, vy) in enumerate(per_fold):
        n, vn = len(ty), len(vy)
        for i, c in enumerate(confs):
            TL[f, i, :n] = tl[c]
            VL[f, i, :vn] = vl[c]
        TY[f, :n], TM[f, :n] = ty, 1.0
        VY[f, :vn], VM[f, :vn] = vy, 1.0

    combos = np.asarray(_selected_combos(
        args, all_combinations(args.max_configs, args.combinations)))
    conf_index = {c: i for i, c in enumerate(confs)}
    hyper = MetaHyper(num_epochs=args.num_epochs,
                      train_batch_size=args.train_batch_size,
                      learning_rate=args.learning_rate, seed=args.seed)
    from vit3d_ensemble_tpu.parallel.mesh import mesh_from_spec

    mesh = mesh_from_spec(getattr(args, "mesh", None))
    logger.info("frozen-backbone sweep: %d combos x %d folds%s",
                len(combos), F,
                "" if mesh is None else
                f" on mesh {dict(mesh.shape)}")
    metrics, meta = train_meta_sweep(combos, TL, TY, TM, VL, VY, VM,
                                     conf_index, hyper, mesh=mesh)

    results: Dict[str, Dict[str, Dict[str, float]]] = {}
    for ci, comb in enumerate(combos):
        name = "_".join(str(c) for c in comb)
        results[name] = {}
        for f in range(F):
            results[name][f"CV {f + 1}"] = {
                k: float(x) for k, x in zip(METRIC_KEYS, metrics[ci, f])}
        # persist the meta head (w1 w2 w3 b) per fold
        save_pytree(ensemble_ckpt_path(args.output_dir, "cv_ensemble",
                                       name, "meta_heads"),
                    {"combo": np.asarray(comb), "meta_wb": meta[ci]})
    return results


def _e2e_fingerprint(args, mode_tag: str) -> str:
    return (f"{args.num_cv}cv_{args.num_epochs}ep_"
            f"{args.train_batch_size}b_{args.learning_rate}lr_"
            f"{args.seed}s{mode_tag}")


def run_end_to_end_grid(args) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Reference-faithful results, vmapped: the whole (combination, fold)
    grid trains as chunked vmapped programs (`sweep/e2e_grid.py`) — the
    4080-training sweep the reference loops sequentially
    (`/root/reference/train_ensemble_cv.py:56-85`).

    Each combination is ALSO evaluated on the shared held-out test split
    (normalized per fold with that fold's training mean, the reference's
    `test_cv.py:46-52` convention): the test probabilities under the
    accepted best params ride the selection payload, so no checkpoint is
    ever fetched (`/root/reference/test_cv.py:109-189` is the intent the
    reference's defect D8 never delivers).  Per-combination resume markers
    persist val AND test metrics as chunks complete
    ({"combo", "fingerprint", "val", "test"}); pre-test-metric legacy
    markers (val-only fold dicts) are re-queued AFTER all fresh
    combinations when --backfill_test (default) so their test metrics get
    re-derived by retraining (the grid is deterministic given the seed).
    Checkpoints are written only with --save_ensembles (4080 files for the
    full sweep)."""
    import json
    from itertools import combinations as it_combinations

    from vit3d_ensemble_tpu.metrics.host import eleven_metrics
    from vit3d_ensemble_tpu.parallel.mesh import mesh_from_spec
    from vit3d_ensemble_tpu.sweep.e2e_grid import (
        run_e2e_grid,
        stack_e2e_folds,
    )

    state_dir = os.path.join(args.output_dir, "sweep_state")
    os.makedirs(state_dir, exist_ok=True)
    # "_grid" (not "_pad"): grid dropout streams differ from the
    # sequential padded mode's, so their markers must not mix.
    fingerprint = _e2e_fingerprint(args, "_grid")

    mirror = getattr(args, "state_mirror", None)
    if mirror:
        from vit3d_ensemble_tpu.sweep import state_mirror

        # two-way startup sync: rehydrate markers a container reset
        # destroyed, then fold pre-existing markers into the mirror (so
        # adding the flag mid-sweep immediately protects completed work);
        # thereafter every fresh marker is appended as it lands.
        if getattr(args, "resume", False):
            state_mirror.restore(mirror, state_dir)
        state_mirror.snapshot(state_dir, mirror)

    def marker_path(name: str) -> str:
        return os.path.join(state_dir, f"e2e_{name}_{fingerprint}.json")

    results: Dict[str, Dict[str, Dict[str, float]]] = {}
    test_results: Dict[str, Dict[str, Dict[str, float]]] = {}
    have_test_csv = os.path.exists(os.path.join(args.csv_path, "test.csv"))
    todo, backfill = [], []
    for comb in _selected_combos(
            args, it_combinations(range(1, args.max_configs),
                                  args.combinations)):
        name = "_".join(str(c) for c in comb)
        if getattr(args, "resume", False) and os.path.exists(
                marker_path(name)):
            with open(marker_path(name)) as f:
                saved = json.load(f)
            if "val" in saved:
                results[name] = saved["val"]
                test_results[name] = saved.get("test", {})
                logger.info("resume: skipping completed ensemble %s", name)
            elif have_test_csv and getattr(args, "backfill_test", True):
                # legacy val-only marker: keep the val metrics but re-queue
                # (after all fresh combos) to derive the test metrics
                results[name] = saved
                backfill.append(comb)
            else:
                results[name] = saved
                logger.info("resume: ensemble %s kept without test metrics "
                            "(legacy marker; --backfill_test to re-derive)",
                            name)
        else:
            todo.append(comb)
    if backfill:
        logger.info("%d legacy markers queued for test-metric backfill "
                    "after %d fresh combinations", len(backfill), len(todo))
    todo += backfill
    if not todo:
        return results, test_results

    folds = [build_train_val(
        os.path.join(args.csv_path, f"training_cv{cv + 1}.csv"),
        os.path.join(args.csv_path, f"validation_cv{cv + 1}.csv"),
        args.data_root, aug_mode="none", size=args.img_size)
        for cv in range(args.num_cv)]
    # shared 22-row test split, normalized per fold with that fold's
    # training mean (test_cv.py:46-52)
    import dataclasses

    from vit3d_ensemble_tpu.data import load_split

    test_csv = os.path.join(args.csv_path, "test.csv")
    test_raw = None
    if os.path.exists(test_csv):
        test_raw = load_split(test_csv, args.data_root, size=args.img_size)
    else:
        logger.warning("no %s — skipping held-out test evaluation",
                       test_csv)
    fold_entries = []
    for t, v, mean in folds:
        ts = (dataclasses.replace(
            test_raw, volumes=test_raw.volumes - np.float32(mean))
            if test_raw is not None else None)
        fold_entries.append((t, v, ts))
    data = stack_e2e_folds(fold_entries, args.num_epochs,
                           args.train_batch_size, args.seed)
    save = getattr(args, "save_ensembles", False)

    def on_result(plan, res, extras):
        if save:
            for f, params in enumerate(extras["params"]):
                save_pytree(
                    ensemble_ckpt_path(args.output_dir, "cv_ensemble",
                                       plan.name, f"cv{f + 1}"), params)
        marker = {"combo": list(plan.confs), "fingerprint": fingerprint,
                  "val": res}
        if test_raw is not None:
            test_results[plan.name] = {}
            for f in range(args.num_cv):
                probs = np.asarray(extras["test_probs"][f])
                preds = (probs > 0.5).astype(np.int32)
                test_results[plan.name][f"CV {f + 1}"] = {
                    k: float(v) for k, v in eleven_metrics(
                        test_raw.labels, preds, probs).items()}
            marker["test"] = test_results[plan.name]
        tmp = marker_path(plan.name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(marker, fh)
        os.replace(tmp, marker_path(plan.name))
        if mirror:
            state_mirror.append(
                mirror, os.path.basename(marker_path(plan.name)), marker)

    results.update(run_e2e_grid(
        todo, lambda c: _load_member(args, c), data,
        num_epochs=args.num_epochs, learning_rate=args.learning_rate,
        seed=args.seed, mesh=mesh_from_spec(getattr(args, "mesh", None)),
        chunk=getattr(args, "e2e_chunk", 0), keep_payload=save,
        on_result=on_result))
    return results, test_results


def run_end_to_end(args) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Reference-faithful mode.  With --padded_compile (default) the whole
    grid trains vmapped (see `run_end_to_end_grid`); --no-padded_compile
    keeps the sequential per-combination exact-shape loop below, with
    per-combination resume markers."""
    import json
    from itertools import combinations as it_combinations

    from vit3d_ensemble_tpu.train.ensemble_trainer import train_ensemble

    if getattr(args, "padded_compile", False):
        return run_end_to_end_grid(args)

    state_dir = os.path.join(args.output_dir, "sweep_state")
    os.makedirs(state_dir, exist_ok=True)
    fingerprint = _e2e_fingerprint(args, "")

    results: Dict[str, Dict[str, Dict[str, float]]] = {}
    combos = _selected_combos(
        args, it_combinations(range(1, args.max_configs),
                              args.combinations))
    folds = None
    for comb in combos:
        name = "_".join(str(c) for c in comb)
        marker = os.path.join(state_dir,
                              f"e2e_{name}_{fingerprint}.json")
        if getattr(args, "resume", False) and os.path.exists(marker):
            with open(marker) as f:
                results[name] = json.load(f)
            logger.info("resume: skipping completed ensemble %s", name)
            continue
        if folds is None:       # load the fold data once, lazily
            folds = [build_train_val(
                os.path.join(args.csv_path, f"training_cv{cv + 1}.csv"),
                os.path.join(args.csv_path, f"validation_cv{cv + 1}.csv"),
                args.data_root, aug_mode="none", size=args.img_size)
                for cv in range(args.num_cv)]
        loaded = [_load_member(args, c) for c in comb]
        configs = [cfg for cfg, _ in loaded]
        members = [p for _, p in loaded]
        results[name] = {}
        for cv, (t, v, _) in enumerate(folds):
            save = ensemble_ckpt_path(args.output_dir, "cv_ensemble", name,
                                      f"cv{cv + 1}")
            res = train_ensemble(configs, members, t, v,
                                 num_epochs=args.num_epochs,
                                 train_batch_size=args.train_batch_size,
                                 learning_rate=args.learning_rate,
                                 seed=args.seed, save_path=save,
                                 keep_best_params=False)
            results[name][f"CV {cv + 1}"] = dict(res.metrics)
            logger.info("ensemble %s cv%d AUROC %.4f", name, cv + 1,
                        res.metrics["AUROC"])
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results[name], f)
        os.replace(tmp, marker)
    return results


def main(argv=None):
    setup_logging()
    args = build_parser().parse_args(argv)
    apply_runtime_flags(args)
    if args.output_path:
        args.output_dir = args.output_path
    if args.frozen and args.end_to_end:
        raise SystemExit("--frozen and --end_to_end are mutually exclusive")
    results = run_frozen(args) if args.frozen else run_end_to_end(args)
    test_results = None
    if isinstance(results, tuple):      # grid mode: (val, held-out test)
        results, test_results = results
    report = os.path.join(args.output_dir, args.workbook)
    write_sweep_report(report, results)
    logger.info("report written to %s.xlsx / .csv", report)
    test_results = {k: v for k, v in (test_results or {}).items() if v}
    if test_results:
        write_sweep_report(report + "_test", test_results)
        logger.info("held-out test report written to %s_test.xlsx / .csv "
                    "(%d combinations)", report, len(test_results))
    return results


def cli() -> int:
    """Console-script entry: mains return result dicts for programmatic
    use; setuptools wraps the entry point in sys.exit(), so return 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
