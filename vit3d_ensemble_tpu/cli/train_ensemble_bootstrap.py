"""Bootstrap ensemble sweep — mirrors `train_ensemble_bootstrap.py`.

Reference flow (`train_ensemble_bootstrap.py:69-265`): for each of the
C(18,3) combinations x num_rep(5) bootstrap replicates — resample
training.csv with seed=k, train the ensemble 100 epochs (selection on the
fixed validation split), then evaluate the best checkpoint on the held-out
test split; report per-replicate test metrics and mean(std) validation
metrics to a workbook.

Default mode is the reference-faithful end-to-end path (backbones
fine-tuned; --padded_compile shares programs across combinations).
--frozen is the fast screening mode (vmapped meta-heads over cached member
logits, recomputed per replicate because each replicate's normalization
mean shifts the inputs) — its combination RANKINGS do not track the
faithful mode's (measured, docs/RESULTS.md), so use it for throughput
screening rather than model selection.

NOTE: the reference's --csv_path default points at the cross_validation
folder which lacks training.csv (the script cannot run as shipped); ours
defaults to fixed_split, where training/validation/test.csv exist.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from vit3d_ensemble_tpu.checkpoint import ensemble_ckpt_path, save_pytree
from vit3d_ensemble_tpu.cli._common import (
    add_common_flags,
    apply_runtime_flags,
    setup_logging,
)
from vit3d_ensemble_tpu.data import bootstrap_resample, build_train_val, load_split
from vit3d_ensemble_tpu.reporting import write_sweep_report
from vit3d_ensemble_tpu.sweep.engine import METRIC_KEYS
from vit3d_ensemble_tpu.cli.train_ensemble_cv import _load_member

logger = logging.getLogger("train_ensemble_bootstrap")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    add_common_flags(parser, csv_subdir="fixed_split")
    parser.add_argument("--num_rep", type=int, default=5,
                        help="Number of bootstrap repetitions.")
    parser.add_argument("--num_epochs", type=int, default=100)
    parser.add_argument("--max_configs", type=int, default=19)
    parser.add_argument("--combinations", type=int, default=3)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--frozen", action="store_true",
                        help="Fast screening mode (meta-heads on cached "
                             "logits); rankings do not track end-to-end "
                             "(docs/RESULTS.md).")
    parser.add_argument("--end_to_end", action="store_true",
                        help="(default) reference-faithful mode.")
    parser.add_argument("--padded_compile",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="(end-to-end) pad members to shape-class "
                             "templates and train the whole (combination, "
                             "replicate) grid as vmapped chunks sharing "
                             "<=10 compiled programs (see "
                             "train_ensemble_cv); --no-padded_compile "
                             "restores the sequential exact-shape loop "
                             "(always saves checkpoints).")
    parser.add_argument("--save_ensembles",
                        action=argparse.BooleanOptionalAction, default=False,
                        help="(grid mode) fetch and write every "
                             "(combination, replicate) best-ensemble "
                             "checkpoint; default keeps metrics+reports "
                             "only.  The sequential mode always saves.")
    parser.add_argument("--e2e_chunk", type=int, default=0,
                        help="(grid mode) combinations per vmapped chunk; "
                             "0 sizes chunks from the device-memory "
                             "budget.")
    parser.add_argument("--state_mirror", default=None, metavar="PATH",
                        help="(grid mode) durable JSONL mirror of the "
                             "resume markers; see train_ensemble_cv "
                             "--state_mirror (sweep/state_mirror.py).")
    parser.add_argument("--random_init_members", action="store_true")
    parser.add_argument("--workbook", default="Ensemble_Bootstrap")
    parser.add_argument("--output_path", default=None)
    return parser


def _splits_for_rep(args, rep: int):
    """Bootstrapped train + fixed val + fixed test, all normalized with the
    replicate's train mean (`train_ensemble_bootstrap.py:96-105`)."""
    import dataclasses

    train_df = bootstrap_resample(
        os.path.join(args.csv_path, "training.csv"), rep)
    train, val, mean = build_train_val(
        train_df, os.path.join(args.csv_path, "validation.csv"),
        args.data_root, aug_mode="none", size=args.img_size)
    test = load_split(os.path.join(args.csv_path, "test.csv"),
                      args.data_root, size=args.img_size)
    test = dataclasses.replace(test,
                               volumes=test.volumes - np.float32(mean))
    return train, val, test


def run_frozen(args):
    from vit3d_ensemble_tpu.metrics.jax_metrics import compute_eval_metrics
    from vit3d_ensemble_tpu.sweep.engine import _metrics_vector
    from vit3d_ensemble_tpu.sweep.ensemble_sweep import (
        MetaHyper,
        all_combinations,
        compute_member_logits,
        train_meta_sweep,
    )
    import jax
    import jax.numpy as jnp

    confs = list(range(1, args.max_configs))
    members = {}
    for c in confs:
        _, members[c] = _load_member(args, c)

    R = args.num_rep
    per_rep = []
    n_max = v_max = t_max = 0
    for rep in range(R):
        train, val, test = _splits_for_rep(args, rep)
        tl = compute_member_logits(members, train.volumes, args.img_size)
        vl = compute_member_logits(members, val.volumes, args.img_size)
        sl = compute_member_logits(members, test.volumes, args.img_size)
        per_rep.append((tl, train.labels, vl, val.labels, sl, test.labels))
        n_max = max(n_max, len(train))
        v_max = max(v_max, len(val))
        t_max = max(t_max, len(test))

    C18 = len(confs)
    TL = np.zeros((R, C18, n_max), np.float32)
    TY = np.zeros((R, n_max), np.float32)
    TM = np.zeros((R, n_max), np.float32)
    VL = np.zeros((R, C18, v_max), np.float32)
    VY = np.zeros((R, v_max), np.float32)
    VM = np.zeros((R, v_max), np.float32)
    SL = np.zeros((R, C18, t_max), np.float32)
    SY = np.zeros((R, t_max), np.float32)
    SM = np.zeros((R, t_max), np.float32)
    for r, (tl, ty, vl, vy, sl, sy) in enumerate(per_rep):
        n, vn, tn = len(ty), len(vy), len(sy)
        for i, c in enumerate(confs):
            TL[r, i, :n] = tl[c]
            VL[r, i, :vn] = vl[c]
            SL[r, i, :tn] = sl[c]
        TY[r, :n], TM[r, :n] = ty, 1.0
        VY[r, :vn], VM[r, :vn] = vy, 1.0
        SY[r, :tn], SM[r, :tn] = sy, 1.0

    combos = all_combinations(args.max_configs, args.combinations)
    conf_index = {c: i for i, c in enumerate(confs)}
    hyper = MetaHyper(num_epochs=args.num_epochs,
                      train_batch_size=args.train_batch_size,
                      learning_rate=args.learning_rate, seed=args.seed)
    from vit3d_ensemble_tpu.parallel.mesh import mesh_from_spec

    mesh = mesh_from_spec(getattr(args, "mesh", None))
    logger.info("frozen bootstrap sweep: %d combos x %d reps%s",
                len(combos), R,
                "" if mesh is None else f" on mesh {dict(mesh.shape)}")
    metrics, meta = train_meta_sweep(combos, TL, TY, TM, VL, VY, VM,
                                     conf_index, hyper, mesh=mesh)

    # held-out test evaluation of each best meta head
    member_rows = np.vectorize(conf_index.__getitem__)(combos)

    @jax.jit
    def test_eval(meta_wb, rows, sl, sy, sm):
        def one(wb, members_r, logits, y, m):
            z = jnp.einsum("kt,k->t", logits[members_r], wb[:3]) + wb[3]
            probs = jax.nn.sigmoid(z)
            return _metrics_vector(compute_eval_metrics(probs, y, m))

        per_rep_fn = jax.vmap(one, in_axes=(0, None, 0, 0, 0))
        return jax.vmap(per_rep_fn, in_axes=(0, 0, None, None, None))(
            meta_wb, rows, sl, sy, sm)

    test_metrics = np.asarray(test_eval(
        jnp.asarray(meta), jnp.asarray(member_rows), jnp.asarray(SL),
        jnp.asarray(SY), jnp.asarray(SM)))

    val_results, test_results = {}, {}
    for ci, comb in enumerate(combos):
        name = "_".join(str(c) for c in comb)
        val_results[name] = {
            f"boot{r}": {k: float(x) for k, x in
                         zip(METRIC_KEYS, metrics[ci, r])}
            for r in range(R)}
        test_results[name] = {
            f"boot{r}": {k: float(x) for k, x in
                         zip(METRIC_KEYS, test_metrics[ci, r])}
            for r in range(R)}
        save_pytree(ensemble_ckpt_path(args.output_dir,
                                       "bootstrap_ensemble", name,
                                       "meta_heads"),
                    {"combo": np.asarray(comb), "meta_wb": meta[ci]})
    return val_results, test_results


def run_end_to_end_grid(args):
    """Reference-faithful results, vmapped: the (combination, replicate)
    grid trains as chunked vmapped programs (`sweep/e2e_grid.py`).  The
    held-out test evaluation rides the selection payload (test probs are
    recomputed at every best-accept, which equals evaluating the best
    checkpoint once, `/root/reference/train_ensemble_bootstrap.py:224-254`)
    — no params ever leave the device unless --save_ensembles."""
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
    fingerprint = (f"{args.num_rep}rep_{args.num_epochs}ep_"
                   f"{args.train_batch_size}b_{args.learning_rate}lr_"
                   f"{args.seed}s_grid")

    def marker_path(name: str) -> str:
        return os.path.join(state_dir, f"boot_{name}_{fingerprint}.json")

    mirror = getattr(args, "state_mirror", None)
    if mirror:
        from vit3d_ensemble_tpu.sweep import state_mirror

        # two-way startup sync, then append per combination (see
        # cli/train_ensemble_cv.run_end_to_end_grid)
        if getattr(args, "resume", False):
            state_mirror.restore(mirror, state_dir)
        state_mirror.snapshot(state_dir, mirror)

    val_results, test_results = {}, {}
    todo = []
    for comb in it_combinations(range(1, args.max_configs),
                                args.combinations):
        name = "_".join(str(c) for c in comb)
        if getattr(args, "resume", False) and os.path.exists(
                marker_path(name)):
            with open(marker_path(name)) as f:
                saved = json.load(f)
            val_results[name] = saved["val"]
            test_results[name] = saved["test"]
            logger.info("resume: skipping completed ensemble %s", name)
        else:
            todo.append(comb)
    if not todo:
        return val_results, test_results

    reps = [_splits_for_rep(args, rep) for rep in range(args.num_rep)]
    data = stack_e2e_folds(reps, args.num_epochs, args.train_batch_size,
                           args.seed)
    save = getattr(args, "save_ensembles", False)

    def on_result(plan, res, extras):
        val_results[plan.name] = res
        test_results[plan.name] = {}
        for r in range(args.num_rep):
            probs = np.asarray(extras["test_probs"][r])
            preds = (probs > 0.5).astype(np.int32)
            test_results[plan.name][f"boot{r}"] = {
                k: float(v) for k, v in eleven_metrics(
                    reps[r][2].labels, preds, probs).items()}
            if save:
                save_pytree(
                    ensemble_ckpt_path(args.output_dir,
                                       "bootstrap_ensemble", plan.name,
                                       f"bootstrap_{r}"),
                    extras["params"][r])
        blob = {"combo": [int(c) for c in plan.name.split("_")],
                "val": res, "test": test_results[plan.name]}
        tmp = marker_path(plan.name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(blob, fh)
        os.replace(tmp, marker_path(plan.name))
        if mirror:
            state_mirror.append(
                mirror, os.path.basename(marker_path(plan.name)), blob)

    run_e2e_grid(
        todo, lambda c: _load_member(args, c), data,
        num_epochs=args.num_epochs, learning_rate=args.learning_rate,
        seed=args.seed, mesh=mesh_from_spec(getattr(args, "mesh", None)),
        chunk=getattr(args, "e2e_chunk", 0), keep_payload=save,
        fold_label=lambda r: f"boot{r}", on_result=on_result)
    return val_results, test_results


def run_end_to_end(args):
    from itertools import combinations as it_combinations

    from vit3d_ensemble_tpu.metrics.host import eleven_metrics
    from vit3d_ensemble_tpu.train.ensemble_trainer import train_ensemble
    from vit3d_ensemble_tpu.train.steps import make_ensemble_eval_step
    from vit3d_ensemble_tpu.models import TransformerEnsemble

    import jax
    import numpy as np

    if getattr(args, "padded_compile", False):
        return run_end_to_end_grid(args)

    val_results, test_results = {}, {}
    combos = list(it_combinations(range(1, args.max_configs),
                                  args.combinations))
    for comb in combos:
        name = "_".join(str(c) for c in comb)
        loaded = [_load_member(args, c) for c in comb]
        configs = [cfg for cfg, _ in loaded]
        members = [p for _, p in loaded]
        val_results[name], test_results[name] = {}, {}
        for rep in range(args.num_rep):
            train, val, test = _splits_for_rep(args, rep)
            save = ensemble_ckpt_path(args.output_dir, "bootstrap_ensemble",
                                      name, f"bootstrap_{rep}")
            res = train_ensemble(configs, members, train, val,
                                 num_epochs=args.num_epochs,
                                 train_batch_size=args.train_batch_size,
                                 learning_rate=args.learning_rate,
                                 seed=args.seed, save_path=save,
                                 keep_best_params=True)
            val_results[name][f"boot{rep}"] = dict(res.metrics)
            # held-out test with the best params (testing_model flow,
            # train_ensemble_bootstrap.py:224-254)
            model = TransformerEnsemble(tuple(configs))
            eval_step = make_ensemble_eval_step(model)
            probs = np.asarray(eval_step(res.best_params,
                                         jax.numpy.asarray(test.volumes)))
            preds = (probs > 0.5).astype(np.int32)
            test_results[name][f"boot{rep}"] = eleven_metrics(
                test.labels, preds, probs)
    return val_results, test_results


def main(argv=None):
    setup_logging()
    args = build_parser().parse_args(argv)
    apply_runtime_flags(args)
    if args.output_path:
        args.output_dir = args.output_path
    if args.frozen and args.end_to_end:
        raise SystemExit("--frozen and --end_to_end are mutually exclusive")
    if args.frozen:
        val_results, test_results = run_frozen(args)
    else:
        val_results, test_results = run_end_to_end(args)
    base = os.path.join(args.output_dir, args.workbook)
    write_sweep_report(base, val_results)
    write_sweep_report(base + "_test", test_results)
    logger.info("reports written to %s{,_test}.xlsx / .csv", base)
    return val_results, test_results


def cli() -> int:
    """Console-script entry: mains return result dicts for programmatic
    use; setuptools wraps the entry point in sys.exit(), so return 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
