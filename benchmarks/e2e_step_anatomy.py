"""Anatomy of the vmapped end-to-end ensemble training step.

Times one 10-epoch segment (chunk 4 x 5 folds = 20 instances, mixed-class
signature, real dataset shapes) under component ablations, to find where
the ~2 s/epoch goes.  Variants recompile quickly with remat (~80 s each).

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/e2e_step_anatomy.py
"""

from __future__ import annotations

import json
import time
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from vit3d_ensemble_tpu.cli._common import setup_jax_cache

    setup_jax_cache()

    from vit3d_ensemble_tpu.cli.train_ensemble_cv import _load_member
    from vit3d_ensemble_tpu.metrics.jax_metrics import compute_eval_metrics
    from vit3d_ensemble_tpu.models import TransformerEnsemble
    from vit3d_ensemble_tpu.sweep.e2e_grid import (
        _member_padder,
        plan_combo,
        signature_of,
    )
    from vit3d_ensemble_tpu.sweep.engine import _metrics_vector

    class A:
        output_dir = "/root/outputs/full_e2e"
        img_size = 128
        random_init_members = False
        seed = 42

    all_combos = list(combinations(range(1, 19), 3))
    sig_target = ((16, 16), (32, 8), (64, 4))
    mixed = [c for c in all_combos
             if signature_of(plan_combo(c)) == sig_target][:4]
    padder = _member_padder(lambda c: _load_member(A, c), None)

    C, F, B, S, E = 4, 5, 4, 18, 10
    N, V = 72, 18
    rng = np.random.default_rng(0)
    vols = jnp.asarray(rng.normal(size=(F, N, 128, 128, 5, 1))
                       .astype(np.float32))
    labels = jnp.asarray((rng.random((F, N)) > 0.5).astype(np.float32))
    val_vols = jnp.asarray(rng.normal(size=(F, V, 128, 128, 5, 1))
                           .astype(np.float32))
    val_labels = jnp.asarray((rng.random((F, V)) > 0.5)
                             .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(F, E, S, B)), jnp.int32)

    plans = [plan_combo(c) for c in mixed]
    sig_cfgs = tuple(padder(c)[0] for c in plans[0].sorted_confs)
    stacked, masks = [], []
    for p in plans:
        tree = {}
        for j, c in enumerate(p.sorted_confs):
            tree[f"transformer_{j}"] = padder(c)[1]
        masks.append([list(padder(c)[2]) for c in p.sorted_confs])
        stacked.append(tree)
    masks = jnp.asarray(np.asarray(masks, np.int32))

    def build(variant, n_members=3):
        cfgs = sig_cfgs[:n_members]
        model = TransformerEnsemble(cfgs, remat=True)
        tx = optax.adam(1e-4)

        def init_one(key):
            dummy = jnp.zeros((1, 128, 128, 5, 1))
            return model.init({"params": key}, dummy)["params"]

        def run_one(params, m, vols, labels, vv, vl, idx):
            mm = tuple((m[i, 0], m[i, 1]) for i in range(n_members))

            def loss_fn(p, bv, bl, drop_rng):
                det = variant == "no_dropout"
                kw = {} if det else {"rngs": {"dropout": drop_rng}}
                probs = model.apply({"params": p}, bv,
                                    deterministic=det,
                                    member_masks=mm, **kw).reshape(-1)
                pc = jnp.clip(probs, 1e-12, 1 - 1e-12)
                return -jnp.mean(bl * jnp.log(pc)
                                 + (1 - bl) * jnp.log(1 - pc))

            def one_step(carry, bidx):
                p, opt, rng = carry
                key, sub = jax.random.split(
                    jax.random.wrap_key_data(rng))
                if variant == "fwd_only":
                    loss = loss_fn(p, vols[bidx], labels[bidx], sub)
                    return (p, opt, jax.random.key_data(key)), loss
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, vols[bidx], labels[bidx], sub)
                if variant == "no_optimizer":
                    new_p, new_opt = p, opt
                else:
                    updates, new_opt = tx.update(grads, opt, p)
                    new_p = optax.apply_updates(p, updates)
                return (new_p, new_opt, jax.random.key_data(key)), loss

            def evaluate(p):
                probs = model.apply({"params": p}, vv, deterministic=True,
                                    member_masks=mm).reshape(-1)
                if variant == "eval_no_metrics":
                    return jnp.zeros(11).at[3].set(jnp.sum(probs)), probs
                return _metrics_vector(
                    compute_eval_metrics(probs, vl)), probs

            def epoch(carry, chunk):
                inner, acc = carry
                inner, losses = jax.lax.scan(one_step, inner, chunk)
                # losses feed the accumulator so fwd_only/no_optimizer
                # variants (whose params never change) are not dead-code
                # eliminated with their whole training scan.
                acc = acc + jnp.sum(losses)
                if variant in ("no_eval",):
                    return (inner, acc), losses[-1]
                mvec, _ = evaluate(inner[0])
                return (inner, acc + mvec[3]), losses[-1]

            opt = tx.init(params)
            key = jax.random.key_data(jax.random.key(42))
            (inner, acc), _ = jax.lax.scan(
                epoch, ((params, opt, key), jnp.float32(0.0)), idx)
            return acc + jax.tree.leaves(inner[0])[0].ravel()[0]

        fold_axes = (None, None, 0, 0, 0, 0, 0)
        combo_axes = (0, 0) + (None,) * 5
        fn = jax.jit(jax.vmap(jax.vmap(run_one, in_axes=fold_axes),
                              in_axes=combo_axes))
        tmpl = init_one(jax.random.key(0))
        params = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[{**{f"transformer_{j}": t[f"transformer_{j}"]
                  for j in range(n_members)},
               "meta": jax.device_get(tmpl)["meta"]} for t in stacked])
        return fn, params

    for variant, nm in [("baseline", 3), ("no_eval", 3),
                        ("eval_no_metrics", 3), ("fwd_only", 3),
                        ("no_optimizer", 3), ("no_dropout", 3),
                        ("one_member", 1)]:
        fn, params = build("baseline" if variant == "one_member" else variant,
                           n_members=nm)
        args = (params, masks, vols, labels, val_vols, val_labels, idx)
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        exec_s = time.perf_counter() - t0
        print(json.dumps({"variant": variant,
                          "compile_s": round(compile_s - exec_s, 1),
                          "exec_10ep_s": round(exec_s, 2)}), flush=True)


if __name__ == "__main__":
    main()
