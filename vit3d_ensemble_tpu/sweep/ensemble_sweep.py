"""Frozen-backbone ensemble sweep: all C(18,3)=816 combinations at once.

The reference's ensemble CV sweep re-trains 816 x 5 FULL ensembles (3 ViT
backbones each) sequentially for 100 epochs apiece
(`train_ensemble_cv.py:56-57,66,85`) — thousands of GPU-hours.  The
TPU-native formulation (BASELINE.json north star): run the 18 baselines'
logits for the whole split ONCE in a single grouped batched forward, then
the 816-combination sweep reduces to training 816 x F tiny
Linear(3,1)+sigmoid meta-heads on cached logits — one vmapped jitted
program, seconds of wall-clock.

This is the `frozen` mode.  The reference-faithful end-to-end mode
(backbones receive gradients) lives in `train/ensemble_trainer.py` and is
selected with --end_to_end on the CLI drivers.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import logging
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit3d_ensemble_tpu.metrics.jax_metrics import compute_eval_metrics
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.sweep.engine import _metrics_vector
from vit3d_ensemble_tpu.sweep.stack import _pad_to, group_configs
from vit3d_ensemble_tpu.train.selection import (
    device_best_init,
    device_consider,
    device_take_if,
)

logger = logging.getLogger(__name__)


def all_combinations(max_configs: int = 19, k: int = 3) -> np.ndarray:
    """The reference's combination grid (`train_ensemble_cv.py:56-57`):
    combinations(range(1, max_configs), k) -> (n_combos, k) conf numbers."""
    return np.array(list(itertools.combinations(range(1, max_configs), k)),
                    dtype=np.int32)


@functools.lru_cache(maxsize=64)
def _group_infer_fns(group: ConfigGroup, img_size: int):
    """Cached (pad_stack, fwd) jitted fns per group shape class — jits
    defined inside the per-call loop would retrace on every invocation (the
    frozen sweeps call compute_member_logits ~2x per fold/replicate)."""
    template = group.template_config(img_size)
    model = VisionTransformer3D(template, zero_head=True, vis=False)
    dummy = jnp.zeros((1, img_size, img_size, template.z_size, 1))
    tshapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, dummy)["params"])

    @jax.jit
    def pad_stack(member_trees):
        padded = [jax.tree.map(lambda p, t: _pad_to(p, t.shape),
                               tree, tshapes) for tree in member_trees]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)

    mlp_active = jnp.asarray(group.mlp_dims, jnp.int32)
    layers_active = jnp.asarray(group.num_layers, jnp.int32)

    @jax.jit
    def fwd(params, vols):
        def one(p, ml, la):
            return model.apply({"params": p}, vols, deterministic=True,
                               num_layers_active=la,
                               mlp_active=ml).logits.reshape(-1)

        return jax.vmap(one, in_axes=(0, 0, 0))(params, mlp_active,
                                                layers_active)

    return pad_stack, fwd


def compute_member_logits(
    member_params: Mapping[int, dict],
    volumes: np.ndarray,
    img_size: int = 128,
    batch_size: int = 128,
) -> Dict[int, np.ndarray]:
    """Run each baseline conf's logits over `volumes` — grouped, vmapped.

    member_params: {conf: TRUE-shape param tree}.  Returns {conf: (N,)}.
    """
    out: Dict[int, np.ndarray] = {}
    confs = sorted(member_params)
    for group in group_configs(confs):
        pad_stack, fwd = _group_infer_fns(group, img_size)
        stacked = pad_stack([jax.tree.map(jnp.asarray, member_params[c])
                             for c in group.confs])

        # pad every chunk to `batch_size` so ONE compiled program serves all
        # splits/replicates (arbitrary N would trigger a fresh XLA compile
        # per distinct shape — minutes each over the remote-device link).
        chunks = []
        for s in range(0, volumes.shape[0], batch_size):
            chunk = volumes[s:s + batch_size]
            n_valid = chunk.shape[0]
            if n_valid < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n_valid,)
                                     + chunk.shape[1:], chunk.dtype)])
            chunks.append(np.asarray(fwd(stacked,
                                         jnp.asarray(chunk)))[:, :n_valid])
        logits = np.concatenate(chunks, axis=1)       # (G, N)
        for g, c in enumerate(group.confs):
            out[c] = logits[g]
    return out


@dataclasses.dataclass(frozen=True)
class MetaHyper:
    num_epochs: int = 100
    train_batch_size: int = 4
    learning_rate: float = 1e-4
    seed: int = 42


def train_meta_sweep(
    combos: np.ndarray,                 # (C, 3) conf numbers
    train_logits: np.ndarray,           # (F, 18, N) per-fold member logits
    train_labels: np.ndarray,           # (F, N)
    train_mask: np.ndarray,             # (F, N)
    val_logits: np.ndarray,             # (F, 18, V)
    val_labels: np.ndarray,             # (F, V)
    val_mask: np.ndarray,               # (F, V)
    conf_index: Mapping[int, int],      # conf number -> row in logits
    hyper: MetaHyper = MetaHyper(),
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train every (combo, fold) meta head; returns
    (best_metrics (C, F, 11), best_meta_params as (C, F, 4) [w1 w2 w3 b]).

    With `mesh` (Mesh('model', 'data')) the (combo, fold) grid shards over
    the chips — combos over 'model', folds over 'data'; axis lengths that
    do not divide the mesh are padded with duplicate work and cropped."""
    C = combos.shape[0]
    F, _, N = train_logits.shape
    B = hyper.train_batch_size
    E = hyper.num_epochs

    member_rows = np.vectorize(conf_index.__getitem__)(combos)  # (C, 3)

    # batch schedule, reshuffled per epoch per fold (matches the reference's
    # RandomSampler-every-epoch); padded final batch is masked.
    steps = -(-N // B)
    rng = np.random.default_rng(hyper.seed)
    batch_idx = np.zeros((F, E, steps, B), np.int32)
    batch_msk = np.zeros((F, E, steps, B), np.float32)
    for f in range(F):
        n_true = int(train_mask[f].sum())
        for e in range(E):
            order = rng.permutation(n_true)
            for s in range(steps):
                chunk = order[s * B:(s + 1) * B]
                batch_msk[f, e, s, :len(chunk)] = 1.0
                batch_idx[f, e, s, :len(chunk)] = chunk

    tx = optax.adam(hyper.learning_rate)

    def train_one(w, b, members, tl, ty, bidx, bmsk, vl, vy, vmask):
        # members: (3,) rows; tl: (18, N); vl: (18, V)
        sel_t = tl[members]                     # (3, N)
        sel_v = vl[members]                     # (3, V)
        params = dict(w=w, b=b)

        def loss_fn(p, cols, y, m):
            z = jnp.einsum("kb,k->b", cols, p["w"]) + p["b"]
            probs = jax.nn.sigmoid(z)
            probs = jnp.clip(probs, 1e-12, 1 - 1e-12)
            per = -(y * jnp.log(probs) + (1 - y) * jnp.log(1 - probs))
            return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)

        def one_step(carry, im):
            p, opt = carry
            idx, m = im
            cols = sel_t[:, idx]                # (3, B)
            y = ty[idx]
            loss, grads = jax.value_and_grad(loss_fn)(p, cols, y, m)
            updates, new_opt = tx.update(grads, opt, p)
            new_p = optax.apply_updates(p, updates)
            # the schedule pads shorter folds to a common steps-per-epoch
            # with FULLY-masked batches; those must be true no-ops (Adam
            # would otherwise keep moving params on decayed momentum).
            has_valid = jnp.sum(m) > 0
            take = lambda new, old: jax.tree.map(  # noqa: E731
                lambda a, c: jnp.where(has_valid, a, c), new, old)
            return (take(new_p, p), take(new_opt, opt)), loss

        def evaluate(p):
            z = jnp.einsum("kv,k->v", sel_v, p["w"]) + p["b"]
            probs = jax.nn.sigmoid(z)
            m = compute_eval_metrics(probs, vy, vmask)
            return _metrics_vector(m), probs

        def epoch_body(carry, chunk):
            inner, best = carry
            inner, _ = jax.lax.scan(one_step, inner, chunk)
            mvec, probs = evaluate(inner[0])
            best = device_consider(best, mvec, probs, inner[0],
                                   jnp.bool_(False))
            return (inner, best), mvec[3]

        opt = tx.init(params)
        best0 = device_best_init(11, vy.shape[0], params)
        (inner, best), _ = jax.lax.scan(
            epoch_body, ((params, opt), best0), (bidx, bmsk))
        # Fallback eval must BYPASS the selection rule (take-iff-never-found),
        # exactly like engine.py:234 and ensemble_trainer — device_consider
        # with force would let an out-of-cadence eval compete under the
        # normal rule and change which epoch's head wins.
        mvec, probs = evaluate(inner[0])
        best = device_take_if(best, mvec, probs, inner[0], ~best["found"])
        return best["metrics"], best["payload"]

    # init meta heads: torch Linear(3,1) default U(+-1/sqrt(3)) per combo
    init_rng = jax.random.key(hyper.seed)
    kw, kb = jax.random.split(init_rng)
    bound = 1.0 / np.sqrt(3.0)
    w0 = np.asarray(jax.random.uniform(kw, (C, F, 3), minval=-bound,
                                       maxval=bound))
    b0 = np.asarray(jax.random.uniform(kb, (C, F), minval=-bound,
                                       maxval=bound))

    from vit3d_ensemble_tpu.sweep.engine import _rep_pad as rep_pad

    C_pad, F_pad = C, F
    if mesh is not None:
        cm, fd = mesh.shape["model"], mesh.shape["data"]
        C_pad = -(-C // cm) * cm
        F_pad = -(-F // fd) * fd
    combo_arrs = dict(
        w0=rep_pad(rep_pad(w0, C_pad), F_pad, 1),
        b0=rep_pad(rep_pad(b0, C_pad), F_pad, 1),
        member_rows=rep_pad(member_rows, C_pad))
    fold_arrs = dict(
        train_logits=rep_pad(train_logits, F_pad),
        train_labels=rep_pad(train_labels, F_pad),
        batch_idx=rep_pad(batch_idx, F_pad),
        batch_msk=rep_pad(batch_msk, F_pad),
        val_logits=rep_pad(val_logits, F_pad),
        val_labels=rep_pad(val_labels, F_pad),
        val_mask=rep_pad(val_mask, F_pad))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        grid_sh = NamedSharding(mesh, P("model", "data"))
        combo_sh = NamedSharding(mesh, P("model"))
        fold_sh = NamedSharding(mesh, P("data"))
        put = lambda a, s: jax.device_put(jnp.asarray(a), s)  # noqa: E731
        combo_arrs = {
            "w0": put(combo_arrs["w0"], grid_sh),
            "b0": put(combo_arrs["b0"], grid_sh),
            "member_rows": put(combo_arrs["member_rows"], combo_sh)}
        fold_arrs = {k: put(v, fold_sh) for k, v in fold_arrs.items()}
    else:
        combo_arrs = {k: jnp.asarray(v) for k, v in combo_arrs.items()}
        fold_arrs = {k: jnp.asarray(v) for k, v in fold_arrs.items()}

    fold_axes = (0, 0, None, 0, 0, 0, 0, 0, 0, 0)
    combo_axes = (0, 0, 0, None, None, None, None, None, None, None)
    fn = jax.jit(jax.vmap(jax.vmap(train_one, in_axes=fold_axes),
                          in_axes=combo_axes))
    metrics, meta = fn(combo_arrs["w0"], combo_arrs["b0"],
                       combo_arrs["member_rows"],
                       fold_arrs["train_logits"], fold_arrs["train_labels"],
                       fold_arrs["batch_idx"], fold_arrs["batch_msk"],
                       fold_arrs["val_logits"], fold_arrs["val_labels"],
                       fold_arrs["val_mask"])
    meta_flat = np.concatenate(
        [np.asarray(meta["w"])[:C, :F],
         np.asarray(meta["b"])[:C, :F, None]], axis=-1)
    return np.asarray(metrics)[:C, :F], meta_flat
