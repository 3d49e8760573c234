"""End-to-end stacking-ensemble trainer (the reference-faithful mode).

Capability-equivalent to the ensemble drivers' epoch loop
(`train_ensemble_whole_dataset.py:31-186`, `train_ensemble_cv.py:85-202`):
backbones are initialized from trained baseline checkpoints, the FULL
ensemble (backbones + Linear meta head) is optimized with Adam(1e-4) under
BCELoss on sigmoid outputs, evaluation runs after every epoch, and the
spec/sens>0.6-then-AUROC rule selects the checkpoint.

Faithfulness notes:
  * backbones are NOT frozen (the reference optimizes
    `ensemble.parameters()`, `train_ensemble_cv.py:83`);
  * no augmentation in ensemble training (the reference ensemble loaders
    build the raw normalized splits only, `train_ensemble_cv.py:97-107`);
  * the meta head is Linear(3, 1) (reference intent; its default
    in_features=3 is defect D6).

For the 816-combination CV/bootstrap sweeps, see
`sweep/ensemble_sweep.py` — the frozen-backbone vmapped mode.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit3d_ensemble_tpu.checkpoint import save_pytree
from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import EpochBatcher, SplitArrays
from vit3d_ensemble_tpu.models import TransformerEnsemble
from vit3d_ensemble_tpu.train.optim import adam
from vit3d_ensemble_tpu.train.selection import BestTracker

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EnsembleResult:
    metrics: Dict[str, float]
    true_labels: np.ndarray
    predicted_labels: np.ndarray
    class_probabilities: np.ndarray
    best_params: Optional[dict]


def init_ensemble(configs: Sequence[ViTConfig],
                  member_params: Sequence[dict],
                  seed: int = 42) -> Tuple[TransformerEnsemble, dict]:
    """Build the ensemble with backbones loaded from baseline params
    (`train_ensemble_cv.py:80-82`)."""
    model = TransformerEnsemble(tuple(configs))
    cfg = configs[0]

    @jax.jit
    def build():
        dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.z_size,
                           cfg.in_channels))
        return model.init({"params": jax.random.key(seed)}, dummy)["params"]

    params = build()
    for i, mp in enumerate(member_params):
        params[f"transformer_{i}"] = jax.tree.map(jnp.asarray, mp)
    return model, params


def _ensemble_run_fn(configs, learning_rate: float, use_masks: bool):
    """Cached builder — the closure traces whatever op impls are global
    at first call, so the cache key includes them (same contract as
    `sweep/e2e_grid._grid_programs`)."""
    from vit3d_ensemble_tpu.ops.attention import get_default_attention_impl
    from vit3d_ensemble_tpu.ops.mlp import get_default_mlp_impl
    from vit3d_ensemble_tpu.ops.pallas_attention_layer import _nb_block
    from vit3d_ensemble_tpu.ops.quant import get_default_quant_impl

    # _nb_block() and the quant selector join the key for the same reason
    # as the impl strings: the closures trace them at first call.
    return _ensemble_run_fn_cached(
        configs, learning_rate, use_masks,
        (get_default_attention_impl(), get_default_mlp_impl(),
         _nb_block(), get_default_quant_impl()))


@functools.lru_cache(maxsize=16)
def _ensemble_run_fn_cached(configs, learning_rate: float, use_masks: bool,
                            _impls):
    """The jitted whole-run training program for one (config tuple, lr)
    pair: scan(epochs){ scan(steps){adam step}; eval; select } — the
    reference's loop host-dispatches every batch
    (`train_ensemble_cv.py:131-196`), ruinous over a remote-device link.

    Everything run-specific (data, batch schedule, rng, member masks) is an
    ARGUMENT, and the builder is cached, so one traced + compiled program
    serves every combination/fold that shares template configs and shapes.
    """
    import optax

    from vit3d_ensemble_tpu.metrics.jax_metrics import compute_eval_metrics
    from vit3d_ensemble_tpu.sweep.engine import _metrics_vector
    from vit3d_ensemble_tpu.train.selection import (
        device_best_init,
        device_consider,
        device_take_if,
    )

    model = TransformerEnsemble(configs)
    tx = adam(learning_rate)

    @jax.jit
    def run(params, vols, labels, val_vols, val_labels, idx_all, msk_all,
            rng, masks):
        mm = masks if use_masks else None

        def loss_fn(p, bv, bl, bm, drop_rng):
            probs = model.apply({"params": p}, bv, deterministic=False,
                                rngs={"dropout": drop_rng},
                                member_masks=mm).reshape(-1)
            pc = jnp.clip(probs, 1e-12, 1 - 1e-12)
            per = -(bl * jnp.log(pc) + (1 - bl) * jnp.log(1 - pc))
            return jnp.sum(per * bm) / jnp.maximum(jnp.sum(bm), 1.0)

        def one_step(carry, im):
            p, opt, rng = carry
            idx, bm = im
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                p, vols[idx], labels[idx], bm, sub)
            updates, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), opt, rng), loss

        def evaluate(p):
            probs = model.apply({"params": p}, val_vols,
                                deterministic=True,
                                member_masks=mm).reshape(-1)
            return _metrics_vector(
                compute_eval_metrics(probs, val_labels)), probs

        def epoch_body(carry, chunk):
            inner, best = carry
            inner, losses = jax.lax.scan(one_step, inner, chunk)
            mvec, probs = evaluate(inner[0])
            best = device_consider(best, mvec, probs, inner[0],
                                   jnp.bool_(False))
            return (inner, best), losses[-1]

        opt = tx.init(params)
        best0 = device_best_init(11, val_vols.shape[0], params)
        (inner, best), _ = jax.lax.scan(epoch_body, ((params, opt, rng),
                                                     best0),
                                        (idx_all, msk_all))
        mvec, probs = evaluate(inner[0])
        best = device_take_if(best, mvec, probs, inner[0], ~best["found"])
        return best

    return run


def pad_members_to_templates(configs: Sequence[ViTConfig],
                             member_params: Sequence[dict],
                             max_mlp: Optional[int] = None,
                             max_layers: Optional[int] = None):
    """Pad each member to its (hidden, heads) class-wide template with
    runtime depth/width masks — every combination of a class-multiset then
    shares ONE compiled training program (10 templates cover all C(18,3)
    combinations, vs one compile per combination with exact shapes).

    Returns (template_configs, padded_params, member_masks).  Zero padding
    + masks is EXACT for forward and gradients (test_sweep), and padded
    regions stay exactly zero under any optax optimizer (zero grads).
    The one behavioral difference: dropout draws over the padded FFN width
    consume a different random stream than the exact-shape model — the
    same (documented) property the vmapped baseline sweep already has.
    """
    from vit3d_ensemble_tpu.configs import BASELINE_CONFS, parameters_config
    from vit3d_ensemble_tpu.sweep.stack import _pad_to

    if max_mlp is None:
        max_mlp = max(parameters_config(c)[1] for c in BASELINE_CONFS)
    if max_layers is None:
        max_layers = max(parameters_config(c)[2] for c in BASELINE_CONFS)
    t_cfgs, padded, masks = [], [], []
    for cfg, p in zip(configs, member_params):
        tcfg = dataclasses.replace(cfg, mlp_dim=max(cfg.mlp_dim, max_mlp),
                                   num_layers=max(cfg.num_layers,
                                                  max_layers))
        from vit3d_ensemble_tpu.models import VisionTransformer3D

        tmodel = VisionTransformer3D(tcfg, zero_head=True, vis=False)
        dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.z_size,
                           cfg.in_channels))
        tshapes = jax.eval_shape(
            lambda m=tmodel, d=dummy:
            m.init({"params": jax.random.key(0)}, d)["params"])

        @jax.jit
        def pad_tree(tree, ts=tshapes):
            return jax.tree.map(lambda a, t: _pad_to(a, t.shape), tree, ts)

        padded.append(pad_tree(jax.tree.map(jnp.asarray, p)))
        t_cfgs.append(tcfg)
        masks.append((cfg.num_layers, cfg.mlp_dim))
    return t_cfgs, padded, tuple(masks)


def crop_ensemble_params(params: dict, true_configs: Sequence[ViTConfig]):
    """Crop a padded ensemble param tree (host-side numpy) back to the
    members' true shapes, so checkpoints keep the exact-config layout."""
    from vit3d_ensemble_tpu.models import VisionTransformer3D

    out = {"meta": params["meta"]}
    for i, cfg in enumerate(true_configs):
        model = VisionTransformer3D(cfg, zero_head=True, vis=False)
        dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.z_size,
                           cfg.in_channels))
        tshapes = jax.eval_shape(
            lambda m=model, d=dummy:
            m.init({"params": jax.random.key(0)}, d)["params"])
        out[f"transformer_{i}"] = jax.tree.map(
            lambda a, t: np.asarray(a)[tuple(slice(0, s) for s in t.shape)],
            params[f"transformer_{i}"], tshapes)
    return out


def train_ensemble(
    configs: Sequence[ViTConfig],
    member_params: Sequence[dict],
    train_split: SplitArrays,
    val_split: SplitArrays,
    *,
    num_epochs: int = 100,
    train_batch_size: int = 4,
    learning_rate: float = 1e-4,
    seed: int = 42,
    save_path: Optional[str] = None,
    keep_best_params: bool = True,
    tracker: Optional[BestTracker] = None,
    member_masks=None,
    crop_to: Optional[Sequence[ViTConfig]] = None,
) -> EnsembleResult:
    """One ensemble, one split — the reference epoch loop, jit-compiled.

    `tracker` may be passed in to reproduce the reference's cross-fold /
    cross-combination best_choice carry-over (defect D9/D19 territory); by
    default a fresh tracker per call (the intended semantics).

    `member_masks` (from `pad_members_to_templates`) runs padded members
    with runtime masks; data, schedules, and masks are all jit ARGUMENTS,
    so one compiled program serves every combination/fold that shares the
    template configs and array shapes.  `crop_to` restores the true-config
    checkpoint layout for the returned/saved best params.
    """
    from vit3d_ensemble_tpu.sweep.engine import METRIC_KEYS

    _, params = init_ensemble(configs, member_params, seed)
    use_masks = member_masks is not None
    masks_arg = (tuple((jnp.int32(la), jnp.int32(ml))
                       for la, ml in member_masks) if use_masks else ())

    vols = jnp.asarray(train_split.volumes)
    labels = jnp.asarray(train_split.labels.astype(np.float32))
    val_vols = jnp.asarray(val_split.volumes)
    val_labels_np = val_split.labels
    val_labels = jnp.asarray(val_labels_np.astype(np.float32))

    # precompute the whole run's batch schedule: (E, S, B) + masks, epoch
    # reshuffles matching the reference's per-epoch RandomSampler.
    batcher = EpochBatcher(len(train_split), train_batch_size, seed=seed)
    S = batcher.steps_per_epoch
    B = train_batch_size
    idx_all = np.zeros((num_epochs, S, B), np.int32)
    msk_all = np.zeros((num_epochs, S, B), np.float32)
    for e in range(num_epochs):
        for s, (idx, mask) in enumerate(batcher.epoch()):
            idx_all[e, s] = idx
            msk_all[e, s] = mask

    run = _ensemble_run_fn(tuple(configs), float(learning_rate), use_masks)
    best = run(params, vols, labels, val_vols, val_labels,
               jnp.asarray(idx_all), jnp.asarray(msk_all),
               jax.random.key(seed), masks_arg)
    mvec = np.asarray(best["metrics"])
    cp = np.asarray(best["probs"])
    pl = (cp > 0.5).astype(np.int32)
    metrics = {k: float(v) for k, v in zip(METRIC_KEYS, mvec)}
    best_params = jax.device_get(best["payload"])
    if crop_to is not None:
        best_params = crop_ensemble_params(best_params, crop_to)
    if save_path is not None:
        save_pytree(save_path, best_params)

    # keep the host tracker contract for callers that thread one across
    # folds/combinations (reference defect D9/D19 semantics)
    tracker = tracker if tracker is not None else BestTracker()
    tracker.consider(metrics["Specificity"], metrics["Sensitivity"],
                     metrics["AUROC"], metrics,
                     payload=(best_params, val_labels_np.copy(), pl, cp))

    return EnsembleResult(
        metrics=metrics, true_labels=val_labels_np.copy(),
        predicted_labels=pl, class_probabilities=cp,
        best_params=best_params if keep_best_params else None)
