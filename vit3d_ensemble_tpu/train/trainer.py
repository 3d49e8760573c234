"""Single-model baseline trainer: the reference training loop, jit-compiled.

Capability-equivalent to `train()` / `valid()` in the baseline drivers
(`train_baseline_cv.py:105-215`):

  * SGD(momentum 0.9, weight decay) + warmup-cosine/linear schedule;
  * per-step balanced pos_weight BCE (computed in-graph, not via sklearn);
  * eval every `eval_every` optimizer steps: sigmoid probs > 0.5, the
    6 sklearn metrics, the spec/sens>0.6-then-AUROC selection rule, and a
    checkpoint write on every new best;
  * runs exactly `num_steps` optimizer steps over an infinite epoch stream.

Differences (all TPU-motivated, behavior-preserving):
  * data stays device-resident; batches are index gathers;
  * validation is ONE batched forward instead of a B=1 loop;
  * the 'best' parameters are also kept in memory and returned, so callers
    (ensemble trainers, test drivers) need not re-read checkpoints.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit3d_ensemble_tpu.checkpoint import save_pytree
from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import EpochBatcher, SplitArrays
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.train.optim import sgd_momentum
from vit3d_ensemble_tpu.train.schedules import make_schedule

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class BaselineResult:
    metrics: Dict[str, float]            # the 11-metric dict of the best eval
    true_labels: np.ndarray
    predicted_labels: np.ndarray
    class_probabilities: np.ndarray
    best_params: Optional[dict]
    num_params_m: float
    final_loss: float


def init_baseline(config: ViTConfig, seed: int,
                  zero_head: bool = True) -> Tuple[VisionTransformer3D, dict]:
    model = VisionTransformer3D(config, zero_head=zero_head, vis=False)

    # jitted: eager linen init dispatches hundreds of tiny device ops,
    # which is ruinously slow over the remote-TPU tunnel.
    @jax.jit
    def build():
        dummy = jnp.zeros((1, config.img_size, config.img_size,
                           config.z_size, config.in_channels), jnp.float32)
        return model.init({"params": jax.random.key(seed)}, dummy)

    return model, build()["params"]


def train_baseline(
    config: ViTConfig,
    train_split: SplitArrays,
    val_split: SplitArrays,
    *,
    num_steps: int = 100,
    eval_every: int = 24,
    train_batch_size: int = 4,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-2,
    warmup_steps: int = 1000,
    decay_type: str = "cosine",
    seed: int = 42,
    save_path: Optional[str] = None,
    keep_best_params: bool = True,
    balanced_weights: bool = True,
    gradient_accumulation_steps: int = 1,
    metrics_logger=None,
) -> BaselineResult:
    """Train one baseline config on one (train, val) split.

    gradient_accumulation_steps > 1 averages gradients over k micro-batches
    per optimizer update (optax.MultiSteps) — the reference flag's INTENDED
    semantics; as shipped it trains nothing (defect D14,
    `train_baseline_cv.py:173-176`).
    """
    import optax

    model, params = init_baseline(config, seed)
    schedule = make_schedule(decay_type, learning_rate, warmup_steps,
                             num_steps)
    tx = sgd_momentum(schedule, momentum=0.9, weight_decay=weight_decay)
    accum = max(1, int(gradient_accumulation_steps))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    n_params = sum(a.size for a in jax.tree.leaves(params)) / 1e6

    from vit3d_ensemble_tpu.metrics.jax_metrics import compute_eval_metrics
    from vit3d_ensemble_tpu.sweep.engine import METRIC_KEYS, _metrics_vector
    from vit3d_ensemble_tpu.train.selection import (
        device_best_init,
        device_consider,
        device_take_if,
    )
    from vit3d_ensemble_tpu.train.steps import (
        masked_balanced_pos_weight,
        masked_bce_with_logits,
    )

    vols = jnp.asarray(train_split.volumes)
    labels = jnp.asarray(train_split.labels.astype(np.float32))
    val_vols = jnp.asarray(val_split.volumes)
    val_labels_np = val_split.labels
    val_labels = jnp.asarray(val_labels_np.astype(np.float32))

    # precompute the full micro-batch schedule; eval fires every
    # `eval_every` OPTIMIZER updates (= eval_every * accum micro-steps),
    # matching the reference's global_step gating.
    micro_per_eval = eval_every * accum
    total_micro = num_steps * accum
    periods, rem = divmod(total_micro, micro_per_eval)
    batcher = EpochBatcher(len(train_split), train_batch_size, seed=seed)
    B = train_batch_size
    idx_all = np.zeros((total_micro, B), np.int32)
    msk_all = np.zeros((total_micro, B), np.float32)
    for s, (idx, mask) in enumerate(batcher.batches(total_micro)):
        idx_all[s] = idx
        msk_all[s] = mask

    # ONE compiled program: scan(periods){ scan(micro){sgd step}; eval;
    # select } — the host loop paid several link round-trips per step.
    @jax.jit
    def run(params, rng):
        def loss_fn(p, bv, bl, bm, drop_rng):
            out = model.apply({"params": p}, bv, deterministic=False,
                              rngs={"dropout": drop_rng})
            pw = (masked_balanced_pos_weight(bl, bm)
                  if balanced_weights else jnp.float32(1.0))
            return masked_bce_with_logits(out.logits, bl, bm, pw)

        def one_step(carry, im):
            p, opt, rng = carry
            idx, bm = im
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                p, vols[idx], labels[idx], bm, sub)
            updates, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), opt, rng), loss

        def evaluate(p):
            out = model.apply({"params": p}, val_vols, deterministic=True)
            probs = jax.nn.sigmoid(out.logits.reshape(-1))
            return _metrics_vector(
                compute_eval_metrics(probs, val_labels)), probs

        def period_body(carry, chunk):
            inner, best = carry
            inner, losses = jax.lax.scan(one_step, inner, chunk)
            mvec, probs = evaluate(inner[0])
            best = device_consider(best, mvec, probs, inner[0],
                                   jnp.bool_(False))
            return (inner, best), losses[-1]

        opt = tx.init(params)
        best0 = device_best_init(11, val_vols.shape[0], params)
        inner = (params, opt, rng)
        loss_last = jnp.float32(0.0)
        if periods > 0:
            chunks = (
                jnp.asarray(idx_all[:periods * micro_per_eval]
                            .reshape(periods, micro_per_eval, B)),
                jnp.asarray(msk_all[:periods * micro_per_eval]
                            .reshape(periods, micro_per_eval, B)))
            (inner, best0), losses = jax.lax.scan(period_body,
                                                  (inner, best0), chunks)
            loss_last = losses[-1]
        if rem > 0:
            inner, losses = jax.lax.scan(
                one_step, inner,
                (jnp.asarray(idx_all[periods * micro_per_eval:]),
                 jnp.asarray(msk_all[periods * micro_per_eval:])))
            loss_last = losses[-1]
        # force-take a final eval if nothing ever accepted (the reference
        # crashes on an unbound `tl` here — defect D9 family)
        mvec, probs = evaluate(inner[0])
        best = device_take_if(best0, mvec, probs, inner[0],
                              ~best0["found"])
        return best, loss_last

    best, loss_last = run(params, jax.random.key(seed))
    mvec = np.asarray(best["metrics"])
    cp = np.asarray(best["probs"])
    pl = (cp > 0.5).astype(np.int32)
    metrics = {k: float(v) for k, v in zip(METRIC_KEYS, mvec)}
    best_params = jax.device_get(best["payload"])
    if save_path is not None:
        save_pytree(save_path, best_params)
        logger.info("saved checkpoint to %s", save_path)
    if metrics_logger is not None:
        metrics_logger.log("best_eval", loss=float(loss_last), **metrics)
    logger.info("best AUROC: %s", metrics["AUROC"])

    return BaselineResult(
        metrics=metrics,
        true_labels=val_labels_np.copy(),
        predicted_labels=pl,
        class_probabilities=cp,
        best_params=best_params if keep_best_params else None,
        num_params_m=n_params,
        final_loss=float(loss_last),
    )
