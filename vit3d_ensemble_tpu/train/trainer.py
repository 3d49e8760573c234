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
from vit3d_ensemble_tpu.metrics.host import eleven_metrics
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.train.optim import sgd_momentum
from vit3d_ensemble_tpu.train.schedules import make_schedule
from vit3d_ensemble_tpu.train.selection import BestTracker
from vit3d_ensemble_tpu.train.steps import (
    TrainState,
    make_baseline_eval_step,
    make_baseline_train_step,
)

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
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    n_params = sum(a.size for a in jax.tree.leaves(params)) / 1e6

    train_step = make_baseline_train_step(model, balanced_weights)
    eval_step = make_baseline_eval_step(model)

    vols = jax.device_put(train_split.volumes)
    labels = jax.device_put(train_split.labels.astype(np.float32))
    val_vols = jax.device_put(val_split.volumes)
    val_labels = val_split.labels

    batcher = EpochBatcher(len(train_split), train_batch_size, seed=seed)
    dropout_rng = jax.random.key(seed)
    tracker = BestTracker()
    loss = jnp.float32(0.0)

    for micro, (idx, mask) in enumerate(
            batcher.batches(num_steps * accum), start=1):
        dropout_rng, step_rng = jax.random.split(dropout_rng)
        bv = vols[jnp.asarray(idx)]
        bl = labels[jnp.asarray(idx)]
        state, loss = train_step(state, bv, bl, jnp.asarray(mask), step_rng)
        if micro % accum:
            continue
        gstep = micro // accum          # optimizer updates completed

        if gstep % eval_every == 0 or gstep == num_steps:
            probs, _ = eval_step(state.params, val_vols)
            probs = np.asarray(probs)
            preds = (probs > 0.5).astype(np.int32)
            m = eleven_metrics(val_labels, preds, probs)
            logger.info("step %d AUROC: %s", gstep, m["AUROC"])
            if metrics_logger is not None:
                metrics_logger.log("eval", step=gstep,
                                   loss=float(loss), **m)
            accepted = tracker.consider(
                m["Specificity"], m["Sensitivity"], m["AUROC"], m,
                payload=(
                    (jax.device_get(state.params) if keep_best_params
                     else None),
                    val_labels.copy(), preds, probs,
                ),
            )
            if accepted and save_path is not None:
                save_pytree(save_path, state.params)
                logger.info("saved checkpoint to %s", save_path)

    if tracker.payload is None:
        # No eval ever ACCEPTED (num_steps < eval_every, or every AUROC was
        # exactly 0.0 and unconstrained — where the reference crashes on an
        # unbound `tl`, defect D9 family): force-take a final evaluation so
        # results are always defined.
        probs, _ = eval_step(state.params, val_vols)
        probs = np.asarray(probs)
        preds = (probs > 0.5).astype(np.int32)
        m = eleven_metrics(val_labels, preds, probs)
        tracker._take(m["AUROC"], m,
                      payload=(jax.device_get(state.params)
                               if keep_best_params else None,
                               val_labels.copy(), preds, probs))
        if save_path is not None:
            save_pytree(save_path, state.params)

    best_params, tl, pl, cp = tracker.payload
    return BaselineResult(
        metrics=tracker.best_metrics,
        true_labels=tl,
        predicted_labels=pl,
        class_probabilities=cp,
        best_params=best_params,
        num_params_m=n_params,
        final_loss=float(loss),
    )
