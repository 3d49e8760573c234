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
import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit3d_ensemble_tpu.checkpoint import save_pytree
from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import EpochBatcher, SplitArrays
from vit3d_ensemble_tpu.metrics.host import eleven_metrics
from vit3d_ensemble_tpu.models import TransformerEnsemble
from vit3d_ensemble_tpu.train.optim import adam
from vit3d_ensemble_tpu.train.selection import BestTracker
from vit3d_ensemble_tpu.train.steps import (
    TrainState,
    make_ensemble_eval_step,
    make_ensemble_train_step,
)

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
) -> EnsembleResult:
    """One ensemble, one split — the reference epoch loop, jit-compiled.

    `tracker` may be passed in to reproduce the reference's cross-fold /
    cross-combination best_choice carry-over (defect D9/D19 territory); by
    default a fresh tracker per call (the intended semantics).
    """
    model, params = init_ensemble(configs, member_params, seed)
    tx = adam(learning_rate)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    train_step = make_ensemble_train_step(model)
    eval_step = make_ensemble_eval_step(model)

    vols = jax.device_put(train_split.volumes)
    labels = jax.device_put(train_split.labels.astype(np.float32))
    val_vols = jax.device_put(val_split.volumes)
    val_labels = val_split.labels

    batcher = EpochBatcher(len(train_split), train_batch_size, seed=seed)
    rng = jax.random.key(seed)
    tracker = tracker if tracker is not None else BestTracker()

    for epoch in range(num_epochs):
        for idx, mask in batcher.epoch():
            rng, sub = jax.random.split(rng)
            state, loss = train_step(
                state, vols[jnp.asarray(idx)], labels[jnp.asarray(idx)],
                jnp.asarray(mask), sub)
        probs = np.asarray(eval_step(state.params, val_vols))
        preds = (probs > 0.5).astype(np.int32)
        m = eleven_metrics(val_labels, preds, probs)
        accepted = tracker.consider(
            m["Specificity"], m["Sensitivity"], m["AUROC"], m,
            payload=((jax.device_get(state.params) if keep_best_params
                      else None),
                     val_labels.copy(), preds, probs))
        if accepted and save_path is not None:
            save_pytree(save_path, state.params)

    if tracker.payload is None:
        probs = np.asarray(eval_step(state.params, val_vols))
        preds = (probs > 0.5).astype(np.int32)
        m = eleven_metrics(val_labels, preds, probs)
        tracker.consider(m["Specificity"], m["Sensitivity"], m["AUROC"], m,
                         payload=(jax.device_get(state.params)
                                  if keep_best_params else None,
                                  val_labels.copy(), preds, probs))
        if save_path is not None:
            save_pytree(save_path, state.params)

    best_params, tl, pl, cp = tracker.payload
    return EnsembleResult(metrics=tracker.best_metrics, true_labels=tl,
                          predicted_labels=pl, class_probabilities=cp,
                          best_params=best_params)
